package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Custom codegen'd Catalyst expressions for dense-vector math.
  *
  * Why not zip_with + aggregate: Spark's higher-order functions are
  * interpreted (CodegenFallback) — per-element lambda dispatch costs ~100×
  * a fused loop on a 64-dim embedding scan, which is THE hot path of
  * similarity search over 100 TB. These expressions emit a tight Java loop
  * inside whole-stage codegen.
  *
  * Elements may be FloatType or DoubleType; math is in double. Null
  * elements are treated as 0. Result is null if either array is null.
  */
abstract class FloatVecBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elemPrim(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => "Float"
      case DoubleType => "Double"
      case t => throw new IllegalArgumentException(s"Unsupported element type $t")
    }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  protected def getElem(arr: ArrayData, i: Int, prim: String): Double =
    if (arr.isNullAt(i)) 0.0
    else if (prim == "Float") arr.getFloat(i).toDouble
    else arr.getDouble(i)
}

/** Dot product of two float/double array columns. */
case class FloatVecDot(left: Expression, right: Expression) extends FloatVecBinary {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val pa = elemPrim(left); val pb = elemPrim(right)
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += getElem(a, i, pa) * getElem(b, i, pb); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val pa = elemPrim(left); val pb = elemPrim(right)
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double va = $a.isNullAt($i) ? 0.0 : (double) $a.get$pa($i);
         |  double vb = $b.isNullAt($i) ? 0.0 : (double) $b.get$pb($i);
         |  $s += va * vb;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity in a single fused pass (dot, |a|, |b| in one loop);
  * 0.0 when either norm is zero. */
case class FloatVecCosine(left: Expression, right: Expression) extends FloatVecBinary {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val pa = elemPrim(left); val pb = elemPrim(right)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val va = getElem(a, i, pa); val vb = getElem(b, i, pb)
      dot += va * vb; na += va * va; nb += vb * vb
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val pa = elemPrim(left); val pb = elemPrim(right)
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double va = $a.isNullAt($i) ? 0.0 : (double) $a.get$pa($i);
         |  double vb = $b.isNullAt($i) ? 0.0 : (double) $b.get$pb($i);
         |  $dot += va * vb; $na += va * va; $nb += vb * vb;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
         |  : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecCosine(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
