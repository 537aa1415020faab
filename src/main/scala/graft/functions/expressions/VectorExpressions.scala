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

/** Nearest-centroid assignment against a CONSTANT centroid matrix —
  * returns struct(d: double, c: int) where d = −2·x·c + |c|² (the
  * squared-euclidean argmin with the row-constant |x|² dropped) and c is
  * the winning centroid index, ties toward the lower index.
  *
  * Why not an array of k dot-product structs over literal arrays (the
  * previous formulation): that plan carries k × dim literal NODES, so at
  * real IVF scale (k in the thousands) plan construction, canonicalization
  * and codegen COMPILATION dominate — a per-iteration driver stall that
  * grows with k while the per-row work stays identical. Here the matrix
  * rides along as a codegen reference object: generated source is
  * constant-size in k and dim, and the per-row loop is the same fused
  * dot-product arithmetic (bit-identical results: float-cast centroids,
  * double accumulation in index order, d = dot·(−2) + |c|² with |c|²
  * summed in double).
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(centroids.nonEmpty, "NearestCentroid: empty centroid matrix")

  @transient private lazy val floatsM: Array[Array[Float]] =
    centroids.map(_.map(_.toFloat))
  @transient private lazy val normsA: Array[Double] =
    centroids.map(c => c.map(x => x * x).sum)

  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("c", IntegerType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<float|double> input, got $t")
    }

  private def prim: String =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "Float"
      case _         => "Double"
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val p = prim
    var bestD = Double.PositiveInfinity
    var bestC = 0
    var ci = 0
    while (ci < floatsM.length) {
      val cv = floatsM(ci)
      val n = math.min(arr.numElements(), cv.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val va = if (arr.isNullAt(i)) 0.0
          else if (p == "Float") arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += va * cv(i).toDouble
        i += 1
      }
      val d = dot * -2.0 + normsA(ci)
      if (d < bestD) { bestD = d; bestC = ci }
      ci += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = prim
      val mat = ctx.addReferenceObj("nearestCentroidMat", floatsM, "float[][]")
      val norms = ctx.addReferenceObj("nearestCentroidNorms", normsA, "double[]")
      val ci = ctx.freshName("ci"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val d = ctx.freshName("d"); val bd = ctx.freshName("bestD")
      val bc = ctx.freshName("bestC"); val cv = ctx.freshName("cv")
      s"""
         |double $bd = Double.POSITIVE_INFINITY;
         |int $bc = 0;
         |for (int $ci = 0; $ci < $mat.length; $ci++) {
         |  float[] $cv = $mat[$ci];
         |  int $n = java.lang.Math.min($a.numElements(), $cv.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double va = $a.isNullAt($i) ? 0.0 : (double) $a.get$p($i);
         |    $dot += va * (double) $cv[$i];
         |  }
         |  double $d = $dot * -2.0 + $norms[$ci];
         |  if ($d < $bd) { $bd = $d; $bc = $ci; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |  .GenericInternalRow(new Object[] {$bd, $bc});
       """.stripMargin
    })

  override def toString: String =
    s"nearest_centroid($child, k=${centroids.length})"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecCosine(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** struct(d, c): partial squared distance + argmin centroid index. */
  def nearestCentroid(v: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(v), centroids))
}
