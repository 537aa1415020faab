package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of common elements between two LEXICOGRAPHICALLY SORTED,
  * DUPLICATE-FREE string arrays — `size(array_intersect(a, b))` for the
  * verification step of exact set-similarity joins, minus its per-row cost:
  * ArrayIntersect builds a hash set of one side and materializes the full
  * intersection array per call, which the caller immediately collapses to a
  * length. At q_setsim_join's bench shape that is ~1.9 M candidate pairs ×
  * (one OpenHashSet + one GenericArrayData) of garbage for a single int.
  * This expression is a zero-allocation two-pointer merge: O(|a|+|b|)
  * binary UTF8String comparisons, nothing allocated, and the call stays
  * inside whole-stage codegen via a static helper.
  *
  * PRECONDITION (callers': [[graft.operators.SetSimilarityJoin]] sorts with
  * `array_sort(array_distinct(...))`): both arrays ascending in UTF8String
  * binary order with no nulls and no duplicates. Unsorted input gives an
  * UNDERCOUNT, never an error — keep the sort beside the data production.
  */
case class SortedOverlapCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects (array<string>, array<string>), got ($l, $r)")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    SortedOverlap.count(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.SortedOverlap.count($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedOverlap {
  /** Column API: count of shared elements of two sorted distinct string
    * arrays. */
  def sortedOverlapCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedOverlapCountExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Two-pointer merge count over UnsafeArrayData; called from generated
    * code — keep the signature (ArrayData, ArrayData) => int.
    *
    * Null ELEMENTS order last (array_sort's ascending-nulls-last), and
    * null matches null — the array_intersect semantics this replaced
    * (array_distinct keeps at most one null per side, so a null-tail pair
    * contributes exactly one match, like the hash-set intersection did). */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val ua = a.getUTF8String(i)
      val ub = b.getUTF8String(j)
      if (ua == null && ub == null) { c += 1; i += 1; j += 1 }
      else if (ua == null) j += 1      // null sorts last: b is smaller
      else if (ub == null) i += 1
      else {
        val cmp = ua.compareTo(ub)
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }
}
