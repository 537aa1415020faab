package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernels for the fused text expressions; static forwarders make
  * them directly callable from generated Java, so the expressions stay
  * one-line calls inside whole-stage codegen. */
object TextExprUtil {

  /** Σ over tokens of ceil(numChars/4) — the BPE-ish subword estimate. */
  def bpeIsh(arr: ArrayData): Long = {
    val n = arr.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val c = arr.getUTF8String(i).numChars()
        total += (c + 3) / 4
      }
      i += 1
    }
    total
  }

  /** Perceptual-hash STUB over a text payload: the codepoint stream splits
    * into `slices` even slices (slice of position p = p·slices/n — exact
    * integer division), each contributing its codepoint-sum mod 16 as a
    * 4-bit nibble of the hash. LOCALITY is the point: an in-place edit
    * touches only the slices covering it, so near-identical payloads land
    * within a small Hamming radius — a stand-in with a real pHash's
    * blocking behavior (a production build computes DCT low frequencies
    * here; the signature long is the contract). Empty payloads hash to 0.
    * At slices = 15 the hash occupies bits 0..59 (overflow-free in the
    * SQL mirror's shift arithmetic). */
  def pHashStub(s: UTF8String, slices: Int): Long = {
    val str = s.toString
    val nChars = str.length
    val n = str.codePointCount(0, nChars)
    if (n == 0) return 0L
    val sums = new Array[Long](slices)
    var ci = 0
    var p = 0L
    while (ci < nChars) {
      val cp = str.codePointAt(ci)
      sums(((p * slices) / n).toInt) += cp
      ci += Character.charCount(cp)
      p += 1
    }
    var h = 0L
    var j = 0
    while (j < slices) { h |= (sums(j) % 16L) << (4 * j); j += 1 }
    h
  }

  /** Content-defined-chunking cut positions: every i in [window, n−1]
    * (n = codepoint count) where the polynomial hash of the window-sized
    * codepoint run ending at i — left fold (acc·257 + cp) mod 1048573 —
    * is ≡ 0 (mod divisor). Computed with the Rabin–Karp rolling update
    * (drop·257^(w−1) removal), so the whole document is one O(n) pass
    * instead of O(n·w) per-position refolds; every intermediate stays
    * below 2^41, exact in int64. Value-identical to the per-position
    * fold, which is what the DuckDB oracle mirrors. */
  def cdcCuts(s: UTF8String, window: Int, divisor: Long): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < window)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Int])
    val P = 1048573L
    var pow = 1L
    var k = 1
    while (k < window) { pow = pow * 257L % P; k += 1 }
    var h = 0L
    var i = 0
    while (i < window) { h = (h * 257L + cps(i)) % P; i += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var cut = window
    while (cut < n) {
      if (h % divisor == 0L) out += cut
      h = ((h - cps(cut - window) % P * pow % P) % P + P) % P
      h = (h * 257L + cps(cut)) % P
      cut += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Set Jaccard of two string arrays (nulls ignored); 0.0 when the union
    * is empty. One hash-set pass per side instead of three array ops
    * (distinct ×2, intersect, union) each building its own set. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[UTF8String]()
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (!a.isNullAt(i)) setA.add(a.getUTF8String(i))
      i += 1
    }
    val setB = new java.util.HashSet[UTF8String]()
    var inter = 0
    var j = 0
    val nb = b.numElements()
    while (j < nb) {
      if (!b.isNullAt(j)) {
        val s = b.getUTF8String(j)
        if (setB.add(s) && setA.contains(s)) inter += 1
      }
      j += 1
    }
    val union = setA.size + setB.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

/** Fused BPE-ish token count (reference heuristic: ~4 chars per subword).
  * Replaces the interpreted transform+aggregate HOF pair, which also
  * disabled whole-stage codegen for its stage. */
case class BpeIshTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    TextExprUtil.bpeIsh(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.expressions.TextExprUtil.bpeIsh($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Content-defined-chunking cut positions as a fused rolling-hash kernel —
  * replaces a per-position slice+aggregate HOF chain whose interpreted
  * lambdas made the chunker ~50 s at sf0.1; the one-pass kernel runs the
  * same query in well under a second. */
case class CdcCuts(child: Expression, window: Int, divisor: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects string, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    TextExprUtil.cdcCuts(input.asInstanceOf[UTF8String], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.expressions.TextExprUtil.cdcCuts($a, $window, ${divisor}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Locality-preserving perceptual-hash stub (see TextExprUtil.pHashStub). */
case class PHashStub(child: Expression, slices: Int) extends UnaryExpression {
  require(slices >= 1 && slices <= 15,
    s"slices must be 1..15 (4 bits each in a 64-bit hash), got $slices")
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects string, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    TextExprUtil.pHashStub(input.asInstanceOf[UTF8String], slices)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.expressions.TextExprUtil.pHashStub($a, $slices);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused set-Jaccard of two string arrays — the candidate-pair scorer for
  * n-gram near-dup verification. Replaces the distinct/intersect/union
  * array-expression chain (three hash-set builds per row) with one kernel. */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

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
    TextExprUtil.jaccard(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.TextExprUtil.jaccard($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object TextExpressions {
  def bpeIshTokenCount(tokens: Column): Column =
    ColumnBridge.column(BpeIshTokenCount(ColumnBridge.expression(tokens)))

  def jaccardSimilarity(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cdcCuts(text: Column, window: Int, divisor: Long): Column =
    ColumnBridge.column(CdcCuts(ColumnBridge.expression(text), window, divisor))

  def pHashStub(text: Column, slices: Int = 15): Column =
    ColumnBridge.column(PHashStub(ColumnBridge.expression(text), slices))
}
