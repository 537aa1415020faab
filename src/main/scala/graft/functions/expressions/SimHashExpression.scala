package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Fused SimHash-64: token array → 64-bit signature in one codegen'd pass.
  * Bit i of the result is the sign of Σ over tokens of (bit i of
  * hash(token) ? +1 : −1) — Charikar's random-hyperplane sketch over a
  * token multiset.
  *
  * The per-token hash replicates Spark's `xxhash64(tok, lit(seed))` chain
  * (XXH64 over the UTF-8 bytes with base seed 42, then XXH64 of the seed
  * long) so the interpreted HOF formulation [[graft.functions.Dedup.simhash64]]
  * produces identical signatures — cross-checked in FunctionsSpec.
  *
  * Why an expression: the explode → groupBy(id) 64-sum formulation is
  * correct but pays a 2.5M-row generate + a 65-column hash aggregate per
  * 5k docs (~4 s at sf0.1); this is a narrow per-row projection — no
  * explode, no aggregate, no shuffle — the right shape for 100 TB.
  */
case class SimHashOfTokens(child: Expression, seed: Long)
    extends UnaryExpression {

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

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        val h = XXH64.hashLong(seed, h1)
        var k = 0
        while (k < 64) {
          counts(k) += (if (((h >>> k) & 1L) == 1L) 1 else -1)
          k += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (counts(k) > 0) sig |= 1L << k
      k += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val n = ctx.freshName("n"); val counts = ctx.freshName("counts")
      val h = ctx.freshName("h"); val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |    $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(${seed}L, $h);
         |    for (int $k = 0; $k < 64; $k++) {
         |      $counts[$k] += ((($h >>> $k) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $k = 0; $k < 64; $k++) {
         |  if ($counts[$k] > 0) $sig |= 1L << $k;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHashExpression {
  def simhashTokens(tokens: Column, seed: Long): Column =
    ColumnBridge.column(SimHashOfTokens(ColumnBridge.expression(tokens), seed))
}
