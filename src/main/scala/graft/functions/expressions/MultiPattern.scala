package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher (Aho & Corasick 1975), fully
  * resolved to a byte-level DFA at plan time.
  *
  * The blocklist/taxonomy primitive: screening documents against a list
  * of banned or tagged terms. The naive formulation — one `contains()`
  * per term — scans the text |terms| times and falls off a cliff at
  * real blocklist sizes (thousands of terms × 100 TB of text). The
  * automaton reads each byte ONCE whatever the term count: per-row cost
  * is O(|text| + hits), term count only affects the (driver-built,
  * executor-shared) table sizes.
  *
  * Byte-level matching over UTF-8 is exact for Unicode: UTF-8 is
  * self-synchronizing, so a pattern's byte sequence occurs in the text's
  * bytes iff the pattern's characters occur in the text. The automaton
  * (goto table resolved through fail links into a dense DFA + flattened
  * inherited output lists) is built once on the driver and ships as a
  * codegen REFERENCE OBJECT — the NearestCentroid lesson: generated
  * source stays constant-size no matter how many patterns. */
final class AcAutomaton(val trans: Array[Int], val outOff: Array[Int],
                        val outIdx: Array[Int], val nPatterns: Int)
    extends Serializable

object AcAutomaton {
  def build(patterns: Seq[String]): AcAutomaton = {
    require(patterns.nonEmpty, "AcAutomaton: empty pattern list")
    require(patterns.forall(_.nonEmpty), "AcAutomaton: empty pattern")
    val pats = patterns.map(_.getBytes("UTF-8"))
    val maxStates = pats.map(_.length).sum + 1
    val goto = Array.fill(maxStates * 256)(-1)
    val ends = Array.fill(maxStates)(List.empty[Int])
    var nStates = 1
    pats.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { b =>
        val c = b & 0xFF
        if (goto(s * 256 + c) == -1) { goto(s * 256 + c) = nStates; nStates += 1 }
        s = goto(s * 256 + c)
      }
      ends(s) ::= pi
    }
    val fail = new Array[Int](nStates)
    val queue = scala.collection.mutable.Queue.empty[Int]
    var c = 0
    while (c < 256) {
      val s = goto(c)
      if (s == -1) goto(c) = 0 else { fail(s) = 0; queue += s }
      c += 1
    }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      ends(r) = ends(r) ++ ends(fail(r)) // inherit suffix-pattern outputs
      var c2 = 0
      while (c2 < 256) {
        val u = goto(r * 256 + c2)
        if (u != -1) { fail(u) = goto(fail(r) * 256 + c2); queue += u }
        else goto(r * 256 + c2) = goto(fail(r) * 256 + c2)
        c2 += 1
      }
    }
    val outOff = new Array[Int](nStates + 1)
    var total = 0
    var s = 0
    while (s < nStates) { outOff(s) = total; total += ends(s).size; s += 1 }
    outOff(nStates) = total
    val outIdx = new Array[Int](total)
    s = 0
    while (s < nStates) {
      var j = outOff(s)
      ends(s).sorted.foreach { pi => outIdx(j) = pi; j += 1 }
      s += 1
    }
    new AcAutomaton(java.util.Arrays.copyOf(goto, nStates * 256),
      outOff, outIdx, patterns.size)
  }
}

/** array<int> of the DISTINCT pattern indices (ascending) whose pattern
  * occurs as a substring of the input string. One DFA pass per row. */
case class MultiPatternHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  @transient private lazy val ac: AcAutomaton = AcAutomaton.build(patterns)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects string input, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val seen = new Array[Boolean](ac.nPatterns)
    var nSeen = 0
    var st = 0
    var i = 0
    while (i < bytes.length) {
      st = ac.trans((st << 8) | (bytes(i) & 0xFF))
      var j = ac.outOff(st)
      val end = ac.outOff(st + 1)
      while (j < end) {
        val p = ac.outIdx(j)
        if (!seen(p)) { seen(p) = true; nSeen += 1 }
        j += 1
      }
      i += 1
    }
    val res = new Array[Int](nSeen)
    var p = 0; var k = 0
    while (p < seen.length) { if (seen(p)) { res(k) = p; k += 1 }; p += 1 }
    new GenericArrayData(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val trans = ctx.addReferenceObj("acTrans", ac.trans, "int[]")
      val outOff = ctx.addReferenceObj("acOutOff", ac.outOff, "int[]")
      val outIdx = ctx.addReferenceObj("acOutIdx", ac.outIdx, "int[]")
      val nP = ac.nPatterns
      val bytes = ctx.freshName("bytes"); val seen = ctx.freshName("seen")
      val nSeen = ctx.freshName("nSeen"); val st = ctx.freshName("st")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val end = ctx.freshName("end"); val p = ctx.freshName("p")
      val res = ctx.freshName("res"); val k = ctx.freshName("k")
      s"""
         |byte[] $bytes = $in.getBytes();
         |boolean[] $seen = new boolean[$nP];
         |int $nSeen = 0;
         |int $st = 0;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $st = $trans[($st << 8) | ($bytes[$i] & 0xFF)];
         |  int $end = $outOff[$st + 1];
         |  for (int $j = $outOff[$st]; $j < $end; $j++) {
         |    int $p = $outIdx[$j];
         |    if (!$seen[$p]) { $seen[$p] = true; $nSeen++; }
         |  }
         |}
         |int[] $res = new int[$nSeen];
         |int $k = 0;
         |for (int $p = 0; $p < $nP; $p++) {
         |  if ($seen[$p]) { $res[$k++] = $p; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
       """.stripMargin
    })

  override def toString: String =
    s"multi_pattern_hits($child, n=${patterns.size})"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultiPattern {
  /** Distinct matched pattern indices (ascending) per row — one
    * Aho–Corasick DFA pass regardless of pattern count. */
  def hits(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiPatternHits(
      ColumnBridge.expression(text), patterns))
}
