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
  * (dense resolved DFA up to [[AcAutomaton.DenseMaxStates]] states, CSR
  * goto + fail links above — memory ∝ pattern bytes, not states×256 —
  * plus flattened inherited output lists) is built once on the driver
  * and ships as a codegen REFERENCE OBJECT — the NearestCentroid lesson:
  * generated source stays constant-size no matter how many patterns. */
/** Either a fully-resolved dense DFA (`dense` non-null: one array load
  * per input byte) or, above [[AcAutomaton.DenseMaxStates]], a CSR goto
  * table + fail links (memory ∝ trie EDGES — ~one int per pattern byte —
  * instead of states×256; the classic Aho–Corasick walk is amortized
  * O(1) per byte through the fail chain). Both modes share [[step]], so
  * interpreted eval and codegen run the identical automaton. */
final class AcAutomaton(val dense: Array[Int],
                        val sOff: Array[Int], val sKey: Array[Int],
                        val sNext: Array[Int], val fail: Array[Int],
                        val outOff: Array[Int], val outIdx: Array[Int],
                        val nPatterns: Int)
    extends Serializable {

  /** DFA transition: next state after reading byte value `c` (0..255) in
    * state `s`. Hot path — called once per input byte from both the
    * interpreted eval and the generated code (JIT inlines the
    * monomorphic call; the dense branch is one predictable check). */
  def step(s: Int, c: Int): Int = {
    if (dense != null) return dense((s << 8) | c)
    var st = s
    while (true) {
      var lo = sOff(st); var hi = sOff(st + 1) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val k = sKey(mid)
        if (k == c) return sNext(mid)
        else if (k < c) lo = mid + 1
        else hi = mid - 1
      }
      if (st == 0) return 0
      st = fail(st)
    }
    0 // unreachable
  }
}

object AcAutomaton {
  /** Dense-DFA cutoff: 2^16 states × 256 × 4 B = 64 MB table — the most
    * we'll materialize on the driver and ship to each executor as a
    * codegen reference object. Real blocklists share prefixes heavily,
    * so this covers a few thousand terms; beyond it the CSR encoding
    * keeps memory proportional to pattern bytes. */
  val DenseMaxStates: Int = 1 << 16

  def build(patterns: Seq[String]): AcAutomaton =
    build(patterns, DenseMaxStates)

  /** `denseMaxStates` is injectable so the spec can force the CSR mode on
    * small pattern sets and cross-check it against the dense DFA. */
  def build(patterns: Seq[String], denseMaxStates: Int): AcAutomaton = {
    require(patterns.nonEmpty, "AcAutomaton: empty pattern list")
    require(patterns.forall(_.nonEmpty), "AcAutomaton: empty pattern")
    val pats = patterns.map(_.getBytes("UTF-8"))

    // Pass 1 — sparse trie with the EXACT state count. (The previous
    // version allocated sum-of-lengths×256 ints up front — ~1 KB per
    // pattern byte, gigabytes at a 50k-term blocklist — before trimming
    // to the real, prefix-shared state count.)
    val kids = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Int, Int])
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    pats.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { b =>
        val c = b & 0xFF
        s = kids(s).getOrElseUpdate(c, {
          kids += scala.collection.mutable.HashMap.empty[Int, Int]
          ends += Nil
          kids.size - 1
        })
      }
      ends(s) ::= pi
    }
    val nStates = kids.size

    // Pass 2 — BFS: fail links + inherited suffix-pattern outputs.
    val fail = new Array[Int](nStates)
    val bfs = scala.collection.mutable.ArrayBuffer.empty[Int]
    val queue = scala.collection.mutable.Queue.empty[Int]
    kids(0).valuesIterator.foreach { u => fail(u) = 0; queue += u }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      bfs += r
      ends(r) = ends(r) ++ ends(fail(r))
      kids(r).foreach { case (c, u) =>
        var f = fail(r)
        while (f != 0 && !kids(f).contains(c)) f = fail(f)
        fail(u) = kids(f).getOrElse(c, 0)
        queue += u
      }
    }

    // Flattened output lists (identical in both modes).
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

    if (nStates <= denseMaxStates) {
      // Resolve fail links into a dense DFA, in BFS order so every
      // fallback row is already complete when referenced.
      val dense = new Array[Int](nStates * 256)
      var c = 0
      while (c < 256) { dense(c) = kids(0).getOrElse(c, 0); c += 1 }
      bfs.foreach { r =>
        var c2 = 0
        while (c2 < 256) {
          dense(r * 256 + c2) =
            kids(r).getOrElse(c2, dense(fail(r) * 256 + c2))
          c2 += 1
        }
      }
      new AcAutomaton(dense, null, null, null, null, outOff, outIdx,
        patterns.size)
    } else {
      // CSR goto rows (byte keys sorted for binary search) + fail links.
      val sOff = new Array[Int](nStates + 1)
      var t = 0
      var i = 0
      while (i < nStates) { sOff(i) = t; t += kids(i).size; i += 1 }
      sOff(nStates) = t
      val sKey = new Array[Int](t)
      val sNext = new Array[Int](t)
      i = 0
      while (i < nStates) {
        var j = sOff(i)
        kids(i).toSeq.sortBy(_._1).foreach { case (c, u) =>
          sKey(j) = c; sNext(j) = u; j += 1
        }
        i += 1
      }
      new AcAutomaton(null, sOff, sKey, sNext, fail, outOff, outIdx,
        patterns.size)
    }
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
      st = ac.step(st, bytes(i) & 0xFF)
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
      // The automaton ships as ONE reference object; the generated code
      // calls its step() (monomorphic, JIT-inlined) so dense and CSR
      // modes share a single code path with the interpreted eval.
      val acRef = ctx.addReferenceObj("ac", ac,
        classOf[AcAutomaton].getName)
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
         |  $st = $acRef.step($st, $bytes[$i] & 0xFF);
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
