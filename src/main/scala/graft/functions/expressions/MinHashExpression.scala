package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Fused MinHash signature: given an array of base shingle hashes, compute
  * `numHashes` minima in one loop — mins[k] over splitmix64(h ^ seed_k).
  *
  * Why an expression: the transform()-per-slot formulation is an interpreted
  * higher-order function evaluated numHashes times per row (48M lambda
  * dispatches on a 5k-doc corpus; billions at 100 TB). This emits one tight
  * Java loop in whole-stage codegen. Wrapping long arithmetic is fine here —
  * Java wraps natively, outside ANSI SQL's overflow checks.
  *
  * splitmix64 is the public-domain mixer (Steele et al., "Fast splittable
  * pseudorandom number generators").
  */
case class MinHashArray(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<bigint>, got $t")
    }

  @inline private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var k = 0
        while (k < numHashes) {
          val x = mix(h ^ (seed + k.toLong * 0x9E3779B97F4A7C15L))
          if (x < mins(k)) mins(k) = x
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
      val h = ctx.freshName("h"); val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $h = $a.getLong($i);
         |    for (int $k = 0; $k < $numHashes; $k++) {
         |      long $x = $h ^ (${seed}L + (long) $k * 0x9E3779B97F4A7C15L);
         |      $x = ($x ^ ($x >>> 30)) * 0xBF58476D1CE4E5B9L;
         |      $x = ($x ^ ($x >>> 27)) * 0x94D049BB133111EBL;
         |      $x = $x ^ ($x >>> 31);
         |      if ($x < $mins[$k]) $mins[$k] = $x;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fully-fused MinHash: token array → signature in one expression. Hashes
  * each token once (XXH64 over its UTF-8 bytes), combines `shingleSize`
  * consecutive token hashes with an order-dependent FNV-style fold (no
  * shingle strings are ever built), and folds the k splitmix64 minima — all
  * in one codegen'd pass. Replaces three interpreted stages (shingle
  * construction, string hashing, per-slot transform).
  *
  * Documents shorter than `shingleSize` produce one window over all tokens
  * (mirroring Text.shingles). Null tokens hash as 0.
  */
case class MinHashOfTokens(child: Expression, shingleSize: Int, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

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
    val nTok = arr.numElements()
    val tokH = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      tokH(i) = if (arr.isNullAt(i)) 0L else {
        val s = arr.getUTF8String(i)
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
      }
      i += 1
    }
    val nWin = math.max(1, nTok - shingleSize + 1)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var w = 0
    while (w < nWin) {
      var combo = 0x9E3779B97F4A7C15L
      var j = w
      val end = math.min(w + shingleSize, nTok)
      while (j < end) { combo = (combo ^ tokH(j)) * 0x100000001B3L; j += 1 }
      var k = 0
      while (k < numHashes) {
        var x = combo ^ (seed + k.toLong * 0x9E3779B97F4A7C15L)
        x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
        x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
        x = x ^ (x >>> 31)
        if (x < mins(k)) mins(k) = x
        k += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val w = ctx.freshName("w"); val nTok = ctx.freshName("nTok")
      val tokH = ctx.freshName("tokH"); val mins = ctx.freshName("mins")
      val nWin = ctx.freshName("nWin"); val combo = ctx.freshName("combo")
      val end = ctx.freshName("end"); val x = ctx.freshName("x")
      val s = ctx.freshName("s")
      s"""
         |int $nTok = $a.numElements();
         |long[] $tokH = new long[$nTok];
         |for (int $i = 0; $i < $nTok; $i++) {
         |  if ($a.isNullAt($i)) { $tokH[$i] = 0L; } else {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    $tokH[$i] = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${seed}L);
         |  }
         |}
         |int $nWin = java.lang.Math.max(1, $nTok - $shingleSize + 1);
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $w = 0; $w < $nWin; $w++) {
         |  long $combo = 0x9E3779B97F4A7C15L;
         |  int $end = java.lang.Math.min($w + $shingleSize, $nTok);
         |  for (int $j = $w; $j < $end; $j++) {
         |    $combo = ($combo ^ $tokH[$j]) * 0x100000001B3L;
         |  }
         |  for (int $k = 0; $k < $numHashes; $k++) {
         |    long $x = $combo ^ (${seed}L + (long) $k * 0x9E3779B97F4A7C15L);
         |    $x = ($x ^ ($x >>> 30)) * 0xBF58476D1CE4E5B9L;
         |    $x = ($x ^ ($x >>> 27)) * 0x94D049BB133111EBL;
         |    $x = $x ^ ($x >>> 31);
         |    if ($x < $mins[$k]) $mins[$k] = $x;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** LSH band-bucket hashes of a minhash signature: element b of the result
  * folds signature slots [b·rowsPerBand, (b+1)·rowsPerBand) with the
  * order-dependent FNV combo — the banded-LSH bucketing key, computed
  * without building per-band strings (the array_join + transform(slice)
  * formulation is interpreted AND allocates a string per band per row).
  * Band index = array position. */
case class BandHashes(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  require(bands > 0 && rowsPerBand > 0,
    s"bands ($bands) and rowsPerBand ($rowsPerBand) must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<bigint>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // A band whose slot range starts past the signature end would fold zero
    // elements and return the constant seed — putting EVERY row in one
    // bucket for that band and making the downstream LSH self-join
    // quadratic. Refuse loudly instead.
    if (arr.numElements() < bands * rowsPerBand)
      throw new IllegalArgumentException(
        s"band_hashes: signature has ${arr.numElements()} slots but " +
          s"bands*rowsPerBand = ${bands * rowsPerBand}; a truncated band " +
          "would degenerate to a single LSH bucket")
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var combo = 0x9E3779B97F4A7C15L
      var j = b * rowsPerBand
      val end = j + rowsPerBand
      while (j < end) {
        combo = (combo ^ (if (arr.isNullAt(j)) 0L else arr.getLong(j))) * 0x100000001B3L
        j += 1
      }
      out(b) = combo
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val b = ctx.freshName("b"); val j = ctx.freshName("j")
      val end = ctx.freshName("end"); val combo = ctx.freshName("combo")
      val outArr = ctx.freshName("outArr")
      s"""
         |if ($a.numElements() < ${bands * rowsPerBand}) {
         |  throw new IllegalArgumentException(
         |    "band_hashes: signature has " + $a.numElements() + " slots but " +
         |    "bands*rowsPerBand = ${bands * rowsPerBand}; a truncated band " +
         |    "would degenerate to a single LSH bucket");
         |}
         |long[] $outArr = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $combo = 0x9E3779B97F4A7C15L;
         |  int $end = ($b + 1) * $rowsPerBand;
         |  for (int $j = $b * $rowsPerBand; $j < $end; $j++) {
         |    $combo = ($combo ^ ($a.isNullAt($j) ? 0L : $a.getLong($j))) * 0x100000001B3L;
         |  }
         |  $outArr[$b] = $combo;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($outArr);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hashes of every `shingleSize`-token window of a token array — one
  * 64-bit identity per window, computed with the same one-pass
  * token-hash + order-dependent FNV fold as [[MinHashOfTokens]] (no window
  * strings are built). Token sequences are in bijection with their
  * joined-string grams (tokens cannot contain whitespace), so counting
  * distinct window hashes ≡ counting distinct n-gram strings, modulo
  * 64-bit collisions. Documents shorter than `shingleSize` produce one
  * window over all tokens (mirroring Text.shingles).
  */
case class NgramWindowHashes(child: Expression, shingleSize: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

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
    val nTok = arr.numElements()
    val tokH = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      tokH(i) = if (arr.isNullAt(i)) 0L else {
        val s = arr.getUTF8String(i)
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
      }
      i += 1
    }
    val nWin = math.max(1, nTok - shingleSize + 1)
    val out = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      var combo = 0x9E3779B97F4A7C15L
      var j = w
      val end = math.min(w + shingleSize, nTok)
      while (j < end) { combo = (combo ^ tokH(j)) * 0x100000001B3L; j += 1 }
      out(w) = combo
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val w = ctx.freshName("w"); val nTok = ctx.freshName("nTok")
      val tokH = ctx.freshName("tokH"); val outArr = ctx.freshName("outArr")
      val nWin = ctx.freshName("nWin"); val combo = ctx.freshName("combo")
      val end = ctx.freshName("end"); val s = ctx.freshName("s")
      s"""
         |int $nTok = $a.numElements();
         |long[] $tokH = new long[$nTok];
         |for (int $i = 0; $i < $nTok; $i++) {
         |  if ($a.isNullAt($i)) { $tokH[$i] = 0L; } else {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    $tokH[$i] = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${seed}L);
         |  }
         |}
         |int $nWin = java.lang.Math.max(1, $nTok - $shingleSize + 1);
         |long[] $outArr = new long[$nWin];
         |for (int $w = 0; $w < $nWin; $w++) {
         |  long $combo = 0x9E3779B97F4A7C15L;
         |  int $end = java.lang.Math.min($w + $shingleSize, $nTok);
         |  for (int $j = $w; $j < $end; $j++) {
         |    $combo = ($combo ^ $tokH[$j]) * 0x100000001B3L;
         |  }
         |  $outArr[$w] = $combo;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($outArr);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
  * scheme, public): from an array of k-gram hashes, select the minimum of
  * every `window`-length sliding window (ties to the RIGHTMOST occurrence,
  * the paper's robust-winnowing rule), emitting each selected position
  * once. Guarantee: any substring match of at least window+k−1 tokens
  * between two documents shares at least one selected fingerprint, while
  * only ~2/(window+1) of all hashes are kept — the standard
  * exact-substring-at-scale primitive.
  *
  * One fused O(n·window) pass (window is small; a deque adds allocation
  * for no win at these sizes), codegen'd; inputs shorter than the window
  * yield their single minimum.
  */
case class WinnowMinHashes(child: Expression, window: Int)
    extends UnaryExpression {

  require(window > 0, s"window must be positive, got $window")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<bigint>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val h = new Array[Long](n)
    var i = 0
    while (i < n) { h(i) = if (arr.isNullAt(i)) 0L else arr.getLong(i); i += 1 }
    val nWin = math.max(1, n - window + 1)
    val out = new Array[Long](nWin)
    var m = 0
    var prevPos = -1
    var w = 0
    while (w < nWin) {
      var best = w
      var j = w + 1
      val end = math.min(w + window, n)
      while (j < end) { if (h(j) <= h(best)) best = j; j += 1 } // rightmost min
      if (best != prevPos) { out(m) = h(best); m += 1; prevPos = best }
      w += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val h = ctx.freshName("h")
      val i = ctx.freshName("i"); val w = ctx.freshName("w")
      val j = ctx.freshName("j"); val end = ctx.freshName("end")
      val best = ctx.freshName("best"); val prevPos = ctx.freshName("prevPos")
      val out = ctx.freshName("out"); val m = ctx.freshName("m")
      val nWin = ctx.freshName("nWin")
      s"""
         |int $n = $a.numElements();
         |long[] $h = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $h[$i] = $a.isNullAt($i) ? 0L : $a.getLong($i);
         |}
         |int $nWin = java.lang.Math.max(1, $n - $window + 1);
         |long[] $out = new long[$n == 0 ? 0 : $nWin];
         |int $m = 0; int $prevPos = -1;
         |if ($n > 0) {
         |  for (int $w = 0; $w < $nWin; $w++) {
         |    int $best = $w;
         |    int $end = java.lang.Math.min($w + $window, $n);
         |    for (int $j = $w + 1; $j < $end; $j++) {
         |      if ($h[$j] <= $h[$best]) $best = $j;
         |    }
         |    if ($best != $prevPos) { $out[$m++] = $h[$best]; $prevPos = $best; }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($out, $m));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** POSITIONS selected by robust winnowing — the same rightmost-minimum
  * selection as [[WinnowMinHashes]], emitting each selected gram's token
  * index (strictly increasing array<int>) instead of its hash. Pairing
  * positions with `element_at(hashes, pos + 1)` yields positional
  * fingerprints (fp, pos), the input to MOSS-style matched-SPAN
  * reconstruction: a shared fingerprint at (posA, posB) localizes the
  * common substring in both documents.
  */
case class WinnowMinPositions(child: Expression, window: Int)
    extends UnaryExpression {

  require(window > 0, s"window must be positive, got $window")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<bigint>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyIntArray)
    val h = new Array[Long](n)
    var i = 0
    while (i < n) { h(i) = if (arr.isNullAt(i)) 0L else arr.getLong(i); i += 1 }
    val nWin = math.max(1, n - window + 1)
    val out = new Array[Int](nWin)
    var m = 0
    var prevPos = -1
    var w = 0
    while (w < nWin) {
      var best = w
      var j = w + 1
      val end = math.min(w + window, n)
      while (j < end) { if (h(j) <= h(best)) best = j; j += 1 } // rightmost min
      if (best != prevPos) { out(m) = best; m += 1; prevPos = best }
      w += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val h = ctx.freshName("h")
      val i = ctx.freshName("i"); val w = ctx.freshName("w")
      val j = ctx.freshName("j"); val end = ctx.freshName("end")
      val best = ctx.freshName("best"); val prevPos = ctx.freshName("prevPos")
      val out = ctx.freshName("out"); val m = ctx.freshName("m")
      val nWin = ctx.freshName("nWin")
      s"""
         |int $n = $a.numElements();
         |long[] $h = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $h[$i] = $a.isNullAt($i) ? 0L : $a.getLong($i);
         |}
         |int $nWin = java.lang.Math.max(1, $n - $window + 1);
         |int[] $out = new int[$n == 0 ? 0 : $nWin];
         |int $m = 0; int $prevPos = -1;
         |if ($n > 0) {
         |  for (int $w = 0; $w < $nWin; $w++) {
         |    int $best = $w;
         |    int $end = java.lang.Math.min($w + $window, $n);
         |    for (int $j = $w + 1; $j < $end; $j++) {
         |      if ($h[$j] <= $h[$best]) $best = $j;
         |    }
         |    if ($best != $prevPos) { $out[$m++] = $best; $prevPos = $best; }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($out, $m));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Number of equal slots between two equal-length long-array signatures —
  * the MinHash Jaccard-estimate numerator.
  *
  * Why an expression: the zip_with + aggregate formulation is two nested
  * interpreted higher-order functions per candidate pair AND disables
  * whole-stage codegen for the verify stage; this is one fused loop that
  * stays inside codegen. Trailing slots of the longer array (if lengths
  * ever differ) count as disagreement.
  */
case class SignatureAgreement(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) && $a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object MinHashExpression {
  def minhashArray(baseHashes: Column, numHashes: Int, seed: Long): Column =
    ColumnBridge.column(MinHashArray(ColumnBridge.expression(baseHashes), numHashes, seed))

  def minhashTokens(tokens: Column, shingleSize: Int, numHashes: Int, seed: Long): Column =
    ColumnBridge.column(MinHashOfTokens(
      ColumnBridge.expression(tokens), shingleSize, numHashes, seed))

  def signatureAgreement(sigA: Column, sigB: Column): Column =
    ColumnBridge.column(SignatureAgreement(
      ColumnBridge.expression(sigA), ColumnBridge.expression(sigB)))

  def ngramWindowHashes(tokens: Column, shingleSize: Int, seed: Long = 42L): Column =
    ColumnBridge.column(NgramWindowHashes(
      ColumnBridge.expression(tokens), shingleSize, seed))

  def bandHashes(signature: Column, bands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(BandHashes(
      ColumnBridge.expression(signature), bands, rowsPerBand))

  def winnowMinHashes(hashes: Column, window: Int): Column =
    ColumnBridge.column(WinnowMinHashes(ColumnBridge.expression(hashes), window))

  def winnowMinPositions(hashes: Column, window: Int): Column =
    ColumnBridge.column(WinnowMinPositions(ColumnBridge.expression(hashes), window))
}
