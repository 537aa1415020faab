package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{BandHashes, BpeIshTokenCount, FloatVecCosine,
  FloatVecDot, JaccardSimilarity, MinHashArray, MinHashOfTokens,
  MultiPatternHits, NgramWindowHashes, SignatureAgreement, SimHashOfTokens,
  WinnowMinHashes, WinnowMinPositions}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions so `spark.sql(...)` users get them
  * too. Activate with either
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` at session
  * build, or `GraftExtensions.register(spark)` on a live session.
  *
  *   - graft_cosine(a, b) — fused cosine similarity over float/double arrays
  *   - graft_dot(a, b)    — fused dot product
  *   - graft_minhash(hashes, k, seed) — k-minima minhash signature
  *   - graft_minhash_tokens(tokens, shingleSize, k, seed) — fused tokens→sig
  *   - graft_simhash(tokens, seed) — fused 64-bit simhash
  *   - graft_sig_agreement(a, b) — equal-slot count of two signatures
  *   - graft_jaccard(a, b) — set Jaccard of two string arrays
  *   - graft_bpeish_count(tokens) — BPE-ish subword count
  *   - graft_ngram_hashes(tokens, n, seed) — n-gram window hashes
  *   - graft_winnow(hashes, window) — winnowing fingerprint selection
  *   - graft_winnow_positions(hashes, window) — selected token offsets (span reconstruction)
  *   - graft_band_hashes(sig, bands, rowsPerBand) — LSH band bucket keys
  *   - graft_pattern_hits(text, p1, p2, ...) — Aho–Corasick matched-pattern indices
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, (info, builder)) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def strLit(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
      v.toString
    case other =>
      throw new IllegalArgumentException(s"$what must be a string literal, got $other")
  }

  val functions: Seq[(String, (ExpressionInfo, Seq[Expression] => Expression))] = Seq(
    "graft_cosine" -> (
      new ExpressionInfo(classOf[FloatVecCosine].getName, "graft_cosine"),
      (args: Seq[Expression]) => FloatVecCosine(args(0), args(1))),
    "graft_dot" -> (
      new ExpressionInfo(classOf[FloatVecDot].getName, "graft_dot"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))),
    "graft_minhash" -> (
      new ExpressionInfo(classOf[MinHashArray].getName, "graft_minhash"),
      (args: Seq[Expression]) =>
        MinHashArray(args(0), intLit(args(1), "numHashes"),
          intLit(args(2), "seed").toLong)),
    "graft_minhash_tokens" -> (
      new ExpressionInfo(classOf[MinHashOfTokens].getName, "graft_minhash_tokens"),
      (args: Seq[Expression]) =>
        MinHashOfTokens(args(0), intLit(args(1), "shingleSize"),
          intLit(args(2), "numHashes"), intLit(args(3), "seed").toLong)),
    "graft_simhash" -> (
      new ExpressionInfo(classOf[SimHashOfTokens].getName, "graft_simhash"),
      (args: Seq[Expression]) =>
        SimHashOfTokens(args(0), intLit(args(1), "seed").toLong)),
    "graft_sig_agreement" -> (
      new ExpressionInfo(classOf[SignatureAgreement].getName, "graft_sig_agreement"),
      (args: Seq[Expression]) => SignatureAgreement(args(0), args(1))),
    "graft_jaccard" -> (
      new ExpressionInfo(classOf[JaccardSimilarity].getName, "graft_jaccard"),
      (args: Seq[Expression]) => JaccardSimilarity(args(0), args(1))),
    "graft_bpeish_count" -> (
      new ExpressionInfo(classOf[BpeIshTokenCount].getName, "graft_bpeish_count"),
      (args: Seq[Expression]) => BpeIshTokenCount(args(0))),
    "graft_ngram_hashes" -> (
      new ExpressionInfo(classOf[NgramWindowHashes].getName, "graft_ngram_hashes"),
      (args: Seq[Expression]) =>
        NgramWindowHashes(args(0), intLit(args(1), "n"),
          intLit(args(2), "seed").toLong)),
    "graft_winnow" -> (
      new ExpressionInfo(classOf[WinnowMinHashes].getName, "graft_winnow"),
      (args: Seq[Expression]) =>
        WinnowMinHashes(args(0), intLit(args(1), "window"))),
    "graft_winnow_positions" -> (
      new ExpressionInfo(classOf[WinnowMinPositions].getName, "graft_winnow_positions"),
      (args: Seq[Expression]) =>
        WinnowMinPositions(args(0), intLit(args(1), "window"))),
    "graft_band_hashes" -> (
      new ExpressionInfo(classOf[BandHashes].getName, "graft_band_hashes"),
      (args: Seq[Expression]) =>
        BandHashes(args(0), intLit(args(1), "bands"),
          intLit(args(2), "rowsPerBand"))),
    "graft_pattern_hits" -> (
      new ExpressionInfo(classOf[MultiPatternHits].getName, "graft_pattern_hits"),
      (args: Seq[Expression]) => {
        require(args.size >= 2,
          "graft_pattern_hits(text, pattern, ...) needs at least one pattern")
        MultiPatternHits(args.head, args.tail.map(strLit(_, "pattern")))
      })
  )

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, (_, builder)) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, exprs => builder(exprs), "scala_udf")
    }
}
