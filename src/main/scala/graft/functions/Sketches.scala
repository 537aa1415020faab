package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.expressions.MinKDistinct

/** Mergeable cardinality / frequency sketches over md5-derived hashes.
  *
  * Every sketch here is (a) BOUNDED-STATE — per-group state is O(k), O(2^b)
  * or O(d·w) regardless of corpus size, so the shuffle carries synopses,
  * never data; (b) MERGEABLE with set/max/sum semantics — map-side combine
  * applies, partial sketches from 1000 executors union losslessly, and the
  * same state folds incrementally under Structured Streaming; (c)
  * DETERMINISTIC — hashes are md5 prefixes, estimates are single rounded
  * IEEE chains over exact-integer statistics, so a sketch built by any
  * engine on any partitioning is bit-identical (the oracle mirrors the
  * whole construction, not just the answer's shape).
  *
  * At 100 TB these replace exact `count(DISTINCT)` (a full shuffle of every
  * distinct value) and exact per-key counts (a vocabulary-sized table)
  * wherever ±1-2% error is acceptable — the standard trade for profiling,
  * cardinality planning, and monitoring dashboards.
  *
  * References: Bar-Yossef et al. 2002 + Beyer et al. 2007 (KMV); Flajolet
  * et al. 2007 (HyperLogLog); Cormode & Muthukrishnan 2005 (Count-Min).
  */
object Sketches {

  /** 48-bit md5 prefix as a long in [0, 2^48) — uniform enough for synopsis
    * hashing, exact in the double domain (< 2^53), and byte-identical in
    * any engine with md5. */
  def h48(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")

  private val H: Double = 281474976710656.0 // 2^48, exact in double

  /** KMV distinct-count estimate per group: keep the k smallest distinct
    * 48-bit hashes of `valueCol` (one bounded aggregate), estimate
    * (k−1)·2^48 / kth-smallest — or EXACT when the group holds fewer than k
    * distinct hashes (the synopsis degrades gracefully to a distinct set).
    *
    * Output: groupCols*, n_held, kth_hash, est_distinct.
    * (k−1)·2^48 has ≤ ~7 significant bits × 2^48 — exact in double; the
    * division is the single IEEE step, rounded before output. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int = 64): DataFrame = {
    require(k >= 2, s"kmvDistinct: k must be >= 2, got $k")
    val mins = df
      .select(groupCols.map(col) :+ h48(col(valueCol)).as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(MinKDistinct.minK(col("__h"), k).as("__mins"))
    val nHeld = size(col("__mins"))
    val kth = element_at(col("__mins"), nHeld).cast(DoubleType)
    mins.select(
      groupCols.map(col) ++ Seq(
        nHeld.cast("long").as("n_held"),
        element_at(col("__mins"), nHeld).as("kth_hash"),
        when(nHeld < k, nHeld.cast(DoubleType))
          .otherwise(round(lit((k - 1).toDouble) * lit(H) / kth, 2))
          .as("est_distinct")): _*)
  }

  /** HyperLogLog registers + estimate per group, b bucket bits (m = 2^b
    * registers). Register state is ONE exact max-aggregate: bucket = top b
    * bits of the 48-bit hash, rho = 1 + leading zeros of the remaining
    * W = 48−b bits (computed EXACTLY as W − length(bin(rest)) + 1 — no
    * floating-point log anywhere).
    *
    * The harmonic sum Σ 2^−reg is computed in EXACT integer arithmetic:
    * Σ 2^(K−reg) as a long (K = W+2 > max rho, so every term is an
    * integer; the sum is < m·2^K ≤ 2^(b+K) < 2^63), divided back by 2^K in
    * the single rounded IEEE chain. Empty buckets (register 0) contribute
    * m−n_present terms of 2^K — arithmetic, not generated rows. The
    * small-range correction is linear counting m·ln(m/V) when E ≤ 2.5m and
    * V > 0 (Flajolet et al. 2007 §4).
    *
    * Output: groupCols*, m, n_zero, harmonic_num (the exact integer Σ),
    * est_distinct. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  b: Int = 9): DataFrame =
    hllFinalize(hllRegisters(df, groupCols, valueCol, b), groupCols, b)

  /** The HLL register table (groupCols*, __bucket, __reg): ONE exact
    * max-aggregate — max is idempotent and mergeable, so the identical
    * plan folds INCREMENTALLY under Structured Streaming (register state
    * in the store is ≤ m rows per group) and the streamed registers equal
    * the batch registers under any micro-batching. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   b: Int = 9): DataFrame = {
    require(b >= 4 && b <= 16, s"hllRegisters: b must be in [4,16], got $b")
    val w = 48 - b
    val h = h48(col(valueCol))
    val bucket = shiftright(h, w) // top b bits; h < 2^48 so the shift is clean
    val rest = (h % lit(1L << w)).cast("long")
    // rho: 1 + (# leading zeros of rest in W bits); bin() drops leading
    // zeros so length(bin(rest)) IS the MSB position — exact integer path.
    val rho = when(col("__rest") === 0, lit(w + 1))
      .otherwise(lit(w) - length(bin(col("__rest"))) + 1)
    df.select(groupCols.map(col) :+ bucket.as("__bucket") :+ rest.as("__rest"): _*)
      .withColumn("__rho", rho)
      .groupBy(groupCols.map(col) :+ col("__bucket"): _*)
      .agg(max(col("__rho")).as("__reg"))
  }

  /** Estimate from a [[hllRegisters]] table (same b). */
  def hllFinalize(regs: DataFrame, groupCols: Seq[String],
                  b: Int): DataFrame = {
    val m = 1 << b
    val w = 48 - b
    val bigK = w + 2
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val stats = regs
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__present"),
        // 2^(K−reg) as an exact long: SQL shiftleft takes a column shift
        // amount (the Scala wrapper doesn't)
        sum(expr(s"shiftleft(1L, $bigK - __reg)")).as("__s_present"))
    // Σ 2^(K−reg) over ALL m registers: absent buckets have reg = 0.
    val harmonic =
      (col("__s_present") + (lit(m.toLong) - col("__present")) * lit(1L << bigK))
        .as("harmonic_num")
    val nZero = (lit(m.toLong) - col("__present")).as("n_zero")
    val raw = lit(alpha) * lit(m.toDouble) * lit(m.toDouble) *
      lit(Math.pow(2.0, bigK)) / col("harmonic_num").cast(DoubleType)
    val est = when(col("n_zero") > 0 && raw <= lit(2.5 * m),
        round(lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero").cast(DoubleType)), 2))
      .otherwise(round(raw, 2))
    stats
      .select(groupCols.map(col) ++ Seq(lit(m.toLong).as("m"), nZero, harmonic): _*)
      .withColumn("est_distinct", est)
  }

  /** Count-Min sketch cells: d independent hash rows × w buckets, cell =
    * exact sum of `weightCol` (1 if null) for values hashing there. One
    * map-side-combined aggregate with ≤ d·w groups — the frequency-table
    * synopsis whose size never depends on the vocabulary.
    *
    * Output: r (hash row), bucket, c. */
  def cmsSketch(df: DataFrame, valueCol: String, depth: Int = 4,
                width: Int = 512, weightCol: Option[String] = None): DataFrame = {
    require(depth >= 1 && width >= 2, s"cmsSketch: bad dims d=$depth w=$width")
    val wcol = weightCol.map(col(_).cast("long")).getOrElse(lit(1L))
    // ONE scan: each row explodes to its d (row, bucket) addresses in
    // place — no d-way union re-reading the corpus.
    val addrs = array((0 until depth).map { r =>
      struct(lit(r).as("r"),
        (h48(concat(lit(s"$r:"), col(valueCol).cast("string"))) % width)
          .cast("long").as("bucket"))
    }: _*)
    df.select(explode(addrs).as("__a"), wcol.as("__w"))
      .groupBy(col("__a.r").as("r"), col("__a.bucket").as("bucket"))
      .agg(sum(col("__w")).as("c"))
  }

  /** Point-query estimates from a CMS built by [[cmsSketch]] (same depth /
    * width / hashing): for each distinct value in `queries(valueCol)`,
    * est = min over the d rows of the addressed cell — the classic
    * one-sided estimate (never under the true count). The d lookups are a
    * (r, bucket)-keyed join against the d·w-row sketch — broadcast-sized
    * by construction. */
  def cmsEstimate(sketch: DataFrame, queries: DataFrame, valueCol: String,
                  depth: Int = 4, width: Int = 512): DataFrame = {
    val probes = queries.select(col(valueCol)).distinct()
      .crossJoin(spark_range_df(queries, depth))
      .select(col(valueCol), col("r"),
        (h48(concat(col("r").cast("string"), lit(":"), col(valueCol).cast("string"))) % width)
          .cast("long").as("bucket"))
    probes
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  private def spark_range_df(like: DataFrame, n: Int): DataFrame = {
    val s = like.sparkSession
    import s.implicits._
    (0 until n).toDF("r")
  }
}
