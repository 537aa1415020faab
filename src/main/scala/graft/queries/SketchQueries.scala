package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.{Sketches, Text, Windowing}
import Tables.star

/** Cardinality / frequency sketch queries: bounded-state synopses (KMV,
  * HyperLogLog, Count-Min) whose construction is deterministic md5 hashing
  * + exact integer statistics, so the ORACLE MIRRORS THE WHOLE SKETCH —
  * registers, harmonic sums, cell counts — not just an answer shape. Each
  * query also carries the exact answer and the error, so the sketch's
  * accuracy contract is part of the checked output.
  */
object SketchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // KMV distinct-token estimate per language vs the exact answer. The
    // synopsis is one bounded aggregate (≤ k longs per group per
    // partition); the estimate is (k−1)·2^48 / kth-smallest-hash — or
    // exact below capacity. The error column makes the ±1/√(k−2) accuracy
    // contract part of the hash-checked result.
    "q_kmv_distinct" -> ((s, dir) => {
      val toks = star(s, dir, "documents").df
        .select(col("lang"), explode(Text.tokens(col("text"))).as("token"))
      val kmv = Sketches.kmvDistinct(toks, Seq("lang"), "token", k = 64)
      val exact = toks.groupBy(col("lang"))
        .agg(countDistinct(col("token")).as("exact_distinct"))
      kmv.join(exact, Seq("lang"))
        .select(col("lang"), col("n_held"), col("kth_hash"),
          col("est_distinct"), col("exact_distinct"),
          round(col("est_distinct") / col("exact_distinct").cast(DoubleType)
            - 1.0, 4).as("rel_err"))
    }),

    // HyperLogLog distinct-token estimate per language (b = 9 → 512
    // registers) vs exact. Register state is ONE max-aggregate; the
    // harmonic sum is an exact long (Σ 2^(K−reg)); leading-zero counts go
    // through bin()-length — no floating-point log anywhere in the sketch,
    // and the single estimate chain is rounded. The m/n_zero/harmonic
    // columns pin the full register state, not just the estimate.
    "q_hll_distinct" -> ((s, dir) => {
      val toks = star(s, dir, "documents").df
        .select(col("lang"), explode(Text.tokens(col("text"))).as("token"))
      val hll = Sketches.hllDistinct(toks, Seq("lang"), "token", b = 9)
      val exact = toks.groupBy(col("lang"))
        .agg(countDistinct(col("token")).as("exact_distinct"))
      hll.join(exact, Seq("lang"))
        .select(col("lang"), col("m"), col("n_zero"), col("harmonic_num"),
          col("est_distinct"), col("exact_distinct"),
          round(col("est_distinct") / col("exact_distinct").cast(DoubleType)
            - 1.0, 4).as("rel_err"))
    }),

    // Count-Min point estimates for the exact top-20 tokens: the d×w cell
    // table is one map-side-combined aggregate (state d·w, never
    // vocabulary-sized); estimates are min over d addressed cells — never
    // below the true count, so `overcount` ≥ 0 is part of the checked
    // output.
    "q_cms_counts" -> ((s, dir) => {
      val toks = star(s, dir, "documents").df
        .select(explode(Text.tokens(col("text"))).as("token"))
      val sketch = Sketches.cmsSketch(toks, "token", depth = 4, width = 512)
      val truec = toks.groupBy(col("token"))
        .agg(count(lit(1)).as("true_c"))
        .withColumn("__g", lit(0))
        .withColumn("__neg", -col("true_c"))
      val top = Windowing.globalRowNumber(truec, Seq("__g"),
          Seq("__neg", "token"), "rank")
        .filter(col("rank") <= 20)
        .select(col("token"), col("true_c"), col("rank"))
      Sketches.cmsEstimate(sketch, top, "token", depth = 4, width = 512)
        .join(top, Seq("token"))
        .select(col("token"), col("true_c"), col("est"),
          (col("est") - col("true_c")).as("overcount"), col("rank"))
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q_kmv_distinct" ->
      """WITH tok AS MATERIALIZED (
        |  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents),
        |h AS (
        |  SELECT DISTINCT lang,
        |    CAST('0x' || substring(md5(token), 1, 12) AS BIGINT) AS h
        |  FROM tok),
        |r AS (SELECT lang, h,
        |    row_number() OVER (PARTITION BY lang ORDER BY h ASC) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS nh
        |  FROM h),
        |kth AS (
        |  SELECT lang, CAST(least(nh, 64) AS BIGINT) AS n_held, h AS kth_hash
        |  FROM r WHERE rn = least(nh, 64)),
        |ex AS (SELECT lang, CAST(count(DISTINCT token) AS BIGINT)
        |    AS exact_distinct FROM tok GROUP BY 1),
        |est AS (
        |  SELECT lang, n_held, kth_hash,
        |    CASE WHEN n_held < 64 THEN CAST(n_held AS DOUBLE)
        |      ELSE round(63.0 * 281474976710656.0 / CAST(kth_hash AS DOUBLE), 2)
        |    END AS est_distinct
        |  FROM kth)
        |SELECT e.lang, e.n_held, e.kth_hash, e.est_distinct, x.exact_distinct,
        |  round(e.est_distinct / CAST(x.exact_distinct AS DOUBLE) - 1.0, 4)
        |    AS rel_err
        |FROM est e JOIN ex x ON x.lang = e.lang""".stripMargin,

    "q_hll_distinct" ->
      """WITH tok AS MATERIALIZED (
        |  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents),
        |h AS (
        |  SELECT lang,
        |    CAST('0x' || substring(md5(token), 1, 12) AS BIGINT) AS h
        |  FROM tok),
        |parts AS (
        |  SELECT lang, h // 549755813888 AS bucket, h % 549755813888 AS rest
        |  FROM h),
        |rr AS (
        |  SELECT lang, bucket, CASE WHEN rest = 0 THEN 40
        |    ELSE 39 - length(bin(rest)) + 1 END AS rho
        |  FROM parts),
        |regs AS (SELECT lang, bucket, max(rho) AS reg FROM rr GROUP BY 1, 2),
        |stats AS (
        |  SELECT lang, count(*) AS present,
        |    sum(CAST(1 AS BIGINT) << CAST(41 - reg AS INTEGER)) AS s_present
        |  FROM regs GROUP BY 1),
        |fin AS (
        |  SELECT lang, CAST(512 AS BIGINT) AS m,
        |    CAST(512 - present AS BIGINT) AS n_zero,
        |    CAST(s_present + (512 - present) * 2199023255552 AS BIGINT)
        |      AS harmonic_num
        |  FROM stats),
        |est AS (
        |  SELECT *, (0.7213 / (1 + 1.079 / 512.0)) * 512.0 * 512.0 *
        |    2199023255552.0 / CAST(harmonic_num AS DOUBLE) AS raw
        |  FROM fin),
        |ex AS (SELECT lang, CAST(count(DISTINCT token) AS BIGINT)
        |    AS exact_distinct FROM tok GROUP BY 1),
        |done AS (
        |  SELECT lang, m, n_zero, harmonic_num,
        |    CASE WHEN n_zero > 0 AND raw <= 1280.0
        |      THEN round(512.0 * ln(512.0 / CAST(n_zero AS DOUBLE)), 2)
        |      ELSE round(raw, 2) END AS est_distinct
        |  FROM est)
        |SELECT d.lang, d.m, d.n_zero, d.harmonic_num, d.est_distinct,
        |  x.exact_distinct,
        |  round(d.est_distinct / CAST(x.exact_distinct AS DOUBLE) - 1.0, 4)
        |    AS rel_err
        |FROM done d JOIN ex x ON x.lang = d.lang""".stripMargin,

    "q_cms_counts" ->
      """WITH tok AS MATERIALIZED (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents),
        |tc AS (SELECT token, CAST(count(*) AS BIGINT) AS true_c
        |  FROM tok GROUP BY 1),
        |top AS (
        |  SELECT token, true_c,
        |    row_number() OVER (ORDER BY true_c DESC, token ASC) AS rank
        |  FROM tc QUALIFY rank <= 20),
        |rs AS (SELECT unnest(range(4)) AS r),
        |cells AS MATERIALIZED (
        |  SELECT r, CAST('0x' || substring(md5(CAST(r AS VARCHAR) || ':' ||
        |    token), 1, 12) AS BIGINT) % 512 AS bucket,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM tok CROSS JOIN rs GROUP BY 1, 2),
        |probes AS (
        |  SELECT t.token, r.r, CAST('0x' || substring(md5(CAST(r.r AS VARCHAR)
        |    || ':' || t.token), 1, 12) AS BIGINT) % 512 AS bucket
        |  FROM top t CROSS JOIN rs r),
        |est AS (
        |  SELECT p.token, CAST(min(coalesce(c.c, 0)) AS BIGINT) AS est
        |  FROM probes p LEFT JOIN cells c ON c.r = p.r AND c.bucket = p.bucket
        |  GROUP BY 1)
        |SELECT t.token, t.true_c, e.est, e.est - t.true_c AS overcount, t.rank
        |FROM top t JOIN est e ON e.token = t.token""".stripMargin
  )
}
