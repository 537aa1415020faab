package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Text}
import graft.tools.RealCorpus

/** Round-12 linearity gate (VERDICT r11 item 4): the round-11 superlinear
  * minhash band-join bug was caught by a MANUALLY-run rehearsal; this spec
  * makes the 1×-vs-10× scaling check part of `sbt test` so the next
  * superlinear stage is caught mechanically. On the realistic bounded-dup
  * corpus (scale-invariant dup structure, √-growing vocabulary) every
  * curate stage must scale ~linearly: wall(10×) ≤ budget × wall(1×) with
  * floors absorbing scheduling noise, and the candidate VOLUME itself must
  * scale ~10× (a corpus whose pair structure goes quadratic would blame
  * the engine for the corpus).
  *
  * Flake discipline: both scales run back-to-back in one session, so
  * machine-wide contention largely cancels in the RATIO; a stage that
  * still exceeds its budget is re-timed once (both scales) before failing
  * — the bench's rerun discipline applied to the gate. The pre-fix
  * round-11 bug measured ≳23× here; the budget of 16× sits between
  * linear-with-noise and genuinely superlinear. */
class CurateLinearitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val bench = Array(
    "the quick brown benchmark of linearity gates runs at every scale",
    "a second benchmark document keeps the contamination leg honest")

  /** (stage name, wall seconds, result cardinality) for one corpus scale. */
  private def stages(mult: Int): Seq[(String, Double, Long)] = {
    val docs = spark.read.parquet(RealCorpus.generate(spark, mult, bench))
      .select("doc_id", "text")
    def timed(label: String)(f: => Long): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      (label, (System.nanoTime() - t0) / 1e9, n)
    }
    val normalized = docs.withColumn("__norm", Text.normalizeText(col("text")))
    var survivors: DataFrame = null
    val exact = timed("exact-dedup") {
      val ids = Dedup.exactDedupIds(normalized, "__norm", "doc_id")
      survivors = normalized.join(ids, Seq("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      survivors.count()
    }
    var cands: DataFrame = null
    val minhash = timed("minhash-cands") {
      cands = Dedup.minhashCandidates(survivors, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cands.count()
    }
    val comps = timed("components") {
      Dedup.connectedComponents(
        cands.filter(col("jaccard_est") >= 0.8)
          .select(col("idA"), col("idB"))).count()
    }
    cands.unpersist(blocking = true)
    survivors.unpersist(blocking = true)
    spark.sharedState.cacheManager.clearCache()
    Seq(exact, minhash, comps)
  }

  test("curate stages scale linearly from 1x to 10x on the realistic " +
    "corpus (wall ratio <= 16x with floors; candidate volume ~10x)") {
    // warm pass: JIT + codegen compile must not inflate the 1x timings
    // (a slow 1x would make the ratio LENIENT, not strict)
    stages(1)

    def ratios(): (Seq[(String, Double, Double, Double)], Long, Long) = {
      val s2 = stages(2)   // 10k docs
      val s20 = stages(20) // 100k docs
      val rs = s2.zip(s20).map { case ((n, t1, _), (_, t10, _)) =>
        (n, t1, t10, t10 / math.max(t1, 0.75))
      }
      (rs, s2(1)._3, s20(1)._3)
    }

    var (rs, c2, c20) = ratios()
    info(rs.map { case (n, t1, t10, r) =>
      f"$n: $t1%.2f s -> $t10%.2f s (ratio $r%.1f)" }.mkString("; "))
    // candidate volume must itself be ~linear (corpus sanity: a quadratic
    // pair structure would be the corpus's fault, not the engine's)
    val volRatio = c20.toDouble / math.max(c2, 1L)
    assert(volRatio > 6.0 && volRatio < 14.0,
      s"candidate volume ratio $volRatio (=$c20/$c2) is not ~10x — the " +
        "corpus dup structure degenerated")
    if (rs.exists(_._4 > 16.0)) {
      // one clean re-time before failing: a transient stall on the 10x
      // pass must not fail the gate (same discipline as the bench rerun)
      val (rs2, _, _) = ratios()
      rs = rs.zip(rs2).map { case (a, b) => if (a._4 <= b._4) a else b }
      info("re-timed: " + rs.map { case (n, t1, t10, r) =>
        f"$n: $t1%.2f s -> $t10%.2f s (ratio $r%.1f)" }.mkString("; "))
    }
    rs.foreach { case (n, t1, t10, r) =>
      assert(r <= 16.0,
        f"stage $n is SUPERLINEAR: $t1%.2f s at 1x -> $t10%.2f s at 10x " +
          f"(ratio $r%.1f > 16) — the round-11 band-join class of bug")
    }
  }
}
