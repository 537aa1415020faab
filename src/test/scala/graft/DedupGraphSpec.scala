package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Dedup

class DedupGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("connectedComponents labels chains and cliques by min id") {
    // components: {1,2,3,4} (chain), {10,11}, singleton edges only appear via pairs
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("idA", "idB")
    val comps = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(1L) == 1L && comps(2L) == 1L && comps(3L) == 1L && comps(4L) == 1L)
    assert(comps(10L) == 10L && comps(11L) == 10L)
  }

  test("dedupNearDuplicates removes planted near-duplicates, keeps originals") {
    val base = "spark catalyst tungsten shuffle partition broadcast join agg filter scan"
    val docs = Seq(
      (1L, base),
      (2L, base),                                    // exact dup of 1
      (3L, base + " extra"),                         // near dup of 1
      (4L, "completely different words about cooking pasta tomatoes basil herbs"),
      (5L, "yet another unrelated document on sailing boats wind sea waves")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupNearDuplicates(docs, "doc_id", "text",
      threshold = 0.5, shingleSize = 2, numHashes = 32, bands = 16)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.contains(1L) && !out.contains(2L))
    assert(out.contains(4L) && out.contains(5L))
  }

  test("simhash blocking at radius r finds all pairs within r") {
    // construct docs, compute true pairwise hamming, compare with candidates
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"),
      (3L, "z y x w v u t s r q")
    ).toDF("doc_id", "text")
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val r = 12
    val truth = (for {
      a <- sigs.keys; b <- sigs.keys if a < b && ham(sigs(a), sigs(b)) <= r
    } yield (a, b)).toSet
    val cands = Dedup.simhashCandidates(docs, "doc_id", "text", maxHamming = r)
      .select("idA", "idB").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(truth.subsetOf(cands) && cands.subsetOf(truth))
  }
}
