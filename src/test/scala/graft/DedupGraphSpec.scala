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

  test("multi-index simhash blocking is exact at radius 8 on adversarial signatures") {
    // Signatures hand-built around the pigeonhole boundary: pairs at
    // distance exactly 8 with errors spread 2-2-2-2 across the four 16-bit
    // blocks (the worst case for block agreement), at distance 9 (must be
    // excluded), and identical signatures (distance 0 via the collapse path).
    val s0 = 0x0123456789ABCDEFL
    def flip(s: Long, bits: Seq[Int]) = bits.foldLeft(s)((x, b) => x ^ (1L << b))
    val sigs = Seq(
      (1L, s0),
      (2L, flip(s0, Seq(0, 1, 16, 17, 32, 33, 48, 49))), // d=8, spread 2-2-2-2
      (3L, flip(s0, Seq(0, 1, 2, 16, 17, 32, 33, 48, 49))), // d=9 from 1
      (4L, s0),                                          // identical to 1
      (5L, flip(s0, Seq(5))),                            // d=1
      (6L, ~s0)                                          // d=64
    ).toDF("id", "sig")
    val got = Dedup.simhashCandidatesFromSigs(sigs, maxHamming = 8)
      .select("idA", "idB", "hamming").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val raw = Map(1L -> s0, 2L -> flip(s0, Seq(0, 1, 16, 17, 32, 33, 48, 49)),
      3L -> flip(s0, Seq(0, 1, 2, 16, 17, 32, 33, 48, 49)), 4L -> s0,
      5L -> flip(s0, Seq(5)), 6L -> ~s0)
    val truth = (for {
      a <- raw.keys; b <- raw.keys if a < b && ham(raw(a), raw(b)) <= 8
    } yield (a, b) -> ham(raw(a), raw(b))).toMap
    assert(got == truth)
    assert(got.contains((1L, 2L)) && !got.contains((1L, 3L)) && got((1L, 4L)) == 0)
  }

  test("identical-signature boilerplate collapses before the blocking join") {
    // 10% of the corpus shares ONE signature: the blocking self-join sees a
    // single distinct-sig row for the whole group (no quadratic bucket),
    // while the expansion emits exactly the C(k,2) intra-group pairs.
    val boiler = (0 until 50).map(i => (1000L + i, 0xDEADBEEFL))
    val rest = (0 until 450).map(i => (i.toLong, 0x8000000000000000L | (i.toLong << 20) | (i.toLong * 2654435761L >>> 44)))
    val sigs = (boiler ++ rest).toDF("id", "sig")
    val pairs = Dedup.simhashCandidatesFromSigs(sigs, maxHamming = 2)
      .filter(col("idA") >= 1000L)
      .collect()
    assert(pairs.count(r => r.getInt(2) == 0) == 50 * 49 / 2)
  }

  test("minhash survives a planted-boilerplate corpus and keeps est=1.0 pairs") {
    val boiler = "identical boilerplate text repeated across many documents in the corpus"
    val docs = ((0 until 40).map(i => (i.toLong, boiler)) ++
      (40 until 400).map(i => (i.toLong,
        s"unique document $i with words w${i}a w${i}b w${i}c w${i}d w${i}e"))).toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text",
      shingleSize = 2, numHashes = 32, bands = 8)
      .filter(col("jaccard_est") >= 0.99)
      .collect()
    val intra = cands.filter(r => r.getLong(0) < 40 && r.getLong(1) < 40)
    assert(intra.length == 40 * 39 / 2)
    intra.foreach(r => assert(r.getDouble(2) == 1.0))
  }

  test("dedup candidate sets are invariant under repartitioning") {
    // Distributed correctness: results must not depend on how the input is
    // split across tasks — run the same corpora at 2 and 19 partitions.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    def simhashSet(p: Int) =
      Dedup.simhashCandidates(docs.repartition(p), "doc_id", "text", maxHamming = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(simhashSet(2) == simhashSet(19))
    def minhashSet(p: Int) =
      Dedup.minhashCandidates(docs.repartition(p), "doc_id", "text",
        shingleSize = 2, numHashes = 32, bands = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(minhashSet(2) == minhashSet(19))
  }

  test("connectedComponents keeps cached storage bounded across iterations") {
    // A 40-node chain needs many label-propagation rounds; the superseded
    // label generations must be unpersisted as the loop advances.
    val chain = (0 until 39).map(i => (i.toLong, i.toLong + 1)).toDF("idA", "idB")
    val before = spark.sparkContext.getPersistentRDDs.size
    val comps = Dedup.connectedComponents(chain, maxIter = 12)
    assert(comps.filter(col("component") === 0L).count() >= 1)
    val after = spark.sparkContext.getPersistentRDDs.size
    // edges + at most one live label generation (+ one checkpoint RDD)
    assert(after - before <= 3, s"cached RDDs grew by ${after - before}")
  }

  test("connectedComponents uses RELIABLE checkpoints when a dir is set") {
    // A 10-node chain (min-label propagation crosses one hop per round, so
    // it converges inside maxIter while still firing the every-3-rounds
    // truncation three times) with sc.setCheckpointDir: lineage truncation
    // must go through stable-storage checkpoints (files appear under the
    // dir — the path that survives executor loss on a cluster), produce
    // identical labels, and leave no extra cached RDDs.
    val sc = spark.sparkContext
    val cpDir = java.nio.file.Files.createTempDirectory("graft_cc_cp").toString
    try {
      sc.setCheckpointDir(cpDir)
      val chain = (0 until 9).map(i => (i.toLong, i.toLong + 1)).toDF("idA", "idB")
      val before = sc.getPersistentRDDs.size
      val comps = Dedup.connectedComponents(chain, maxIter = 12)
      val labels = comps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels.size == 10 && labels.values.forall(_ == 0L),
        "chain must collapse to component 0")
      comps.unpersist(blocking = true)
      val after = sc.getPersistentRDDs.size
      assert(after - before <= 0, s"cached RDDs grew by ${after - before}")
      // reliable checkpoint files were actually written to stable storage
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(cpDir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "no reliable checkpoint files written under the dir")
    } finally {
      sc.setCheckpointDir(null) // restore localCheckpoint behavior for other suites
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cpDir))
    }
  }

  test("property: MIH blocking is exact for random signatures at radii 0..12") {
    // 200 random sigs + planted near pairs; candidates must equal the
    // brute-force pair set at every radius band the adaptive blocker uses.
    val rnd = new scala.util.Random(1234)
    val base = (0 until 200).map(i => (i.toLong, rnd.nextLong()))
    // plant near-duplicates at controlled distances off existing sigs
    def flipBits(s: Long, n: Int): Long = {
      var x = s
      val picked = scala.collection.mutable.Set.empty[Int]
      while (picked.size < n) picked += rnd.nextInt(64)
      picked.foreach(b => x ^= 1L << b)
      x
    }
    val planted = (0 until 40).map { i =>
      val (_, s) = base(rnd.nextInt(base.size))
      (1000L + i, flipBits(s, rnd.nextInt(13)))
    }
    val all = base ++ planted
    val sigsDf = all.toDF("id", "sig")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (r <- Seq(0, 2, 3, 5, 8, 12)) {
      val truth = (for {
        (ia, sa) <- all; (ib, sb) <- all
        if ia < ib && ham(sa, sb) <= r
      } yield (ia, ib)).toSet
      val got = Dedup.simhashCandidatesFromSigs(sigsDf, maxHamming = r)
        .select("idA", "idB").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == truth, s"radius $r: got ${got.size}, truth ${truth.size}")
    }
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

  test("cross-corpus minhash finds near-dups between batches, not within") {
    val base = "spark catalyst tungsten shuffle partition broadcast join agg filter scan"
    val ref = Seq(
      (100L, base),
      (101L, "reference doc about cooking pasta tomatoes basil herbs and olive oil"),
      (102L, "sailing boats wind sea waves harbor anchor deck sail mast")
    ).toDF("doc_id", "text")
    val newBatch = Seq(
      (1L, base),                                   // exact dup of ref 100
      (2L, base + " extra"),                        // near dup of ref 100
      (3L, "entirely new content about mountain hiking trails and snow")
    ).toDF("doc_id", "text")
    val out = Dedup.minhashCandidatesAgainst(newBatch, ref, "doc_id", "text",
        shingleSize = 2, numHashes = 64, bands = 16)
      .filter(col("jaccard_est") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 100L)), s"exact cross-corpus dup missed: $out")
    assert(out.contains((2L, 100L)), s"near cross-corpus dup missed: $out")
    assert(!out.exists(_._1 == 3L), s"false pair for novel doc: $out")
    // bipartite: no new-new or ref-ref pairs by construction
    assert(out.forall { case (n, r) => n < 100 && r >= 100 })
  }

  test("dedupNearDuplicatesBy keeps the highest-quality cluster member, " +
    "ties to the smaller id, singletons untouched") {
    val fluent = "the cat sat on the mat and the dog slept near the door"
    val docs = Seq(
      (1L, fluent, 2.0),                    // cluster A
      (2L, fluent + " today", 5.0),         // cluster A — best quality
      (3L, fluent + " now", 5.0),           // cluster A — tie, larger id
      (10L, "completely different text about spark shuffles and joins", 0.0),
      (20L, "sailing boats wind sea waves harbor anchor deck sail", 1.0),
      (21L, "sailing boats wind sea waves harbor anchor deck sail", 1.0)
    ).toDF("doc_id", "text", "quality")
    val kept = graft.functions.Dedup.dedupNearDuplicatesBy(docs, "doc_id",
        "text", "quality", threshold = 0.5, shingleSize = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // cluster A keeps 2 (quality 5, smaller id than tied 3); exact-dup
    // cluster keeps 20 (tie on quality -> smaller id); singleton 10 stays
    assert(kept == Set(2L, 10L, 20L), kept.toString)
  }

  test("persisted minhash index probes bit-identically to the direct " +
    "bipartite join; non-index paths refuse") {
    val base = "spark catalyst tungsten shuffle partition broadcast join agg filter scan"
    val ref = Seq(
      (100L, base),
      (101L, "reference doc about cooking pasta tomatoes basil herbs and olive oil"),
      (102L, "sailing boats wind sea waves harbor anchor deck sail mast")
    ).toDF("doc_id", "text")
    val newBatch = Seq(
      (1L, base),
      (2L, base + " extra"),
      (3L, "entirely new content about mountain hiking trails and snow")
    ).toDF("doc_id", "text")
    val direct = Dedup.minhashCandidatesAgainst(newBatch, ref, "doc_id",
        "text", shingleSize = 2, numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val path = java.nio.file.Files.createTempDirectory("mhidx").toString + "/idx"
    Dedup.writeMinhashIndex(ref, "doc_id", "text", path,
      shingleSize = 2, numHashes = 64, bands = 16)
    val probed = Dedup.minhashCandidatesAgainstIndex(newBatch, path,
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(probed == direct, s"index path diverged: $probed vs $direct")
    // index layout on disk: sigs + band-partitioned bands + params marker
    assert(new java.io.File(s"$path/sigs").isDirectory)
    assert(new java.io.File(s"$path/bands").listFiles
      .exists(_.getName.startsWith("band=")))
    // probing something that is not an index refuses loudly
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashCandidatesAgainstIndex(newBatch,
        s"$path/sigs", "doc_id", "text")
    }
    assert(e.getMessage.contains("_params.json"))

    // negative seeds round-trip through _params.json (the param regex
    // must accept a sign — a valid index must never be unprobeable)
    val path2 = java.nio.file.Files.createTempDirectory("mhidx").toString + "/i2"
    Dedup.writeMinhashIndex(ref, "doc_id", "text", path2,
      shingleSize = 2, numHashes = 16, bands = 4, seed = -7)
    assert(Dedup.minhashCandidatesAgainstIndex(newBatch, path2,
      "doc_id", "text").count() >= 0)

    // REBUILD over an existing index: the old success marker must not
    // survive into the new build (a crash mid-rebuild would leave it
    // presiding over mixed data); after a completed rebuild the marker
    // carries the NEW parameters and probes reflect them.
    Dedup.writeMinhashIndex(ref, "doc_id", "text", path2,
      shingleSize = 2, numHashes = 64, bands = 16, seed = 42)
    val marker = scala.io.Source.fromFile(s"$path2/_params.json").mkString
    assert(marker.contains("\"numHashes\":64") && marker.contains("\"seed\":42"),
      s"stale marker after rebuild: $marker")
    val reprobed = Dedup.minhashCandidatesAgainstIndex(newBatch, path2,
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(reprobed == direct, "rebuilt index diverged from direct path")

    // layout 2 on disk: the bands table carries 16-byte keys, not arrays
    val bandsSchema = spark.read.parquet(s"$path/bands").schema
    assert(bandsSchema.fieldNames.contains("k") &&
      !bandsSchema.fieldNames.contains("sig"),
      s"expected keyed bands layout, got ${bandsSchema.treeString}")

    // a PRE-layout-2 index (bands/ carrying the sig array, params without
    // "layout") keeps probing bit-identically through the legacy branch
    val legacy = java.nio.file.Files.createTempDirectory("mhidx").toString + "/old"
    val sigCol = graft.functions.expressions.MinHashExpression
      .minhashTokens(graft.functions.Text.tokens(col("text")), 2, 64, 42L)
    val legacySig = ref.select(col("doc_id").as("id"), sigCol.as("sig"))
    legacySig.write.parquet(s"$legacy/sigs")
    legacySig.select(col("sig")).distinct()
      .select(col("sig"),
        posexplode(Dedup.lshBandKeys(col("sig"), 16, 4))
          .as(Seq("band", "bucket")))
      .write.partitionBy("band").parquet(s"$legacy/bands")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(legacy, "_params.json"),
      """{"shingleSize":2,"numHashes":64,"bands":16,"seed":42}"""
        .getBytes("UTF-8"))
    val legacyProbed = Dedup.minhashCandidatesAgainstIndex(newBatch, legacy,
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(legacyProbed == direct, "legacy index layout diverged")
  }
}
