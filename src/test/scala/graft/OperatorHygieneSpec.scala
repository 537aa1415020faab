package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Decontamination, Dedup}

/** Operator cache hygiene: operators with internal persist barriers must not
  * strand storage blocks in a long-lived session (the 100 TB deployment
  * model — round-2 bench showed leaked persists inflating unrelated queries
  * 10-14×). Contract: after an operator returns, the ONLY persisted thing is
  * its own (documented, eager) result; one `unpersist()` on the returned
  * frame leaves `sc.getPersistentRDDs` exactly as it was.
  */
class OperatorHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs: DataFrame = {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    (0 until 60).map { i =>
      val text = if (i % 3 == 0) base else s"$base doc $i variant ${i * 7} text"
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  /** Runs `op`, materializes + frees its result, and asserts zero net growth
    * of persisted RDDs (cache-manager entries AND checkpoint-backed blocks —
    * getPersistentRDDs sees both, so a localCheckpoint leak cannot hide). */
  private def assertHygienic(label: String)(op: => DataFrame): Unit = {
    spark.sharedState.cacheManager.clearCache()
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = op
    out.write.format("noop").mode("overwrite").save() // a real consumer action
    val during = sc.getPersistentRDDs.keySet -- before
    out.unpersist(blocking = true)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"$label leaked persisted RDDs $leaked (live during use: $during)")
  }

  test("repeatedNgramStats persists nothing at all") {
    val sc = spark.sparkContext
    spark.sharedState.cacheManager.clearCache()
    val before = sc.getPersistentRDDs.keySet
    Decontamination.repeatedNgramStats(docs, "doc_id", "text", n = 3)
      .write.format("noop").mode("overwrite").save()
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "repeatedNgramStats should be persist-free (single-consumer chain)")
  }

  test("minhashCandidates frees its signature barriers") {
    assertHygienic("minhashCandidates") {
      Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleSize = 2, numHashes = 16, bands = 4)
    }
  }

  test("simhashCandidates frees signature + distinct-signature barriers") {
    assertHygienic("simhashCandidates") {
      Dedup.simhashCandidates(docs, "doc_id", "text", maxHamming = 4)
    }
  }

  test("simhashCandidatesFromSigs leaves the caller's sigs frame alone") {
    spark.sharedState.cacheManager.clearCache()
    val sigs = Seq((1L, 0L), (2L, 1L), (3L, 255L), (4L, 0L))
      .toDF("id", "sig")
      .persist()
    sigs.count()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = Dedup.simhashCandidatesFromSigs(sigs, maxHamming = 2)
    out.collect()
    out.unpersist(blocking = true)
    // net growth zero AND the caller's cache must still be alive
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
    assert(spark.sparkContext.getPersistentRDDs.keySet.intersect(before) == before,
      "caller-owned sigs cache was freed by the operator")
    sigs.unpersist(blocking = true)
  }

  test("connectedComponents frees edges, generations and checkpoint blocks") {
    // long chain → multiple iterations AND at least one localCheckpoint round
    val chain = (0 until 25).map(i => (i.toLong, i.toLong + 1)).toDF("idA", "idB")
    assertHygienic("connectedComponents") {
      Dedup.connectedComponents(chain, maxIter = 30)
    }
  }

  test("dedupNearDuplicates strands nothing after clearCache") {
    // contract: only the loser-id filter stays cached (documented), and it
    // is freeable by the cache manager — no zombie blocks beyond its reach
    val sc = spark.sparkContext
    spark.sharedState.cacheManager.clearCache()
    val before = sc.getPersistentRDDs.keySet
    Dedup.dedupNearDuplicates(docs, "doc_id", "text", threshold = 0.9,
        shingleSize = 2, numHashes = 16, bands = 4)
      .write.format("noop").mode("overwrite").save()
    spark.sharedState.cacheManager.clearCache()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"zombie RDDs beyond the cache manager: $leaked")
  }

  test("minhashCandidatesAgainst frees both corpus signature barriers") {
    assertHygienic("minhashCandidatesAgainst") {
      val newBatch = docs.filter(col("doc_id") < 20)
      val ref = docs.filter(col("doc_id") >= 20)
      Dedup.minhashCandidatesAgainst(newBatch, ref, "doc_id", "text",
        shingleSize = 2, numHashes = 16, bands = 4)
    }
  }

  test("winnowCandidates frees its fingerprint barrier") {
    assertHygienic("winnowCandidates") {
      Dedup.winnowCandidates(docs, "doc_id", "text",
        shingleSize = 3, window = 3)
    }
  }

  test("scoreBigram frees its unigram + bigram count barriers") {
    assertHygienic("scoreBigram") {
      graft.functions.UnigramLm.scoreBigram(docs, docs, "doc_id", "text")
    }
  }

  test("pageRank frees edges, degree, node and generation barriers") {
    assertHygienic("pageRank") {
      graft.functions.Graph.pageRank(
        docs.select(col("doc_id").as("src"), (col("doc_id") % 7).as("dst")),
        "src", "dst", iterations = 3)
    }
  }

  test("streamingUpsert frees every superseded snapshot generation") {
    assertHygienic("streamingUpsert") {
      val dir = java.nio.file.Files.createTempDirectory("hyg_upsert").toString
      docs.limit(5).withColumn("del", lit(false))
        .write.mode("overwrite").parquet(dir)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("del",
          org.apache.spark.sql.types.BooleanType)))
      graft.streaming.EventStreams.streamingUpsert(spark,
        spark.readStream.schema(schema).parquet(dir),
        docs, Seq("doc_id"), Some("del"))
    }
  }

  test("adamicAdar frees its edge and degree barriers") {
    import spark.implicits._
    val edges = (0 until 150)
      .map(i => ((i % 20).toLong, (i * 7 % 20).toLong)).toDF("src", "dst")
    assertHygienic("adamicAdar") {
      graft.functions.Graph.adamicAdar(edges, "src", "dst", k = 10)
    }
  }

  test("maintainAggregate frees its merge barrier") {
    import spark.implicits._
    val base = graft.operators.Merge.buildAggregate(
      (0L until 100L).map(i => (i, s"g${i % 5}", i / 10.0)).toDF("id", "g", "x"),
      Seq("g"), Seq("x"))
    val changes = Seq(("g1", 0.1, "I"), ("g2", 0.2, "I")).toDF("g", "x", "op")
    assertHygienic("maintainAggregate") {
      graft.operators.Merge.maintainAggregate(base, changes, Seq("g"), Seq("x"))
    }
  }

  test("globalLag inherits and frees the rank barrier") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (s"g${i % 3}", i % 17, i)).toDF("g", "v", "id")
    assertHygienic("globalLag") {
      graft.functions.Windowing.globalLag(df, Seq("g"), Seq("v", "id"), Seq("v"))
    }
  }

  test("interleaveSources frees both rank barriers") {
    val df = (0L until 200L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    assertHygienic("interleaveSources") {
      graft.functions.Mixing.interleaveSources(df, "id", "src",
        length(col("src")))
    }
  }

  test("dedupNearDuplicatesBy frees candidates, components and losers") {
    assertHygienic("dedupNearDuplicatesBy") {
      Dedup.dedupNearDuplicatesBy(
        docs.withColumn("q", col("doc_id") % 3), "doc_id", "text", "q",
        threshold = 0.5, shingleSize = 2, numHashes = 16, bands = 4)
    }
  }

  test("matchDistribution frees its rank barrier") {
    val df = (0L until 200L).map(i => (i, s"b${i % 3}")).toDF("id", "bkt")
    assertHygienic("matchDistribution") {
      graft.functions.Mixing.matchDistribution(df, "id", "bkt", lit(1))
    }
  }
}
