package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Misra-Gries guarantee: frequency > n/k implies membership") {
    // 1000 rows: "hot" x 400, "warm" x 200, 400 distinct cold singletons
    val rows = Seq.fill(400)("hot") ++ Seq.fill(200)("warm") ++
      (0 until 400).map(i => s"cold_$i")
    val df = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .shuffle(rows).toDF("token").repartition(8)
    val m = df.agg(HeavyHitters.approxTopK(col("token"), 10).as("hh"))
      .head().getMap[String, Long](0)
    assert(m.contains("hot") && m.contains("warm")) // freq > n/k = 100
    // count lower bound within n/k of truth
    assert(m("hot") >= 400 - 100 && m("hot") <= 400)
    assert(m.size <= 10)
  }

  test("merge does not double-decrement the offered key") {
    // Offering (c=2) into a full buffer whose min is 1: dec=1, so the key
    // must survive at count 1. The old insert-then-decrement order dropped
    // it (inserted at 1, decremented to 0, pruned) — breaking the n/k bound
    // on every cross-partition merge.
    import scala.collection.mutable
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions.expressions.MisraGriesTopK
    val agg = MisraGriesTopK(Literal("x"), k = 2)
    val a = mutable.HashMap("a" -> 5L, "b" -> 1L)
    val merged = agg.merge(a, mutable.HashMap("c" -> 2L))
    assert(merged("a") == 4L)
    assert(merged("c") == 1L)
    assert(!merged.contains("b"))
  }

  test("heavy hitters over document tokens at corpus scale") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val tokens = docs.select(explode(split(trim(col("text")), "\\s+")).as("tok"))
    val n = tokens.count()
    val m = tokens.agg(HeavyHitters.approxTopK(col("tok"), 20).as("hh"))
      .head().getMap[String, Long](0)
    // exact counts for cross-check
    val exact = tokens.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mustHave = exact.filter { case (_, c) => c > n / 20 }.keySet
    assert(mustHave.subsetOf(m.keySet.toSet))
  }

  test("TopKPairs equals the window formulation and is partition-independent") {
    import graft.functions.expressions.TopKByKey
    val rnd = new scala.util.Random(11)
    val rows = (0 until 2000).map(i =>
      (s"g${i % 7}", rnd.nextInt(50).toDouble, i.toLong))
    val df = rows.toDF("g", "score", "id")
    def viaAgg(d: org.apache.spark.sql.DataFrame) = d
      .groupBy("g").agg(TopKByKey.topK(col("score"), col("id"), 5).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.score"), col("t.id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("g", "score", "id")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(viaAgg(df) == viaWindow)
    assert(viaAgg(df.repartition(17)) == viaWindow) // partitioning-independent
    // plan: partial (map-side) object-hash aggregation, no Window sort
    val plan = df.groupBy("g").agg(TopKByKey.topK(col("score"), col("id"), 5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_"),
      s"no map-side combine:\n$plan")
    assert(!plan.contains("Window"))
  }

  test("property: TopKBuffer equals sort-take under random inserts and merges") {
    import graft.functions.expressions.TopKBuffer
    val rnd = new scala.util.Random(99)
    for (trial <- 0 until 50) {
      val k = 1 + rnd.nextInt(8)
      val items = (0 until rnd.nextInt(200)).map(i =>
        (rnd.nextInt(20).toDouble, rnd.nextInt(1000).toLong))
      // split into random partial buffers, then merge — simulating map-side
      // combine across arbitrary partitionings
      val buffers = items.grouped(1 + rnd.nextInt(20)).map { chunk =>
        val b = new TopKBuffer(k)
        chunk.foreach { case (s, i) => b.offer(s, i) }
        b
      }.toSeq
      val merged = buffers.headOption.getOrElse(new TopKBuffer(k))
      buffers.drop(1).foreach(merged.mergeFrom)
      val got = merged.sortedBestFirst.toSeq
      // duplicate (score,id) pairs stay separate entries, exactly as the
      // aggregate would see separate input rows
      val expected = items.sortBy { case (s, i) => (-s, i) }.take(k)
      assert(got == expected, s"trial $trial k=$k")
    }
  }

  test("capacity above the vocabulary makes the sketch exact (q_token_topk contract)") {
    // q_token_topk's oracle requires EXACT counts, which Misra-Gries
    // guarantees iff the buffer never evicts — i.e. capacity ≥ distinct
    // tokens. Guard the corpus assumption and the exactness itself.
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val tokens = docs.select(explode(split(trim(col("text")), "\\s+")).as("tok"))
    val distinct = tokens.distinct().count()
    assert(distinct <= 64, s"documents vocabulary grew to $distinct > 64; " +
      "q_token_topk's exact-count oracle no longer holds")
    val m = tokens.agg(HeavyHitters.approxTopK(col("tok"), 64).as("hh"))
      .head().getMap[String, Long](0)
    val exact = tokens.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.size == exact.size)
    exact.foreach { case (tok, c) => assert(m(tok) == c) }
  }
}
