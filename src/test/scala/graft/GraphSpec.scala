package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Graph

/** Integer-exact PageRank (functions.Graph). */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val scale = 1000000000000L

  /** Sequential mirror of Graph.pageRank's integer arithmetic. */
  private def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val m0 = scale / n
    val out = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> m0).toMap
    (1 to iters).foreach { _ =>
      val inflow = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      es.foreach { case (s, d) => inflow(d) += r(s) / out(s) }
      val dang = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map(v =>
        v -> (15L * m0 / 100L + 85L * (inflow(v) + dang / n) / 100L)).toMap
    }
    r
  }

  // a graph with a sink (4), a hub (1 <- 2,3,4-less), and a cycle
  private val edges: Seq[(Long, Long)] = Seq(
    (2L, 1L), (3L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (5L, 1L), (5L, 4L))

  test("pageRank matches the sequential integer reference (sinks included)") {
    val got = Graph.pageRank(edges.toDF("src", "dst").repartition(5),
        "src", "dst", iterations = 8)
    val gotMap = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.unpersist()
    assert(gotMap == ref(edges, 8))
    // sanity: mass differentiates — the well-linked node 1 beats node 5,
    // which nothing links to
    assert(gotMap(1L) > gotMap(5L))
  }

  test("pageRank is partitioning- and duplicate-edge-independent") {
    val expected = ref(edges, 5)
    for (parts <- Seq(1, 7)) {
      val df = (edges ++ edges.take(3)).toDF("src", "dst").repartition(parts)
      val got = Graph.pageRank(df, "src", "dst", iterations = 5)
      val gotMap = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got.unpersist()
      assert(gotMap == expected, s"parts=$parts diverged")
    }
  }

  test("pageRank conserves mass up to floor loss and frees internal caches") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
      iterations = 4)
    val total = got.collect().map(_.getLong(1)).sum
    val n = 5
    // each of the 4 iterations loses < n units to per-node floors plus the
    // dangling and edge-share floors (bounded by n + edges per round)
    assert(total <= scale && total > scale - 4L * (n + edges.size + 1) * 2,
      s"mass drifted: $total vs $scale")
    got.unpersist()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }
}
