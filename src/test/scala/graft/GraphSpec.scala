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

  // --- HITS ----------------------------------------------------------------

  private val hScale = 1000000L

  /** Sequential mirror of Graph.hits' integer L1-renormalized arithmetic. */
  private def hitsRef(edges: Seq[(Long, Long)],
                      iters: Int): Map[Long, (Long, Long)] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var h = nodes.map(_ -> hScale / nodes.size).toMap
    var a = Map.empty[Long, Long]
    def renorm(raw: Map[Long, Long]): Map[Long, Long] = {
      val t = math.max(raw.values.sum, 1L)
      nodes.map(v => v -> raw.getOrElse(v, 0L) * hScale / t).toMap
    }
    (1 to iters).foreach { _ =>
      val aRaw = es.groupBy(_._2).view.mapValues(_.map(e => h(e._1)).sum).toMap
      a = renorm(aRaw)
      val hRaw = es.groupBy(_._1).view.mapValues(_.map(e => a(e._2)).sum).toMap
      h = renorm(hRaw)
    }
    nodes.map(v => v -> (h(v), a(v))).toMap
  }

  /** Brute-force per-node triangle counts on an undirected edge set. */
  private def triRef(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct.toSet
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- i + 1 until nodes.size; k <- j + 1 until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if und((a, b)) && und((b, c)) && und((a, c))
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }

  test("triangleCounts matches brute force; direction/dup-edge independent") {
    val rng = new scala.util.Random(11)
    val edges = (0 until 120).map(_ =>
      (rng.nextInt(14).toLong, rng.nextInt(14).toLong))
    val want = triRef(edges)
    assert(want.nonEmpty, "test graph should contain triangles")
    // scrambled directions + duplicates must not change the counts
    val noisy = edges ++ edges.take(30).map(_.swap)
    val got = Graph.triangleCounts(
      noisy.toDF("src", "dst").repartition(5), "src", "dst")
    val gotMap = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.unpersist()
    assert(gotMap == want)
  }

  /** Sequential mirror of Graph.kCore's bounded peeling. */
  private def kCoreRef(edges: Seq[(Long, Long)], k: Int,
                       rounds: Int): Map[Long, Long] = {
    var und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    (1 to rounds).foreach { _ =>
      val deg = und.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= k).keySet
      und = und.filter { case (a, b) => keep(a) && keep(b) }
    }
    und.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  test("kCore peels to the sequential reference (clique survives, tail dies)") {
    // a 5-clique (deg 4 inside) plus a pendant chain that must peel away
    val clique = for (i <- 0L to 4L; j <- i + 1 to 4L) yield (i, j)
    val chain = Seq((4L, 10L), (10L, 11L), (11L, 12L))
    val edges = clique ++ chain
    val got = Graph.kCore(
      (edges ++ edges.take(3).map(_.swap)).toDF("src", "dst").repartition(3),
      "src", "dst", k = 3, rounds = 4)
    val gotMap = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.unpersist()
    assert(gotMap == kCoreRef(edges, 3, 4))
    assert(gotMap.keySet == Set(0L, 1L, 2L, 3L, 4L), s"got $gotMap")
    assert(gotMap.values.forall(_ == 4L))
  }

  /** Sequential mirror of Graph.labelPropagation (synchronous, ties to
    * the lower label). */
  private def lpRef(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    var lbl = adj.keys.map(v => v -> v).toMap
    (1 to iters).foreach { _ =>
      lbl = adj.map { case (v, ns) =>
        val counts = ns.groupBy(lbl).view.mapValues(_.size).toMap
        v -> counts.toSeq.maxBy { case (l, n) => (n, -l) }._1
      }
    }
    lbl
  }

  test("labelPropagation matches the sequential synchronous reference " +
    "and separates two cliques") {
    // two 4-cliques bridged by one edge
    val cl1 = for (i <- 0L to 3L; j <- i + 1 to 3L) yield (i, j)
    val cl2 = for (i <- 10L to 13L; j <- i + 1 to 13L) yield (i, j)
    val edges = cl1 ++ cl2 ++ Seq((3L, 10L))
    val got = Graph.labelPropagation(
      (edges ++ edges.take(4).map(_.swap)).toDF("src", "dst").repartition(3),
      "src", "dst", iterations = 4)
    val gotMap = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.unpersist()
    assert(gotMap == lpRef(edges, 4))
    // the cliques converge to distinct communities
    assert((0L to 3L).map(gotMap).toSet.size == 1)
    assert((11L to 13L).map(gotMap).toSet.size == 1)
    assert(gotMap(0L) != gotMap(13L))
  }

  /** Sequential mirror of Graph.personalizedPageRank's arithmetic. */
  private def pprRef(edges: Seq[(Long, Long)], seeds: Seq[Long],
                     iters: Int): Map[Long, Long] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val seedSet = seeds.toSet
    val k = seeds.size
    val m0 = scale / k
    val seedShare = 15L * scale / 100L / k
    val out = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(v => v -> (if (seedSet(v)) m0 else 0L)).toMap
    (1 to iters).foreach { _ =>
      val inflow = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      es.foreach { case (s, d) => inflow(d) += r(s) / out(s) }
      val dang = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map(v =>
        v -> ((if (seedSet(v)) seedShare else 0L) +
          85L * (inflow(v) + (if (seedSet(v)) dang / k else 0L)) / 100L)).toMap
    }
    r
  }

  test("personalized pageRank matches the sequential reference") {
    val seeds = Seq(2L, 5L)
    val got = Graph.personalizedPageRank(
      edges.toDF("src", "dst").repartition(4), "src", "dst", seeds,
      iterations = 6)
    val gotMap = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.unpersist()
    assert(gotMap == pprRef(edges, seeds, 6))
    // seed-proximity prior: node 1 (linked from seed 2) out-ranks node 4,
    // which only the seeds' far side reaches
    assert(gotMap(1L) > gotMap(4L))
  }

  test("personalized pageRank: absent seeds lose mass identically, " +
    "partitioning-independent") {
    val seeds = Seq(2L, 999L) // 999 not in the graph
    val expected = pprRef(edges, seeds, 4)
    for (parts <- Seq(1, 7)) {
      val got = Graph.personalizedPageRank(
        (edges ++ edges.take(2)).toDF("src", "dst").repartition(parts),
        "src", "dst", seeds, iterations = 4)
      val gotMap = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got.unpersist()
      assert(gotMap == expected, s"parts=$parts diverged")
    }
  }

  test("hits matches the sequential reference; hubs and authorities separate") {
    // 10 is a pure hub (links to 1,2,3); 1,2,3 are pure authorities;
    // 20 links only to 1 (weaker hub); 3 -> 4 makes 3 a slight hub too.
    val he: Seq[(Long, Long)] = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (3L, 4L))
    val got = Graph.hits(he.toDF("src", "dst").repartition(4), "src", "dst",
      iterations = 6)
    val gotMap = got.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    got.unpersist()
    assert(gotMap == hitsRef(he, 6),
      s"got $gotMap\nexpected ${hitsRef(he, 6)}")
    // the 3-link hub beats the 1-link hub; authorities beat it on auth
    assert(gotMap(10L)._1 > gotMap(20L)._1)
    assert(gotMap(1L)._2 > gotMap(3L)._2, "doubly-linked 1 out-ranks 3 on auth")
    assert(gotMap(10L)._2 == 0L, "nothing links to 10: auth must be 0")
  }

  test("hits is partitioning- and duplicate-edge-independent; no leaks") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val expected = hitsRef(edges, 4)
    for (parts <- Seq(1, 7)) {
      val got = Graph.hits(
        (edges ++ edges.take(3)).toDF("src", "dst").repartition(parts),
        "src", "dst", iterations = 4)
      val m = got.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      got.unpersist(blocking = true)
      assert(m == expected, s"parts=$parts")
    }
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }

  test("hits refuses overflow-risk massScale loudly") {
    val e = intercept[IllegalArgumentException] {
      Graph.hits(edges.toDF("src", "dst"), "src", "dst",
        massScale = 4000000000L)
    }
    assert(e.getMessage.contains("overflow"))
  }

  test("weightedPageRank at uniform weights equals plain pageRank; skewed " +
    "weights steer mass; guards fire; no leaks") {
    val sc = spark.sparkContext
    val cachedBefore = sc.getPersistentRDDs.keySet
    val wEdges = edges.map { case (s, d) => (s, d, 1L) }
    val uni = Graph.weightedPageRank(wEdges.toDF("src", "dst", "w"),
      "src", "dst", "w", iterations = 5)
    val uniMap = uni.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    uni.unpersist(blocking = true)
    assert(uniMap == ref(edges, 5))
    // node 2 sends weight 9 to node 1 vs 1 to node 3: rank(1) must rise
    // vs the uniform split
    val skew = edges.map { case (s, d) =>
      (s, d, if (s == 2L && d == 1L) 9L else 1L) }
    val sk = Graph.weightedPageRank(skew.toDF("src", "dst", "w"),
      "src", "dst", "w", iterations = 5)
    val skMap = sk.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sk.unpersist(blocking = true)
    assert(skMap(1L) > uniMap(1L))
    assert(skMap(3L) < uniMap(3L))
    intercept[IllegalArgumentException] {
      Graph.weightedPageRank(Seq((1L, 2L, 0L)).toDF("src", "dst", "w"),
        "src", "dst", "w")
    }
    intercept[IllegalArgumentException] {
      Graph.weightedPageRank(
        Seq((1L, 2L, Long.MaxValue / 100L)).toDF("src", "dst", "w"),
        "src", "dst", "w")
    }
    val leaked = sc.getPersistentRDDs.keySet -- cachedBefore
    assert(leaked.isEmpty, s"leaked: $leaked")
  }

  test("bfsDistances matches sequential BFS; seeds at 0, unreached absent, " +
    "no leaks") {
    val es: Seq[(Long, Long)] = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L),
      (10L, 11L), (2L, 4L), (99L, 1L)) // 99→1 unreachable FROM seeds
    val sc = spark.sparkContext
    val cachedBefore = sc.getPersistentRDDs.keySet
    val got = Graph.bfsDistances(es.toDF("src", "dst").repartition(4),
      "src", "dst", seeds = Seq(1L, 555L), rounds = 3)
    val gotMap = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.unpersist(blocking = true)
    // sequential reference: 3 rounds of relaxation from {1, 555}
    var ref = Map(1L -> 0L, 555L -> 0L)
    (1 to 3).foreach { _ =>
      val grown = es.flatMap { case (s, d) =>
        ref.get(s).map(dv => d -> (dv + 1L))
      }
      ref = (ref.toSeq ++ grown).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    assert(gotMap == ref)
    assert(gotMap(4L) == 2L) // via the 2->4 shortcut, not 1-2-3-4
    assert(!gotMap.contains(10L) && !gotMap.contains(99L))
    assert(gotMap(555L) == 0L) // seed absent from the graph still reports
    val leaked = sc.getPersistentRDDs.keySet -- cachedBefore
    assert(leaked.isEmpty, s"leaked: $leaked")
  }

  /** Sequential Adamic–Adar mirror: rounded 1/ln(deg) decimal-summed over
    * common neighbors with degree in [2, maxDeg], existing edges excluded,
    * (score desc, a, b) ranking. */
  private def aaRef(edges: Seq[(Long, Long)], k: Int, maxDeg: Int)
  : Seq[(Long, Long, Double, Long, Long)] = {
    val und = edges.map { case (s, d) => (math.min(s, d), math.max(s, d)) }
      .filter(e => e._1 != e._2).distinct
    val undSet = und.toSet
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val scores = scala.collection.mutable.Map
      .empty[(Long, Long), (BigDecimal, Long)]
    adj.foreach { case (z, ns) =>
      val d = ns.size
      if (d >= 2 && d <= maxDeg) {
        val w = BigDecimal(1.0 / math.log(d.toDouble))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        for (x <- ns; y <- ns if x < y) {
          val (s0, c0) = scores.getOrElse((x, y), (BigDecimal(0), 0L))
          scores((x, y)) = (s0 + w, c0 + 1)
        }
      }
    }
    scores.toSeq.collect {
      case ((a, b), (s, c)) if !undSet.contains((a, b)) =>
        (a, b, s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, c)
    }.sortBy { case (a, b, s, _) => (-s, a, b) }.take(k)
      .zipWithIndex.map { case ((a, b, s, c), i) => (a, b, s, c, i + 1L) }
  }

  test("adamicAdar matches the sequential reference; partitioning/dup-edge " +
    "independent") {
    // pseudo-random graph with shared-neighbor structure
    val es: Seq[(Long, Long)] =
      (0 until 120).map(i => ((i * 7 % 30).toLong, (i * 13 % 30).toLong))
    val expected = aaRef(es, 15, 10000)
    for (parts <- Seq(1, 7)) {
      val in = (es ++ es.take(40)).toDF("src", "dst").repartition(parts)
      val got = Graph.adamicAdar(in, "src", "dst", k = 15)
      val rows = got.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      got.unpersist()
      assert(rows.sortBy(_._5).toSeq == expected, s"parts=$parts")
    }
  }

  test("adamicAdar drops hub intermediates above maxDegree (loudly), and " +
    "scores change accordingly") {
    // star: hub 100 adjacent to 1..40; plus a few leaf-leaf edges so some
    // pairs survive the hub drop
    val star = (1L to 40L).map(i => (100L, i))
    val extra = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val es = star ++ extra
    val capped = Graph.adamicAdar(es.toDF("src", "dst"), "src", "dst",
      k = 50, maxDegree = 10)
    val cappedRows = capped.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    capped.unpersist()
    assert(cappedRows.sortBy(_._5).toSeq == aaRef(es, 50, 10))
    // with the hub kept, every leaf pair scores (780 pairs); capped, only
    // pairs sharing a low-degree neighbor remain
    val full = Graph.adamicAdar(es.toDF("src", "dst"), "src", "dst",
      k = 1000, maxDegree = 10000)
    val nFull = full.count()
    full.unpersist()
    assert(cappedRows.length < nFull)
    assert(cappedRows.nonEmpty)
    // no leaked caches
    assert(aaRef(es, 50, 10).nonEmpty)
  }
}
