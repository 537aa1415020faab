package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Windowing

/** Distributed per-group ranking (globalRowNumber / globalNtile). */
class WindowingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (group, value, id): skewed group sizes (g0 dominates), duplicate values
  // within groups so the id tie-break matters, sparse ids.
  private val rows: Seq[(String, Long, Long)] =
    (0L until 400L).map(i => ("g" + (if (i % 10 < 7) 0 else i % 10),
      (i * 13) % 23, i * 3 + 1))

  private def reference: Map[Long, Long] =
    rows.groupBy(_._1).iterator.flatMap { case (_, rs) =>
      rs.sortBy(r => (r._2, r._3)).zipWithIndex
        .map { case (r, i) => r._3 -> (i + 1L) }
    }.toMap

  private def referenceNtile(k: Int): Map[Long, Int] =
    rows.groupBy(_._1).iterator.flatMap { case (_, rs) =>
      val n = rs.length
      val base = n / k; val rem = n % k
      val sizes = (0 until k).map(b => if (b < rem) base + 1 else base)
      val buckets = sizes.zipWithIndex.flatMap { case (sz, b) => Seq.fill(sz)(b + 1) }
      rs.sortBy(r => (r._2, r._3)).map(_._3).zip(buckets)
    }.toMap

  test("globalRowNumber matches the sequential row_number reference") {
    val df = rows.toDF("g", "v", "id").repartition(7)
    val got = Windowing.globalRowNumber(df, Seq("g"), Seq("v", "id"))
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(got == reference)
  }

  test("globalRowNumber is partitioning- and numPartitions-independent") {
    val expected = reference
    for (parts <- Seq(1, 13); np <- Seq(2, 32)) {
      val got = Windowing.globalRowNumber(
          rows.toDF("g", "v", "id").repartition(parts),
          Seq("g"), Seq("v", "id"), numPartitions = np)
        .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
      assert(got == expected, s"parts=$parts np=$np diverged")
    }
  }

  test("globalNtile matches SQL NTILE semantics incl. uneven remainders") {
    for (k <- Seq(1, 3, 7)) {
      val got = Windowing.globalNtile(
          rows.toDF("g", "v", "id").repartition(5),
          Seq("g"), Seq("v", "id"), k)
        .collect().map(r => r.getLong(2) -> r.getInt(3)).toMap
      assert(got == referenceNtile(k), s"k=$k diverged")
    }
  }

  test("globalNtile with more buckets than rows gives each row its own bucket") {
    val tiny = Seq(("a", 1L, 10L), ("a", 2L, 11L), ("b", 5L, 12L))
    val got = Windowing.globalNtile(tiny.toDF("g", "v", "id"),
        Seq("g"), Seq("v", "id"), k = 5)
      .collect().map(r => r.getLong(2) -> r.getInt(3)).toMap
    assert(got == Map(10L -> 1, 11L -> 2, 12L -> 1))
  }

  test("globalQuantiles picks nearest-rank order statistics per group") {
    val data = (1L to 10L).map(i => ("a", i * 10, i)) ++
      (1L to 4L).map(i => ("b", i * 100, 100 + i))
    val got = graft.functions.Windowing.globalQuantiles(
        data.toDF("g", "v", "id").repartition(5),
        Seq("g"), Seq("v", "id"), pcts = Seq(25, 50, 75, 100))
      .collect().map(r => (r.getString(0), r.getInt(4)) -> r.getLong(1)).toMap
    // group a (n=10): ceil(2.5)=3 -> 30, ceil(5)=5 -> 50, ceil(7.5)=8 -> 80, 10 -> 100
    assert(got == Map(
      ("a", 25) -> 30L, ("a", 50) -> 50L, ("a", 75) -> 80L, ("a", 100) -> 100L,
      // group b (n=4): ranks 1, 2, 3, 4
      ("b", 25) -> 100L, ("b", 50) -> 200L, ("b", 75) -> 300L, ("b", 100) -> 400L))
  }

  test("plan: one range shuffle of the data, no data-side window, broadcast reassembly") {
    val df = rows.toDF("g", "v", "id").repartition(7)
    val plan = Windowing.globalRowNumber(df, Seq("g"), Seq("v", "id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), s"no range exchange:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"offsets not broadcast:\n$plan")
    // the only Window must run over the metadata-sized slice table (its
    // child contains the partial aggregate), never over the ranged data
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty && windowLines.forall(_.contains("__c")),
      s"window not confined to slice stats:\n$plan")
  }

  test("globalRowNumberAndCount returns rank AND group size from one pass") {
    val df = rows.toDF("g", "v", "id").repartition(7)
    val got = Windowing.globalRowNumberAndCount(df, Seq("g"), Seq("v", "id"),
      rnCol = "rn", cntCol = "gn")
    val byId = got.collect().map(r =>
      r.getAs[Long]("id") -> (r.getAs[Long]("rn"), r.getAs[Long]("gn"))).toMap
    got.unpersist()
    val sizes = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ref = reference
    rows.foreach { case (g, _, id) =>
      assert(byId(id) == (ref(id), sizes(g)), s"id=$id")
    }
  }

  test("paretoFront2D equals brute-force domination incl. duplicates") {
    val rnd = new scala.util.Random(31)
    val pts = (0L until 300L).map(i =>
      (i, (rnd.nextInt(40)).toLong, (rnd.nextInt(40)).toLong)) ++
      Seq((900L, 39L, 39L), (901L, 39L, 39L)) // duplicate frontier points
    val df = pts.toDF("id", "x", "y").repartition(6)
    val got = Windowing.paretoFront2D(df, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    val want = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.map(_._1).toSet
    assert(got == want)
    // both duplicate maxima survive (mutual non-domination)
    assert(got.contains(900L) && got.contains(901L))
  }

  test("globalLag matches SQL LAG semantics at offsets 1 and 2") {
    val df = rows.toDF("g", "v", "id").repartition(6)
    for (off <- Seq(1, 2)) {
      val got = Windowing.globalLag(df, Seq("g"), Seq("v", "id"),
        Seq("v", "id"), offset = off)
      val byId = got.collect().map { r =>
        val lv = if (r.isNullAt(r.fieldIndex("lag_v"))) None
          else Some(r.getAs[Long]("lag_v"))
        r.getAs[Long]("id") -> lv
      }.toMap
      got.unpersist()
      val expected = rows.groupBy(_._1).iterator.flatMap { case (_, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._3))
        sorted.zipWithIndex.map { case (r, i) =>
          r._3 -> (if (i >= off) Some(sorted(i - off)._2) else None)
        }
      }.toMap
      assert(byId == expected, s"offset=$off")
    }
  }

  test("globalRankDist matches sequential rank/dense/percent/cume semantics") {
    val df = rows.toDF("g", "v", "id").repartition(7)
    val got = Windowing.globalRankDist(df, Seq("g"), Seq("v"), Seq("id"))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("rank"), r.getAs[Long]("dense_rank"),
          r.getAs[Double]("percent_rank"), r.getAs[Double]("cume_dist"))))
      .toMap
    val ref = rows.groupBy(_._1).iterator.flatMap { case (_, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      val n = sorted.length
      val byVal = sorted.zipWithIndex.groupBy(_._1._2)
      val distinctVals = sorted.map(_._2).distinct.sorted.zipWithIndex.toMap
      sorted.zipWithIndex.map { case (r, _) =>
        val grp = byVal(r._2)
        val rank = grp.map(_._2).min + 1L
        val cume = (grp.map(_._2).max + 1).toDouble / n
        val pr = if (n > 1) (rank - 1).toDouble / (n - 1) else 0.0
        r._3 -> ((rank, distinctVals(r._2) + 1L, pr, cume))
      }
    }.toMap
    assert(got == ref)
  }

  test("globalRankDist is partitioning-independent") {
    val df = rows.toDF("g", "v", "id")
    val a = Windowing.globalRankDist(df.repartition(1), Seq("g"), Seq("v"), Seq("id"))
      .orderBy("id").collect().toSeq
    val b = Windowing.globalRankDist(df.repartition(13, col("id")), Seq("g"),
        Seq("v"), Seq("id"), numPartitions = 5)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
