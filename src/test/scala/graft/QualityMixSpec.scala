package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Mixing, Text}

/** Gopher quality rules, URL canonicalization and mixture rebalancing —
  * edge cases the synthetic corpus doesn't exercise (bulleted/ellipsized
  * lines, odd URLs, over/under-target groups). */
class QualityMixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gopher(text: String, minWords: Int = 3) =
    Seq(Tuple1(text)).toDF("t")
      .select(Text.gopherRules(col("t"), Seq("the", "a"), minWords = minWords).as("g"))
      .select("g.*").head()

  test("gopher rules: clean prose passes") {
    val r = gopher("the quick brown fox jumps over a lazy dog the end")
    assert(r.getAs[Boolean]("passes"), r.toString)
    assert(r.getAs[Long]("n_words") == 11)
    assert(r.getAs[Long]("n_stop") == 3)
  }

  test("gopher rules: symbol spam, bullet walls and ellipsis runs fail") {
    val symbols = gopher("the a ### fox ### dog ### cat ### bird ### cow ###")
    assert(!symbols.getAs[Boolean]("passes"), "symbol ratio should fail")
    assert(symbols.getAs[Double]("symbol_ratio") > 0.1)

    val bullets = gopher("- the point one\n- a point two\n- point three")
    assert(bullets.getAs[Double]("bullet_ratio") >= 0.9)
    assert(!bullets.getAs[Boolean]("passes"), "bullet wall should fail")

    val ellipses = gopher("the thing...\na thing...\nmore things here")
    assert(ellipses.getAs[Double]("ellipsis_ratio") > 0.3)
    assert(!ellipses.getAs[Boolean]("passes"), "ellipsis run should fail")

    val numeric = gopher("the 1 2 3 4 5 6 7 8 9 10 11 12 a")
    assert(numeric.getAs[Double]("alpha_frac") < 0.8)
    assert(!numeric.getAs[Boolean]("passes"), "non-alpha wall should fail")
  }

  test("gopher rules: word-count and mean-length windows") {
    assert(!gopher("the a fox", minWords = 10).getAs[Boolean]("passes"))
    val longWords = gopher("the a preposterousnesses incomprehensibilities " +
      "antidisestablishmentarianisms floccinaucinihilipilifications " +
      "pseudopseudohypoparathyroidisms supercalifragilisticexpialidocious")
    assert(longWords.getAs[Double]("mean_word_len") > 10.0)
    assert(!longWords.getAs[Boolean]("passes"))
  }

  private def canon(url: String): String =
    Seq(Tuple1(url)).toDF("u")
      .select(Text.canonicalizeUrl(col("u"))).head().getString(0)

  test("url canonicalization: tracking params, fragments, ports, case") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/b?utm_source=x&id=7&ref=tw#top")
      == "https://www.example.com/A/b?id=7")
    assert(canon("http://host.com:80/path/") == "http://host.com/path")
    // non-default port survives; path case survives
    assert(canon("http://Host.com:8080/Path") == "http://host.com:8080/Path")
    // all params tracking → no query at all
    assert(canon("https://h.co/p?utm_a=1&utm_b=2") == "https://h.co/p")
    // interior tracking param between kept ones
    assert(canon("https://h.co/p?a=1&gclid=xyz&b=2") == "https://h.co/p?a=1&b=2")
    // no scheme/host → unchanged except trims
    assert(canon("  not a url  ") == "not a url")
  }

  test("rebalance: over-target groups downsample, under-target keep all, deterministic") {
    val df = ((0 until 200).map(i => (i.toLong, "big")) ++
      (1000 until 1008).map(i => (i.toLong, "small"))).toDF("id", "grp")
    val kept = Mixing.rebalanceGroups(df, "id", "grp", targetPerGroup = 20)
    val report = Mixing.mixReport(df, kept, "grp").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(report("small") == ((8L, 8L)), "under-target group must keep all")
    val (bigBefore, bigAfter) = report("big")
    assert(bigBefore == 200L)
    assert(bigAfter > 5 && bigAfter < 40, s"~20 expected, got $bigAfter")
    // determinism + partition independence
    val again = Mixing.rebalanceGroups(df.repartition(13), "id", "grp", 20)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == kept.select("id").collect().map(_.getLong(0)).toSet)
    // kept rows are a sub-SET of input (no duplication, no mutation)
    assert(again.subsetOf(df.select("id").collect().map(_.getLong(0)).toSet))
  }

  test("temperature mix: kept shares go as sqrt(n), sequential-reference exact") {
    // groups 1600 : 400 : 100 → sqrt shares 4 : 2 : 1
    val df = ((0 until 1600).map(i => (i.toLong, "head")) ++
      (10000 until 10400).map(i => (i.toLong, "mid")) ++
      (20000 until 20100).map(i => (i.toLong, "tail"))).toDF("id", "grp")
    val kept = Mixing.temperatureRebalance(df, "id", "grp", totalBudget = 700)
    val byGrp = kept.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected ∝ 4:2:1 of 700 → 400/200/100 (hash-slice noise ~±20%)
    assert(byGrp("head") > 300 && byGrp("head") < 500, s"head=${byGrp("head")}")
    assert(byGrp("mid") > 140 && byGrp("mid") < 260, s"mid=${byGrp("mid")}")
    assert(byGrp("tail") > 60 && byGrp("tail") < 140, s"tail=${byGrp("tail")}")

    // sequential reference: recompute thresholds with exact integer sqrt
    def isqrt(x: BigInt): BigInt =
      if (x < 2) x else {
        var a = BigInt(math.sqrt(x.doubleValue).toLong)
        while (a * a > x) a -= 1
        while ((a + 1) * (a + 1) <= x) a += 1
        a
      }
    val ns = Map("head" -> 1600L, "mid" -> 400L, "tail" -> 100L)
    val ss = ns.map { case (g, n) => g -> isqrt(BigInt(n) * BigInt(10).pow(10)) }
    val sTot = ss.values.sum
    def bucket(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(5)
      java.lang.Long.parseLong(h, 16) % 10000
    }
    val expected = (ns.keys.flatMap { g =>
      val thr = (BigInt(700) * ss(g) * 10000 / (sTot * BigInt(ns(g)))).toLong
      val ids = g match {
        case "head" => 0L until 1600L
        case "mid" => 10000L until 10400L
        case "tail" => 20000L until 20100L
      }
      ids.filter(bucket(_) < thr).map((g, _))
    }).toSet
    val got = kept.select("grp", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")

    // partitioning independence
    val again = Mixing.temperatureRebalance(df.repartition(13), "id", "grp", 700)
      .select("grp", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == got)
  }

  test("matchDistribution: kept counts exactly proportional to shares, " +
    "maximal, deterministic; zero-share buckets dropped") {
    import org.apache.spark.sql.functions.{col, when}
    // buckets: a=50, b=35, c=90, d=10 rows; target a:2 b:1 c:5, d excluded
    val rows = (0L until 185L).map { i =>
      val b = if (i < 50) "a" else if (i < 85) "b" else if (i < 175) "c" else "d"
      (i, b)
    }
    val df = rows.toDF("id", "bkt")
    val share = when(col("bkt") === "a", 2).when(col("bkt") === "b", 1)
      .when(col("bkt") === "c", 5).otherwise(0)
    val kept = Mixing.matchDistribution(df.repartition(7), "id", "bkt", share)
    val counts = kept.groupBy("bkt").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // M = min(50/2, 35/1, 90/5) = 18 -> quotas a:36 b:18 c:90
    assert(counts == Map("a" -> 36L, "b" -> 18L, "c" -> 90L), counts.toString)
    // deterministic survivor SET, independent of partitioning
    val ids1 = kept.select("id").collect().map(_.getLong(0)).toSet
    kept.unpersist(blocking = true)
    val again = Mixing.matchDistribution(df.repartition(13), "id", "bkt", share)
    assert(again.select("id").collect().map(_.getLong(0)).toSet == ids1)
    again.unpersist(blocking = true)
  }

  test("matchDistribution refuses a share that varies within a bucket") {
    import org.apache.spark.sql.functions.{col, when}
    val df = (0L until 20L).map(i => (i, if (i < 10) "a" else "b"))
      .toDF("id", "bkt")
    // bucket 'a' carries two distinct shares (2 for even ids, 3 for odd)
    val bad = when(col("bkt") === "a",
      when(col("id") % 2 === 0, 2).otherwise(3)).otherwise(1)
    val e = intercept[IllegalArgumentException] {
      Mixing.matchDistribution(df, "id", "bkt", bad)
    }
    assert(e.getMessage.contains("constant per bucket"), e.getMessage)
  }

  test("matchDistribution probes the RAW share — pre-cast, pre-filter") {
    import org.apache.spark.sql.functions.{col, when}
    val df = (0L until 20L).map(i => (i, if (i < 10) "a" else "b"))
      .toDF("id", "bkt")
    // fractional disagreement 2.4 vs 2.9 — both cast to long 2, so a
    // post-cast probe would wave it through
    val frac = when(col("bkt") === "a",
      when(col("id") % 2 === 0, 2.4).otherwise(2.9)).otherwise(1.0)
    val e1 = intercept[IllegalArgumentException] {
      Mixing.matchDistribution(df, "id", "bkt", frac)
    }
    assert(e1.getMessage.contains("constant per bucket"), e1.getMessage)
    // share 2 mixed with share 0 in one bucket — the 0 rows vanish under
    // the __s > 0 filter, so a post-filter probe would wave it through
    val zeroMix = when(col("bkt") === "a",
      when(col("id") % 2 === 0, 2).otherwise(0)).otherwise(1)
    val e2 = intercept[IllegalArgumentException] {
      Mixing.matchDistribution(df, "id", "bkt", zeroMix)
    }
    assert(e2.getMessage.contains("constant per bucket"), e2.getMessage)
  }

  test("interleaveSources: smooth weighted merge matches the sequential " +
    "low-discrepancy reference; shares track weights") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // sources a (w=1), b (w=2), c (w=3); 60/120/180 rows so every source
    // runs the full epoch
    val rows = (0L until 360L).map { i =>
      val src = if (i < 60) "a" else if (i < 180) "b" else "c"
      (i, src)
    }
    val df = rows.toDF("id", "src")
    val w = when(col("src") === "a", 1).when(col("src") === "b", 2)
      .otherwise(3)
    val got = Mixing.interleaveSources(df.repartition(7), "id", "src", w)
    val order = got.select("src", "src_pos", "epoch_pos")
      .orderBy("epoch_pos").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // sequential mirror
    def h(id: Long): String = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val wm = Map("a" -> 1, "b" -> 2, "c" -> 3)
    val pos = rows.groupBy(_._2).flatMap { case (s, rs) =>
      rs.sortBy(r => (h(r._1), r._1)).zipWithIndex
        .map { case ((id, _), p) => (id, s, p + 1L) }
    }.toSeq
    val want = pos
      .sortBy { case (id, s, p) => ((2.0 * p - 1) / (2.0 * wm(s)), s, id) }
      .zipWithIndex.map { case ((_, s, p), i) => (s, p, i + 1L) }
    assert(order.toSeq == want)

    // share property: in any prefix, source counts track weights
    val prefix = order.take(120).map(_._1)
    val counts = prefix.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("b") - 2 * counts("a")) <= 2, counts.toString)
    assert(math.abs(counts("c") - 3 * counts("a")) <= 3, counts.toString)
    got.unpersist(blocking = true)

    // zero/negative weights refuse loudly instead of silently tailing
    // or reversing a source's stream
    val e = intercept[IllegalArgumentException] {
      Mixing.interleaveSources(df, "id", "src",
        when(col("src") === "a", 0).otherwise(1))
    }
    assert(e.getMessage.contains("strictly-positive"))
  }

  test("gumbelTopK: sequential reference exact, partitioning-independent, " +
    "weight-monotone in expectation") {
    val rows = (0L until 500L).map(i => (i, (i % 50).toDouble / 10.0))
    val df = rows.toDF("id", "w")
    val got = Mixing.gumbelTopK(df, "id", "w", k = 40, temperature = 0.5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))

    // sequential mirror of the exact chain
    def key(id: Long, w: Double): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 281474976710656.0
      val g = -math.log(-math.log(u))
      BigDecimal(w / 0.5 + g).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val want = rows.map { case (i, w) => (i, w, key(i, w)) }
      .sortBy { case (i, _, k2) => (-k2, i) }.take(40)
    assert(got.sortBy(t => (-t._3, t._1)).toSeq == want)

    // partitioning independence
    val again = Mixing.gumbelTopK(df.repartition(17), "id", "w", 40, 0.5)
      .collect().map(r => r.getLong(0)).toSet
    assert(again == got.map(_._1).toSet)

    // higher weights should dominate the sample: mean sampled weight well
    // above the population mean (Gumbel noise perturbs, weight/T drives)
    val meanSampled = got.map(_._2).sum / got.length
    val meanAll = rows.map(_._2).sum / rows.length
    assert(meanSampled > meanAll + 0.5, s"$meanSampled vs $meanAll")
  }
}
