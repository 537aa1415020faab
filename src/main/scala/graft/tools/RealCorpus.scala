package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-11 realistic-corpus generator (VERDICT r10 item 8): the scale
  * rehearsals' replica-shared-tail corpora keep dup/contamination RATES
  * honest but give every base document `mult` near-dup twins — the
  * near-dup family graph is quadratic in the multiplier BY CONSTRUCTION
  * (at 100×: 5000 families × C(100,2) pairs), so the 100× capstone ends
  * up measuring the synthetic corpus, not the engine. This corpus keeps
  * the dup structure scale-INVARIANT, the shape a real crawl has:
  *
  *  - documents come in groups of 20: one parent, three near-dup
  *    variants (small distinct tails), one exact duplicate, fifteen
  *    unique docs → 20% near-dup / 5% exact-dup rate at EVERY scale,
  *    family size bounded at 5;
  *  - vocabulary grows with corpus size (√mult), so shingle/minhash
  *    distributions do not degenerate as the corpus grows;
  *  - ~2% of groups embed a benchmark document's text (contamination
  *    for the decontaminate leg), rate again scale-invariant;
  *  - text is deterministic per doc id (splitmix64) — same corpus on
  *    every run, memoized as parquet.
  *
  * Generation is one distributed mapPartitions over spark.range — no
  * driver-side text. */
object RealCorpus {

  /** splitmix64 stream — deterministic per seed, no java.util.Random. */
  private def mix(seed0: Long): () => Long = {
    var s = seed0
    () => {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  private val stopWords =
    Array("the", "of", "and", "to", "in", "a", "is", "for", "with", "on")

  /** ~80-200 words in 8-14-word sentences; ~30% stopwords at RANDOM
    * positions (a fixed every-k-th pattern would align shingle structure
    * across documents and inflate random-pair Jaccard — banded LSH
    * false-positive candidates scale as n²·E[J⁴], so the corpus, not the
    * engine, would go quadratic); content words zipf-ish (u² over the
    * vocabulary) so common words repeat the way crawl text does, with a
    * vocabulary floor large enough that a shared content TRIGRAM between
    * unrelated docs is a rarity, as in a real crawl. */
  private def body(seed: Long, vocab: Int): String = {
    val rng = mix(seed * 1315423911L + 7L)
    val len = 80 + math.floorMod(rng(), 120L).toInt
    val sb = new java.lang.StringBuilder(len * 7)
    var sentLen = 8 + math.floorMod(rng(), 7L).toInt
    var inSent = 0
    var i = 0
    while (i < len) {
      val w =
        if (math.floorMod(rng(), 10L) < 3)
          stopWords(math.floorMod(rng(), stopWords.length.toLong).toInt)
        else {
          val u = (rng() >>> 11).toDouble / (1L << 53).toDouble
          "w" + java.lang.Long.toString((u * u * (vocab - 1)).toLong, 36)
        }
      if (inSent == 0 && w.nonEmpty)
        sb.append(Character.toUpperCase(w.charAt(0))).append(w.substring(1))
      else sb.append(w)
      inSent += 1
      i += 1
      if (i < len) {
        if (inSent >= sentLen) {
          sb.append(". ")
          inSent = 0
          sentLen = 8 + math.floorMod(rng(), 7L).toInt
        } else sb.append(' ')
      }
    }
    sb.append('.').toString
  }

  /** Group-of-20 layout: offset 0 parent, 1-3 near-dup variants (distinct
    * ~5-word tails on a 80-200-word body → Jaccard ≫ near-dup threshold),
    * 4 exact duplicate, 5 contaminated in ~2% of groups, rest unique. */
  private def textFor(id: Long, vocab: Int, bench: Array[String]): String = {
    val g = id / 20
    val o = (id % 20).toInt
    val parentSeed = g * 20
    o match {
      case 0 => body(parentSeed, vocab)
      case k if k <= 3 =>
        val rng = mix(id * 2654435761L + 3L)
        val tail = (0 until 4).map(_ =>
          "v" + java.lang.Long.toString(math.floorMod(rng(), 46656L), 36))
          .mkString(" ")
        body(parentSeed, vocab) + s" variant$k $tail"
      case 4 => body(parentSeed, vocab)
      case 5 if g % 50 == 7 =>
        body(id, vocab) + " " + bench((g % bench.length).toInt)
      case _ => body(id, vocab)
    }
  }

  private def langFor(id: Long): String =
    ((id / 20) % 10) match {
      case 6 | 7 => "de"
      case 8     => "fr"
      case 9     => "ja"
      case _     => "en"
    }

  /** Generate (or reuse the memoized) corpus of `mult` × 5000 documents at
    * /tmp/graft_realcorpus_<mult>; returns the parquet path. `benchDocs`
    * are the benchmark texts some documents embed (contamination). */
  def generate(spark: SparkSession, mult: Int,
               benchDocs: Array[String]): String = {
    val path = s"/tmp/graft_realcorpus_v2_$mult/documents.parquet"
    if (java.nio.file.Files.exists(
        java.nio.file.Paths.get(path, "_SUCCESS"))) return path
    val n = mult * 5000L
    val vocab = math.max(50000, (50000 * math.sqrt(mult.toDouble)).toInt)
    val benchB = spark.sparkContext.broadcast(benchDocs)
    import spark.implicits._
    spark.range(n).repartition(32).as[Long]
      .mapPartitions { it =>
        val bench = benchB.value
        it.map(id => (id, textFor(id, vocab, bench), langFor(id)))
      }
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(path)
    path
  }
}
