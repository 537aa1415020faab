package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for 100 TB-scale corpora.
  *
  * Strategy notes (scale-first):
  *  - Exact dedup is a hash-groupBy: one shuffle on the content hash, never
  *    on the content itself (hash first so the shuffle keys are 8-byte longs).
  *  - Near-dup methods (MinHash-LSH, SimHash, embedding-LSH) all follow the
  *    same shape: cheap per-row signature (narrow, codegen'd) → explode to
  *    (bucket, id) → self-join on bucket → verify candidate pairs with the
  *    exact metric. Only candidate pairs (tiny vs n²) are verified.
  *  - All signatures use seeded xxhash64: deterministic across runs and
  *    executors, no fitted model state.
  */
object Dedup {

  /** Exact dedup, keep-first-by-id: one row per distinct value of `keyCols`,
    * the survivor being the row with the minimum `idCol`. Deterministic
    * (unlike dropDuplicates, whose survivor is arbitrary) — at scale the
    * survivor must not depend on partitioning. */
  def exactDedup(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact dedup on a content hash — for wide content columns, shuffle the
    * 64-bit hash, not the content. Returns surviving ids. */
  def exactDedupIds(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.select(xxhash64(col(contentCol)).as("__h"), col(idCol))
      .groupBy("__h").agg(min(idCol).as(idCol))
      .select(idCol)

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum hash over the document's shingles. Array column of longs.
    * Codegen'd (transform + array_min over the shingle array). */
  def minhashSignature(shingles: Column, numHashes: Int, seed: Int = 42): Column =
    array((0 until numHashes).map { k =>
      array_min(transform(shingles, s => xxhash64(s, lit(seed + k))))
    }: _*)

  /** LSH band keys from a minhash signature: `bands` buckets, each hashing
    * `rowsPerBand = numHashes/bands` signature slots. Emits an array of
    * (band, bucketHash) structs ready to explode. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(array_join(
          transform(slice(signature, b * rowsPerBand + 1, rowsPerBand),
            x => x.cast("string")), ",")).as("bucket"))
    }: _*)

  /** MinHash+LSH candidate pairs: documents sharing ≥1 LSH band bucket.
    * Returns (idA, idB, jaccardEstimate) with idA < idB, where
    * jaccardEstimate is the fraction of matching minhash slots.
    *
    * Scale: the self-join is on (band, bucket) — high-cardinality keys, so
    * the shuffle is fine-grained; skewed buckets (boilerplate docs) can be
    * capped upstream by filtering bucket sizes.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 3, numHashes: Int = 64,
                        bands: Int = 16, seed: Int = 42): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = df.select(col(idCol).as("id"),
      minhashSignature(Text.shingles(col(textCol), shingleSize), numHashes, seed).as("sig"))
    val bucketed = sig.select(col("id"), col("sig"),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.bucket"))
    val a = bucketed.select(col("band"), col("bucket"),
      col("id").as("idA"), col("sig").as("sigA"))
    val b = bucketed.select(col("band"), col("bucket"),
      col("id").as("idB"), col("sig").as("sigB"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        (aggregate(zip_with(col("sigA"), col("sigB"),
            (x, y) => when(x === y, 1L).otherwise(0L)), lit(0L), (acc, v) => acc + v)
          .cast("double") / lit(numHashes)).as("jaccard_est"))
      .distinct()
  }

  /** SimHash-64 of a token array: bit i of the result is the sign of the sum
    * over tokens of (bit i of xxhash64(token) ? +1 : -1). Near-identical
    * documents land within small Hamming distance. Pure expressions:
    * aggregate over tokens with a 64-slot count vector. */
  def simhash64(tokens: Column, seed: Int = 42): Column = {
    val counts = aggregate(
      tokens,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t, lit(seed))
        array((0 until 64).map { i =>
          element_at(acc, i + 1) +
            when(shiftright(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L)
        }: _*)
      })
    (0 until 64).map { i =>
      when(element_at(counts, i + 1) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates: block on 4 × 16-bit sub-keys (any doc pair
    * with Hamming distance ≤ 3 shares at least one sub-key by pigeonhole
    * over 4 blocks), then verify exact Hamming distance ≤ maxHamming. */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 3, seed: Int = 42): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
      simhash64(Text.tokens(col(textCol)), seed).as("sig"))
    val blocked = sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map { blk =>
        struct(lit(blk).as("blk"),
          shiftright(col("sig"), blk * 16).bitwiseAND(0xFFFFL).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("sig"), col("bk.blk"), col("bk.key"))
    val a = blocked.select(col("blk"), col("key"), col("id").as("idA"), col("sig").as("sigA"))
    val b = blocked.select(col("blk"), col("key"), col("id").as("idB"), col("sig").as("sigB"))
    a.join(b, Seq("blk", "key"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"), hamming64(col("sigA"), col("sigB")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** N-gram Jaccard near-dup pairs within LSH-free small candidate sets:
    * exact pairwise Jaccard over char n-grams, pre-blocked by length band
    * (docs with very different lengths can't be near-dups). For corpora
    * where a full MinHash pass isn't warranted. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.8,
                        lengthBandPct: Double = 0.2): DataFrame = {
    val grams = df.select(col(idCol).as("id"), col(textCol).as("t"),
      Text.charNgrams(col(textCol), n).as("g"), length(col(textCol)).as("len"))
    val withBand = grams.withColumn("band",
      floor(log(1.0 + lengthBandPct, col("len").cast("double"))).cast("long"))
    val bandsExpanded = withBand.select(col("id"), col("g"), col("len"),
      explode(array(col("band"), col("band") + 1)).as("jband"))
    val a = bandsExpanded.select(col("jband"), col("id").as("idA"), col("g").as("gA"))
    val b = withBand.select(col("band").as("jband"), col("id").as("idB"), col("g").as("gB"))
    a.join(b, Seq("jband"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"), Text.jaccard(col("gA"), col("gB")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .distinct()
  }
}
