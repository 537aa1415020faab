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

  /** MinHash signature: for each of `numHashes` hash functions, the minimum
    * hash over the document's shingles. Array column of longs.
    *
    * The expensive string hash runs ONCE per shingle; the k-hash family is
    * derived by linear perturbation (h*a_k + b_k, a_k odd) of that base hash
    * — the standard universal-hash construction. This matters under
    * Catalyst's CollapseProject: a per-seed string hash would be inlined and
    * recomputed numHashes times per use site.
    *
    * NOTE: pass a *materialized column* (e.g. from a persisted projection)
    * as `baseHashes` when the signature feeds a self-join, or the base-hash
    * expression still inlines into every consumer.
    */
  def minhashFromHashes(baseHashes: Column, numHashes: Int, seed: Int = 42): Column =
    graft.functions.expressions.MinHashExpression
      .minhashArray(baseHashes, numHashes, seed.toLong)

  /** Base hashes of a shingle array (one xxhash64 per shingle). */
  def shingleHashes(shingles: Column, seed: Int = 42): Column =
    transform(shingles, s => xxhash64(s, lit(seed)))

  /** Convenience single-expression signature (fine for one-shot use; for
    * self-joins use the two-step materialized path in minhashCandidates). */
  def minhashSignature(shingles: Column, numHashes: Int, seed: Int = 42): Column =
    minhashFromHashes(shingleHashes(shingles, seed), numHashes, seed)

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
    // Fully-fused signature: tokens → k minima in one codegen'd expression
    // (no shingle strings, one hash per token). The persist is a barrier
    // against CollapseProject inlining the pipeline into both self-join
    // legs; cached signatures are ~8·numHashes bytes/doc — ~0.3% of corpus
    // size at 100 TB.
    val sig = df
      .select(col(idCol).as("id"),
        graft.functions.expressions.MinHashExpression
          .minhashTokens(Text.tokens(col(textCol)), shingleSize, numHashes, seed.toLong)
          .as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
    // Hash every token once, THEN aggregate over the hash array — the
    // aggregate lambda references its bound variable (cheap), whereas
    // hashing inside the 64-element array builder would recompute the
    // string hash 64 times per token after expression inlining.
    val hashes = transform(tokens, t => xxhash64(t, lit(seed)))
    val counts = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) =>
        array((0 until 64).map { i =>
          element_at(acc, i + 1) +
            when(shiftright(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L)
        }: _*))
    (0 until 64).map { i =>
      when(element_at(counts, i + 1) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash signatures computed the scale-friendly way: explode tokens →
    * hash once → groupBy(id) with 64 codegen'd ± sums (map-side partial
    * aggregation collapses each partition to one row per id before the
    * shuffle). ~10× faster than the per-row array-aggregate [[simhash64]]
    * because hash aggregates are whole-stage codegen'd while higher-order
    * array functions are interpreted. Returns (id, sig). */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        seed: Int = 42): DataFrame = {
    val exploded = df
      .select(col(idCol).as("id"), explode(Text.tokens(col(textCol))).as("tok"))
      .select(col("id"), xxhash64(col("tok"), lit(seed)).as("h"))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"b$i")
    }
    exploded.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until 64).map { i =>
          when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
        }.reduce((a, b) => a.bitwiseOR(b)).as("sig"))
  }

  /** SimHash near-dup candidates: block on `maxHamming + 1` bit-range
    * sub-keys — by pigeonhole, any pair within Hamming distance maxHamming
    * agrees on at least one block — then verify the exact distance. Fewer
    * blocks (lower maxHamming) = cheaper blocking join; recall is exact
    * within the stated radius either way. */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 3, seed: Int = 42): DataFrame = {
    val nBlocks = math.min(maxHamming + 1, 16)
    // block b covers bits [start, start+width); widths differ by ≤1
    val bounds = (0 to nBlocks).map(b => b * 64 / nBlocks)
    // persist: barrier against recomputing the signature in both join legs
    val sigs = simhashSignatures(df, idCol, textCol, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val blocked = sigs.select(col("id"), col("sig"),
      explode(array((0 until nBlocks).map { blk =>
        val start = bounds(blk); val width = bounds(blk + 1) - start
        val mask = if (width == 64) -1L else (1L << width) - 1
        struct(lit(blk).as("blk"),
          shiftright(col("sig"), start).bitwiseAND(mask).as("key"))
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

  /** Distributed connected components over a candidate-pair edge list by
    * iterative min-label propagation: each node repeatedly adopts the
    * smallest id reachable in one hop, converging in O(diameter) rounds.
    * Duplicate clusters have tiny diameters (near-dup graphs are dense
    * cliques), so a handful of joins suffices at any corpus size — the
    * driver never materializes the graph.
    *
    * Input: (idA, idB) pairs. Output: (id, component) with component = the
    * minimum id in each connected component.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val edges = pairs.select(col("idA").as("src"), col("idB").as("dst"))
      .union(pairs.select(col("idB").as("src"), col("idA").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("component", col("id"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // neighbor labels: for each edge (src,dst), dst's current component
      val nbr = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("component", "nbr_component"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("nbr_component")).as("min_nbr"))
      val updated = labels.join(nbr, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("min_nbr"), col("component")))
            .as("component"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val changed = updated.join(labels.withColumnRenamed("component", "old"), Seq("id"))
        .filter(col("component") =!= col("old")).limit(1).count()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** End-to-end near-duplicate removal: find MinHash-LSH candidates above
    * `threshold`, cluster them, and return the input minus every
    * non-canonical duplicate (the minimum id of each cluster survives —
    * deterministic, partition-independent). */
  def dedupNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                          threshold: Double = 0.8,
                          shingleSize: Int = 3, numHashes: Int = 64,
                          bands: Int = 16, seed: Int = 42): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, shingleSize, numHashes, bands, seed)
      .filter(col("jaccard_est") >= threshold)
    val comps = connectedComponents(cands.select(col("idA"), col("idB")))
    val losers = comps.filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
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
    // The idA<idB filter below fixes which doc plays each role, so the A
    // side must cover BOTH adjacent bands ({band-1, band, band+1}) — an
    // asymmetric {band, band+1} explode would miss pairs whose smaller-id
    // doc sits in the higher length band. distinct() dedups double joins.
    val bandsExpanded = withBand.select(col("id"), col("g"), col("len"),
      explode(array(col("band") - 1, col("band"), col("band") + 1)).as("jband"))
    val a = bandsExpanded.select(col("jband"), col("id").as("idA"), col("g").as("gA"))
    val b = withBand.select(col("band").as("jband"), col("id").as("idB"), col("g").as("gB"))
    a.join(b, Seq("jband"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"), Text.jaccard(col("gA"), col("gB")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .distinct()
  }
}
