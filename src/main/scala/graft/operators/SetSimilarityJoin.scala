package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Dedup

/** Exact thresholded set-similarity self-join via prefix filtering
  * (AllPairs: Bayardo, Ma, Srikant, WWW 2007; prefix+length filters of
  * PPJoin: Xiao, Wang, Lin, Yu, WWW 2008): every pair of documents whose
  * token-set Jaccard similarity is ≥ `threshold`, with the EXACT
  * similarity — the precise counterpart to [[graft.functions.Dedup]]'s
  * probabilistic MinHash candidates (no false negatives by construction,
  * no signature tuning).
  *
  * Prefix principle: order every set by a global canonical token order
  * (ascending document frequency, ties by token — rarest first). For
  * Jaccard ≥ t, a pair must share ≥ ⌈t·|x|⌉ tokens, so by pigeonhole the
  * two prefixes of length |x| − ⌈t·|x|⌉ + 1 must intersect. Only prefix
  * tokens are exploded into the inverted index — the frequent tail of
  * every document (the bulk of its mass, and exactly the tokens with the
  * quadratic postings) never enters the join.
  *
  * Scale shape at 100 TB: document frequencies are one vocabulary-sized
  * aggregate; canonical per-doc sort is one shuffle by id; the index join
  * shuffles only prefix tokens (≈ (1−t)·total tokens, and those are the
  * RAREST tokens, so postings are short by construction); verification
  * joins are proportional to the pruned candidate set. No all-pairs stage
  * exists anywhere. Prefix-token buckets above `maxBucketSize` (possible
  * only when a corpus is dominated by near-identical template docs) are
  * REFUSED loudly, mirroring [[FuzzyJoin]]'s guard, rather than going
  * silently quadratic.
  *
  * Determinism: output (id_a < id_b, overlap, jac) where overlap and set
  * sizes are exact integers and jac = overlap/union is ONE IEEE division —
  * bit-identical cross-engine. Prefix length uses n − floor(t·n) + 1
  * (≥ the canonical n − ⌈t·n⌉ + 1 under any FP rounding of t·n) and the
  * length filter keeps a 1e-6 slack, so FP can only ADMIT spurious
  * candidates (removed by exact verification), never drop a true pair.
  *
  * EAGER (guard + materialization actions); internal barriers freed, the
  * caller owns one `unpersist()` of the result.
  */
object SetSimilarityJoin {

  /** All (id_a, id_b, overlap, jac) with id_a < id_b and
    * Jaccard(set(tokensA), set(tokensB)) ≥ threshold. `tokensCol` is an
    * array column; duplicates within a document are collapsed. */
  def jaccardPairs(df: DataFrame, idCol: String, tokensCol: String,
                   threshold: Double,
                   maxBucketSize: Long = 100000L): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaccardPairs: threshold must be in (0, 1], got $threshold")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    // Token arrays are kept LEXICOGRAPHICALLY SORTED so the verification
    // step can count overlap with a zero-allocation two-pointer merge
    // ([[graft.functions.expressions.SortedOverlap]]) instead of
    // size(array_intersect(...)), which allocates a hash set + an
    // intersection array per candidate pair — at bench shape ~1.9 M pairs.
    val docs = graft.functions.Spread(df.select(col(idCol), col(tokensCol)))
      .select(col(idCol).as("__id"),
        array_sort(array_distinct(col(tokensCol))).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .persist(lvl)

    // Canonical order: (document frequency asc, token asc) — rarest first.
    val tok = docs.select(col("__id"), explode(col("__toks")).as("__t"))
    val dfreq = tok.groupBy("__t").agg(count(lit(1)).as("__df"))
    val ordered = tok.join(dfreq, "__t")
      .groupBy("__id")
      .agg(array_sort(collect_list(struct(col("__df"), col("__t")))).as("__st"))
      .select(col("__id"),
        transform(col("__st"), s => s.getField("__t")).as("__ord"),
        size(col("__st")).as("__n"))

    // Robust prefix length (see determinism note above), clamped to n.
    val prefLen = least(
      col("__n") - floor(lit(threshold) * col("__n")).cast("int") + 1,
      col("__n"))
    val pref = ordered
      .select(col("__id"), col("__n"),
        posexplode(slice(col("__ord"), lit(1), prefLen)))
      .select(col("__id"), col("__n"), (col("pos") + 1).as("__p"),
        col("col").as("__t"))
      .persist(lvl)

    // refusal must not leak the persisted frames
    try {
      val hot = pref.groupBy("__t").agg(count(lit(1)).as("__c"))
        .filter(col("__c") > maxBucketSize).limit(1).collect()
      require(hot.isEmpty,
        s"jaccardPairs: prefix-token posting list for '${hot.headOption
          .map(_.getString(0)).getOrElse("")}' exceeds maxBucketSize=$maxBucketSize — " +
          "the corpus is dominated by near-identical template documents and the " +
          "index join would be quadratic; dedup exactly first or raise the cap " +
          "explicitly")
    } catch {
      case t: Throwable =>
        pref.unpersist(blocking = true)
        docs.unpersist(blocking = true)
        throw t
    }

    val a = pref.select(col("__t"), col("__id").as("id_a"),
      col("__n").as("n_a"), col("__p").as("p_a"))
    val b = pref.select(col("__t"), col("__id").as("id_b"),
      col("__n").as("n_b"), col("__p").as("p_b"))
    // PPJoin positional filter: for an occurrence at (p_a, p_b), total
    // overlap ≤ min(p_a−1, p_b−1) + 1 + min(n_a−p_a, n_b−p_b) — prune
    // occurrences that cannot reach the required overlap
    // α = ⌈t/(1+t)·(n_a+n_b)⌉ (1e-6 slack: FP can only ADMIT, never drop).
    val alpha = ceil(lit(threshold / (1.0 + threshold)) *
      (col("n_a") + col("n_b")) - lit(1e-6))
    val ubound = least(col("p_a") - 1, col("p_b") - 1) + 1 +
      least(col("n_a") - col("p_a"), col("n_b") - col("p_b"))
    val cands = a.join(b, Seq("__t"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("n_b") >= lit(threshold) * col("n_a") - lit(1e-6) &&
              col("n_a") >= lit(threshold) * col("n_b") - lit(1e-6))
      .filter(ubound >= alpha)
      .select("id_a", "id_b").distinct()

    val ta = docs.select(col("__id").as("id_a"), col("__toks").as("__ta"))
    val tb = docs.select(col("__id").as("id_b"), col("__toks").as("__tb"))
    val overlap = graft.functions.expressions.SortedOverlap
      .sortedOverlapCount(col("__ta"), col("__tb"))
    val union = col("__na") + col("__nb") - col("overlap")
    val result = cands
      .join(ta.withColumn("__na", size(col("__ta"))), Seq("id_a"))
      .join(tb.withColumn("__nb", size(col("__tb"))), Seq("id_b"))
      .withColumn("overlap", overlap)
      .withColumn("jac", col("overlap").cast("double") / union)
      .filter(col("jac") >= threshold)
      // long overlap: size() is int32, but every other count column in the
      // oracle contract is BIGINT — keep the hashed representation uniform
      .select(col("id_a"), col("id_b"),
        col("overlap").cast("long").as("overlap"), col("jac"))
    Dedup.materializeAndFree(result, docs, pref)
  }

  /** Exact thresholded set-CONTAINMENT join: all DIRECTED pairs
    * (id_a, id_b, overlap, containment) with
    * |set(A) ∩ set(B)| / |set(A)| ≥ threshold — "A is (mostly) inside B",
    * the quote/excerpt/subset detector that Jaccard misses (a 50-token
    * quote inside a 5000-token page has Jaccard ≈ 0.01 but containment 1).
    *
    * Asymmetric prefix principle: containment ≥ t needs overlap ≥ ⌈t·|A|⌉,
    * so A's prefix of |A| − ⌈t·|A|⌉ + 1 rarest tokens (canonical df-asc
    * order) must hit B — but B has NO size bound, so the PROBE side
    * explodes only prefixes while the BUILD side indexes every token.
    * Scale shape: the build shuffle is the full token stream keyed by
    * 8-byte-hashable tokens (the inverted index — what a containment join
    * fundamentally requires); probe volume is (1−t)·|A| rarest tokens;
    * hot build postings above `maxBucketSize` REFUSE loudly. The PPJoin
    * positional bound and the |B| ≥ t·|A| size filter prune candidates
    * before exact verification; FP slack can only ADMIT, never drop.
    *
    * Determinism: overlap and |A| are exact integers, containment one IEEE
    * division — bit-identical cross-engine. EAGER; caller owns one
    * `unpersist()`. */
  def containmentPairs(df: DataFrame, idCol: String, tokensCol: String,
                       threshold: Double,
                       maxBucketSize: Long = 100000L,
                       maxJoinRows: Long = 50000000L): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"containmentPairs: threshold must be in (0, 1], got $threshold")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    // sorted for the merge-count verification (see jaccardPairs)
    val docs = graft.functions.Spread(df.select(col(idCol), col(tokensCol)))
      .select(col(idCol).as("__id"),
        array_sort(array_distinct(col(tokensCol))).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .persist(lvl)
    val tok = docs.select(col("__id"), explode(col("__toks")).as("__t"))
    val dfreq = tok.groupBy("__t").agg(count(lit(1)).as("__df"))
    val ordered = tok.join(dfreq, "__t")
      .groupBy("__id")
      .agg(array_sort(collect_list(struct(col("__df"), col("__t")))).as("__st"))
      .select(col("__id"),
        transform(col("__st"), s => s.getField("__t")).as("__ord"),
        size(col("__st")).as("__n"))

    // build side: the full inverted index with canonical positions
    val full = ordered
      .select(col("__id"), col("__n"), posexplode(col("__ord")))
      .select(col("__id"), col("__n"), (col("pos") + 1).as("__p"),
        col("col").as("__t"))
      .persist(lvl)
    val fullCounts = full.groupBy("__t").agg(count(lit(1)).as("__c"))
      .persist(lvl)
    // refusal must not leak the persisted frames (both guards below)
    def freeOnRefusal[T](body: => T): T =
      try body catch {
        case t: Throwable =>
          fullCounts.unpersist(blocking = true)
          full.unpersist(blocking = true)
          docs.unpersist(blocking = true)
          throw t
      }
    freeOnRefusal {
      val hot = fullCounts.filter(col("__c") > maxBucketSize).limit(1).collect()
      require(hot.isEmpty,
        s"containmentPairs: posting list for '${hot.headOption
          .map(_.getString(0)).getOrElse("")}' exceeds maxBucketSize=$maxBucketSize — " +
          "drop corpus-wide stopwords/boilerplate tokens first or raise the " +
          "cap explicitly")
    }

    // probe side: A's prefix only (robust length, clamped)
    val prefLen = least(
      col("__n") - floor(lit(threshold) * col("__n")).cast("int") + 1,
      col("__n"))
    val pref = ordered
      .select(col("__id"), col("__n"),
        posexplode(slice(col("__ord"), lit(1), prefLen)))
      .select(col("__id").as("id_a"), col("__n").as("n_a"),
        (col("pos") + 1).as("p_a"), col("col").as("__t"))

    // Join-volume guard, estimated WITHOUT executing the join: Σ over
    // probe-prefix occurrences of the matching posting-list length. On a
    // corpus whose vocabulary is tiny relative to document count (e.g.
    // template/word-soup data) the TRUE containment output is itself
    // quadratic — found by the 1×/10× scale rehearsal, where a 30-token
    // vocabulary made 5k docs produce 12.7M genuinely-contained pairs —
    // and no filtering can shrink genuine output; refuse loudly instead
    // of grinding.
    freeOnRefusal {
      val est = pref.join(fullCounts, Seq("__t"))
        .agg(coalesce(sum(col("__c")), lit(0L))).head().getLong(0)
      require(est <= maxJoinRows,
        s"containmentPairs: estimated candidate join volume $est exceeds " +
          s"maxJoinRows=$maxJoinRows — the corpus's vocabulary is small " +
          "relative to its document count, so the genuine containment output " +
          "is near-quadratic. Raise the threshold, pre-block the corpus " +
          "(e.g. by near-dup cluster), or raise maxJoinRows explicitly")
    }
    fullCounts.unpersist(blocking = true)

    val alpha = ceil(lit(threshold) * col("n_a") - lit(1e-6))
    val ubound = least(col("p_a") - 1, col("p_b") - 1) + 1 +
      least(col("n_a") - col("p_a"), col("n_b") - col("p_b"))
    val cands = pref
      .join(full.select(col("__t"), col("__id").as("id_b"),
        col("__n").as("n_b"), col("__p").as("p_b")), Seq("__t"))
      .filter(col("id_a") =!= col("id_b"))
      .filter(col("n_b") >= lit(threshold) * col("n_a") - lit(1e-6))
      .filter(ubound >= alpha)
      .select("id_a", "id_b").distinct()

    val ta = docs.select(col("__id").as("id_a"), col("__toks").as("__ta"))
    val tb = docs.select(col("__id").as("id_b"), col("__toks").as("__tb"))
    val result = cands
      .join(ta.withColumn("n_a", size(col("__ta"))), Seq("id_a"))
      .join(tb, Seq("id_b"))
      .withColumn("overlap", graft.functions.expressions.SortedOverlap
        .sortedOverlapCount(col("__ta"), col("__tb")))
      .withColumn("containment", col("overlap").cast("double") / col("n_a"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("overlap"), col("containment"))
    Dedup.materializeAndFree(result, docs, full)
  }
}
