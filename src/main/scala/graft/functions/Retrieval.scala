package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval over the documents table — the lexical-search
  * counterpart of the embedding ANN path (RAG pipelines use both: BM25 for
  * exact-term recall, vectors for semantic recall).
  *
  * Scoring is the Robertson/Spärck Jones BM25 in the Lucene form with the
  * +1-smoothed idf (always positive):
  *
  *   score(d, Q) = Σ_{t ∈ Q} ln(1 + (N − df_t + 0.5)/(df_t + 0.5))
  *                 · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * Determinism contract (DuckDB-oracle-checkable, same scheme as
  * [[UnigramLm]]): the idf and each per-(doc, term) contribution are
  * rounded to `logScale` decimals and the per-document sum runs EXACTLY in
  * DECIMAL(28,`logScale`) — order-, partitioning- and engine-independent;
  * ties in the final ranking break by doc id.
  *
  * Scale shape of [[bm25TopK]]: the corpus-statistics pass (N, avgdl) is
  * one partial-aggregated scan; postings are restricted MAP-SIDE to the
  * query terms (`token IN (…)` inside the explode projection), so only
  * matching (doc, term) rows ever shuffle — the full inverted index is
  * never materialized for a query. The per-term document frequencies
  * (≤ |Q| rows) broadcast back onto the postings. Nothing in the plan
  * grows with vocabulary size, and the only corpus-wide shuffle is the
  * (doc, term) aggregation over matching postings — at 100 TB that is
  * proportional to the query's posting lists, exactly what a dedicated
  * search engine shuffles. For repeated query workloads, [[writeInvertedIndex]]
  * persists postings clustered by token so future scans prune at the
  * row-group level instead of re-tokenizing the corpus.
  */
object Retrieval {

  /** The (token, doc_id, tf, dl) posting table of `df`'s whitespace tokens
    * — one row per distinct (token, doc), carrying the term frequency and
    * the document length needed by BM25's length normalization. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        Text.tokenCount(col(textCol)).cast("long").as("dl"),
        explode(Text.tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

  /** Persist the inverted index clustered by token: partitions are keyed by
    * a bounded token-hash prefix (so directory listing stays cheap at any
    * vocabulary size — the LSH-index layering argument) and rows inside
    * each file are sorted by token, so a query's `token IN (…)` predicate
    * skips row groups via min/max stats. */
  def writeInvertedIndex(df: DataFrame, idCol: String, textCol: String,
                         path: String, hashBuckets: Int = 64,
                         rowGroupBytes: Long = 8L * 1024 * 1024): Unit =
    invertedIndex(df, idCol, textCol)
      .withColumn("tokbucket", pmod(xxhash64(col("token")), lit(hashBuckets.toLong)))
      .repartition(col("tokbucket"))
      .sortWithinPartitions(col("token"), col("doc_id"))
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .partitionBy("tokbucket").parquet(path)

  /** BM25 top-k documents for a bag of query `terms`. See the object doc
    * for the formula, determinism contract, and scale shape. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], topK: Int,
               k1: Double = 1.2, b: Double = 0.75,
               logScale: Int = 6, outScale: Int = 4): DataFrame = {
    require(terms.nonEmpty, "bm25TopK: empty query")
    require(topK > 0, "bm25TopK: topK must be positive")

    val lens = df.select(col(idCol).as("doc_id"),
      Text.tokenCount(col(textCol)).cast("long").as("dl"))
    val st = lens.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot")).head()
    val n = st.getLong(0)
    require(n > 0, "bm25TopK: empty corpus")
    // one double division — reproduced bit-identically by the oracle
    val avgdl = st.getLong(1).toDouble / n

    // postings restricted map-side: only query-term rows survive the scan
    val postings = df.select(col(idCol).as("doc_id"),
        Text.tokenCount(col(textCol)).cast("long").as("dl"),
        explode(Text.tokens(col(textCol))).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

    // per-term document frequency (≤ |terms| rows) + rounded idf, broadcast
    val dfT = postings.groupBy(col("token"))
      .agg(count(lit(1)).as("dfreq"))
      .withColumn("idf",
        round(log((lit(n.toDouble) - col("dfreq") + lit(0.5)) /
          (col("dfreq") + lit(0.5)) + lit(1.0)), logScale))

    // contribution association mirrors the oracle SQL exactly:
    // (idf * (tf * (k1+1))) / (tf + k1 * ((1-b) + ((b * dl) / avgdl)))
    val contrib = round(
      col("idf") * (col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + (lit(b) * col("dl")) / lit(avgdl))),
      logScale).cast(s"decimal(28,$logScale)")

    postings.join(broadcast(dfT), Seq("token"))
      .select(col("doc_id"), contrib.as("__c"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("__c")).as("__s"))
      .select(col("doc_id"), col("n_terms"),
        round(col("__s").cast("double"), outScale).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Per-document characteristic terms: the `topK` tokens of each document
    * ranked by TF-IDF (tf · ln(N/df)) — keyword extraction / topic
    * labeling over a corpus.
    *
    * Determinism: idf is rounded after the log (the BM25 scheme) and cast
    * DECIMAL, the score tf·idf is an exact DECIMAL product, and ranking
    * breaks ties by (score desc, token asc) — a total order, so the
    * selected terms are engine-independent.
    *
    * Scale shape: tf is one (doc, token) aggregate; document frequencies
    * are a vocabulary-sized aggregate joined back on the token shuffle
    * (NOT broadcast — a 100 TB corpus's vocabulary is not driver-sized);
    * the per-doc ranking runs through [[Windowing.globalRowNumber]]'s
    * range-partitioned two-level scheme, so no document and no skewed
    * token group ever serializes onto a single window task. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    topK: Int, logScale: Int = 6): DataFrame = {
    require(topK > 0, "tfidfTopTerms: topK must be positive")
    val n = df.count()
    require(n > 0, "tfidfTopTerms: empty corpus")
    val tf = df.select(col(idCol).as("doc_id"),
        explode(Text.tokens(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("token")).agg(count(lit(1)).as("dfreq"))
    val scored = tf.join(dfT, Seq("token"))
      .withColumn("idf",
        round(log(lit(n.toDouble) / col("dfreq")), logScale)
          .cast(s"decimal(18,$logScale)"))
      .withColumn("score", (col("tf") * col("idf")).cast(s"decimal(28,$logScale)"))
      .withColumn("__neg", -col("score"))
    graft.functions.Windowing
      .globalRowNumber(scored, Seq("doc_id"), Seq("__neg", "token"), "rank")
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("token"),
        col("score").cast("double").as("score"), col("rank"))
  }

  /** Turn a scored list into a ranked one: top `topK` rows by
    * (`scoreCol` desc, `idCol` asc) with 1-based `rank`. The top-k is a
    * TakeOrderedAndProject (no global sort); the row_number window then
    * runs over k rows — metadata-sized by construction. */
  def rankByScore(df: DataFrame, idCol: String, scoreCol: String,
                  topK: Int): DataFrame = {
    require(topK > 0, "rankByScore: topK must be positive")
    val top = df.orderBy(col(scoreCol).desc, col(idCol).asc).limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009): fuse any
    * number of ranked lists by score(d) = Σ_lists 1 / (k0 + rank_list(d)).
    * The standard way to combine lexical (BM25) and dense (embedding)
    * retrieval without score calibration — only ranks matter.
    *
    * Determinism: each 1/(k0+rank) term is one correctly-rounded IEEE
    * division, rounded to 12 decimals and summed as DECIMAL — order- and
    * engine-independent for any number of lists. Ties break by id. The
    * inputs are ranked lists (k rows each), so everything here is
    * metadata-sized; the heavy lifting happened in the rankers. Returns
    * (id, rrf, n_lists) — `n_lists` = how many lists carried the doc. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, topK: Int,
              k0: Int = 60, outScale: Int = 6): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: no rankings")
    require(topK > 0 && k0 >= 0, s"rrfFuse: bad topK=$topK / k0=$k0")
    val contribs = rankings.map(_.select(col(idCol),
      round(lit(1.0) / (lit(k0.toLong) + col("rank")), 12)
        .cast("decimal(28,12)").as("__c")))
    contribs.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("__s"), count(lit(1)).as("n_lists"))
      .orderBy(col("__s").desc, col(idCol).asc)
      .limit(topK)
      .select(col(idCol), round(col("__s").cast("double"), outScale).as("rrf"),
        col("n_lists"))
  }

  /** Ranking-quality evaluation — the retrieval eval harness: score a
    * ranked list against a binary relevance set with the three standard
    * IR metrics in ONE metadata-sized pass.
    *
    *   precision@k_p  = |relevant ∩ top-k_p| / k_p
    *   MRR@k_n        = 1 / rank of the first relevant result WITHIN the
    *                    top k_n (0 if none lands there) — cutoff-bounded,
    *                    like every metric here: a first hit beyond k_n
    *                    scores 0 and is excluded from n_hits
    *   nDCG@k_n       = DCG@k_n / IDCG@k_n with the binary-gain DCG
    *                    Σ_{relevant i ≤ k_n} 1/log2(i+1), ideal = all
    *                    min(R, k_n) front slots relevant
    *
    * Determinism: each 1/log2(i+1) weight is rounded to 12 decimals and
    * DECIMAL-summed; precision/MRR/nDCG are each ONE IEEE division rounded
    * to 6 — engine-independent end to end. Scale shape: `ranked` is k rows
    * by construction; the only data-sized work is the id-keyed semi-join
    * against `relevant` and one count over it — everything downstream is
    * 1-row aggregates cross-joined (broadcast by size).
    *
    * `ranked` needs (idCol, rankCol 1-based); `relevant` needs idCol (any
    * other columns ignored; duplicates collapsed). Returns ONE row:
    * (n_ranked, n_relevant, n_hits, precision_at_k, mrr, ndcg). */
  def evalRanking(ranked: DataFrame, relevant: DataFrame, idCol: String,
                  rankCol: String, kPrecision: Int, kNdcg: Int): DataFrame = {
    require(kPrecision > 0 && kNdcg >= kPrecision,
      s"evalRanking: need 0 < kPrecision <= kNdcg, got $kPrecision/$kNdcg")
    val rel = relevant.select(col(idCol)).distinct()
    val relC = rel.agg(count(lit(1)).as("__r"))
    val nRanked = ranked.agg(count(lit(1)).as("n_ranked"))
    val hits = ranked.filter(col(rankCol) <= kNdcg)
      .join(rel, Seq(idCol))
    val w = round(lit(1.0) / log2(col(rankCol) + lit(1.0)), 12)
      .cast("decimal(28,12)")
    val hitAgg = hits.agg(
      count(lit(1)).as("n_hits"),
      sum(when(col(rankCol) <= kPrecision, 1L).otherwise(0L)).as("__hp"),
      min(col(rankCol)).as("__minr"),
      sum(w).as("__dcg"))
    // ideal DCG: the first min(R, kNdcg) slots all relevant; kNdcg is a
    // plan constant so the sequence explode is constant-sized
    val idcg = relC
      .select(col("__r"), explode(sequence(lit(1), lit(kNdcg))).as("__i"))
      .filter(col("__i") <= col("__r"))
      .agg(sum(round(lit(1.0) / log2(col("__i") + lit(1.0)), 12)
        .cast("decimal(28,12)")).as("__idcg"))
    nRanked.crossJoin(relC).crossJoin(hitAgg).crossJoin(idcg)
      .select(
        col("n_ranked"),
        col("__r").as("n_relevant"),
        col("n_hits"),
        round(col("__hp").cast("double") / lit(kPrecision.toDouble), 6)
          .as("precision_at_k"),
        coalesce(round(lit(1.0) / col("__minr").cast("double"), 6), lit(0.0))
          .as("mrr"),
        coalesce(round(col("__dcg").cast("double") /
          col("__idcg").cast("double"), 6), lit(0.0)).as("ndcg"))
  }
}
