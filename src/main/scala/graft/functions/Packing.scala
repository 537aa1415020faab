package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch sequence preparation: pack variable-length documents into
  * fixed-token-capacity training sequences, and slice documents into
  * (optionally overlapping) token windows.
  *
  * Packing semantics are GPT-style "concatenate and slice": documents are
  * laid end-to-end in a deterministic order (`idCol` ascending) and the
  * token stream is cut every `capacity` tokens. A document belongs to the
  * sequence holding its FIRST token; a document straddling a cut (or longer
  * than `capacity`) spills into the following sequence(s), exactly as the
  * training dataloader would consume it. The whole mapping is a pure
  * function of (id order, token counts) — engine-, run- and
  * partitioning-independent, so it is DuckDB-oracle-checkable.
  *
  * Scale shape: the global exclusive prefix sum over document order is the
  * only coupling between documents, computed as a two-level scan — bucket
  * subtotals (one narrow aggregate), driver-side prefix over the tiny
  * bucket table, then a per-bucket window cumsum with the bucket offset
  * added. No global single-partition window anywhere: the widest window
  * runs over one id bucket (`bucketWidth` ids), and the driver sees one row
  * per bucket (~N/bucketWidth — at 100 TB and bucketWidth=1e6 that is
  * ~1e5 rows). This is the textbook distributed prefix-scan shape.
  */
object Packing {

  /** Integer `div` on non-negative longs: double division (Spark's `/`)
    * would lose precision past 2^53 — a 100 TB corpus is ~2.5e13 tokens
    * today and the id space is unconstrained, so stay exact. */
  private def intDiv(a: Column, b: Long): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      ColumnBridge.expression(a),
      ColumnBridge.expression(lit(b)))).cast("long")
  }

  /** Per-document packing assignment: (id, n_tokens, seq_id, seq_offset)
    * where `seq_id` = index of the capacity-token sequence holding the
    * document's first token and `seq_offset` = that token's position within
    * the sequence.
    *
    * `tokenCount` is any integral Column computed from the document row
    * (e.g. [[Text.tokenCount]] of the text column, or a physical token
    * count carried in the table).
    *
    * `bucketWidth` groups ids into prefix-scan buckets: ids in
    * [k·bucketWidth, (k+1)·bucketWidth) form bucket k. Ids need not be
    * dense — sparse buckets just carry fewer rows — but the id column must
    * be non-negative integral for the bucket arithmetic. */
  def packSequences(df: DataFrame, idCol: String, tokenCount: Column,
                    capacity: Long, bucketWidth: Long = 1000000L): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val d = df.select(col(idCol).cast("long").as("id"),
      tokenCount.cast("long").as("n_tokens"),
      intDiv(col(idCol).cast("long"), bucketWidth).as("__bucket"))

    // Level 1: one row per bucket; driver-side exclusive prefix over the
    // sorted bucket totals (tiny), re-joined as a broadcast offset table.
    val totals = d.groupBy("__bucket").agg(sum("n_tokens").as("__t"))
      .orderBy("__bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val offsets = totals.scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (b, t)) => (b, acc + t)
    }.tail.zip(totals).map { case ((b, inclusive), (_, t)) => (b, inclusive - t) }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = broadcast(offsets.toSeq.toDF("__bucket", "__offset"))

    // Level 2: window cumsum WITHIN each bucket + the bucket's offset =
    // global exclusive prefix sum (`start` = first-token position in the
    // concatenated stream).
    val w = Window.partitionBy("__bucket").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    d.join(offsetDf, Seq("__bucket"))
      .withColumn("__start",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)) + col("__offset"))
      .select(col("id").as(idCol), col("n_tokens"),
        intDiv(col("__start"), capacity).as("seq_id"),
        pmod(col("__start"), lit(capacity)).as("seq_offset"))
  }

  /** Per-sequence packing report over [[packSequences]]: (seq_id, n_docs,
    * n_tokens) where `n_docs`/`n_tokens` count the documents STARTING in
    * the sequence (concat-and-slice semantics: a straddler's tail tokens
    * belong to later sequences but the document is accounted where it
    * starts). Every interior sequence boundary is exactly `capacity` tokens
    * apart in the concatenated stream, so sum(n_tokens) telescopes to the
    * corpus total. */
  def packedStats(df: DataFrame, idCol: String, tokenCount: Column,
                  capacity: Long, bucketWidth: Long = 1000000L): DataFrame =
    packSequences(df, idCol, tokenCount, capacity, bucketWidth)
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))

  /** Slice each document's whitespace-token stream into windows of
    * `window` tokens every `stride` tokens (overlapping when
    * stride < window) — the context-preparation step for RAG chunking and
    * long-document eval. One output row per (doc, window): (id, chunk_idx,
    * start_tok, n_tok, chunk_text), with starts 0, stride, 2·stride, …
    * strictly below the document's token count and n_tok =
    * min(window, n − start). Pure per-row arithmetic — fully parallel, no
    * shuffle, engine-independent. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0,
      s"window and stride must be positive, got window=$window stride=$stride")
    val toks = Text.tokens(col(textCol))
    df.select(col(idCol).as("id"), toks.as("__t"), size(toks).as("__n"))
      .select(col("id"), col("__t"), col("__n"),
        posexplode(sequence(lit(0), greatest(col("__n") - 1, lit(0)),
          lit(stride))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "start_tok")
      .select(col("id").as(idCol), col("chunk_idx"), col("start_tok"),
        least(lit(window), col("__n") - col("start_tok")).as("n_tok"),
        concat_ws(" ", slice(col("__t"), col("start_tok") + 1, lit(window)))
          .as("chunk_text"))
  }

  /** Content-defined chunking: cut each document where the hash of the
    * trailing `window`-char context lands in a 1/`divisor` bucket — so
    * chunk boundaries move WITH the content (an insertion re-chunks only
    * its neighborhood, where fixed-size chunking shifts every later
    * boundary), the storage/transfer dedup primitive (LBFS, Muthitacharoen
    * et al. 2001; FastCDC's min/max clamps are deliberately omitted — they
    * make each cut depend on the previous one, breaking the pure per-row
    * formulation and the SQL mirror).
    *
    * Expected chunk length ≈ `divisor` chars. A cut lands after position i
    * (window ≤ i < n) iff the polynomial hash of text[i−window+1 .. i] —
    * a left fold (acc·257 + codepoint) mod 1048573 over the window's
    * codepoints, Rabin–Karp style — is ≡ 0 (mod divisor). Every
    * intermediate is exact int64 in ANY engine, so boundaries are an
    * engine-independent pure function of content. The cut scan is the
    * fused [[graft.functions.expressions.CdcCuts]] rolling-hash kernel:
    * one O(n) pass per document inside whole-stage codegen (an earlier
    * per-position md5 ran 4.2 s at sf0.1, an interpreted slice+aggregate
    * HOF refold 50 s; the kernel is sub-second).
    *
    * Pure per-row array arithmetic: no shuffle, nothing driver-side.
    * Returns (idCol, chunk_idx, cstart, cend, fp) with chunks tiling
    * [1, n] contiguously and fp = md5 of the chunk text. */
  def chunkContentDefined(df: DataFrame, idCol: String, textCol: String,
                          window: Int = 16, divisor: Long = 64): DataFrame =
    cdcChunks(df, idCol, textCol, window, divisor).drop("__ctxt")

  /** [[chunkContentDefined]] plus the chunk text itself (`__ctxt`) — the
    * reassembly input for [[dedupCdcChunks]]; kept internal so the public
    * chunk table stays fingerprint-sized. */
  private def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                        window: Int, divisor: Long): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    val t = col("__t")
    val n = length(t)
    val cuts = expressions.TextExpressions.cdcCuts(t, window, divisor)
    val bounds = concat(array(lit(0)), cuts, array(n))
    df.select(col(idCol).as("__id"), col(textCol).as("__t"))
      .withColumn("__b", bounds)
      .select(col("__id"), col("__t"),
        posexplode(transform(sequence(lit(1), size(col("__b")) - 1), j =>
          struct(element_at(col("__b"), j).as("p"),
            element_at(col("__b"), j + 1).as("q")))))
      .select(col("__id").as(idCol),
        (col("pos") + 1).cast("long").as("chunk_idx"),
        (col("col.p") + 1).cast("long").as("cstart"),
        col("col.q").cast("long").as("cend"),
        col("__t").substr(col("col.p") + 1, col("col.q") - col("col.p"))
          .as("__ctxt"))
      .withColumn("fp", md5(col("__ctxt")))
  }

  /** Cross-document repeated-span removal at CDC-chunk granularity — the
    * exact-substring-dedup shape of Lee et al. 2021 ("Deduplicating
    * Training Data...") expressed over content-defined chunks: every
    * occurrence of a chunk fingerprint other than its global FIRST
    * occurrence (lowest (id, chunk_idx)) is deleted, and each document is
    * reassembled from its surviving chunks in order. Because boundaries
    * are content-defined, a span shared verbatim by many documents chunks
    * identically in all of them and collapses to one copy corpus-wide —
    * including intra-document repeats.
    *
    * Deterministic by construction: keep-first under the (id, chunk_idx)
    * total order; reassembly sorts by chunk_idx before concatenation.
    *
    * Scale shape: one groupBy(fp) min (map-side combinable) + one
    * fp-keyed join of occurrences to winners + one per-doc groupBy for
    * reassembly — shuffles carry chunk rows keyed by 128-bit fp / doc id,
    * never the corpus text twice; no self-join, no window over data rows.
    * A corpus-wide boilerplate fp is ONE winner row joined to many
    * occurrences (AQE skew-split territory), not a quadratic group.
    *
    * Returns (idCol, clean_text, n_kept, n_removed, chars_removed). */
  def dedupCdcChunks(df: DataFrame, idCol: String, textCol: String,
                     window: Int = 16, divisor: Long = 64): DataFrame = {
    val ch = cdcChunks(df, idCol, textCol, window, divisor)
    val winners = ch.groupBy(col("fp"))
      .agg(min(struct(col(idCol), col("chunk_idx"))).as("__w"))
    ch.join(winners, Seq("fp"))
      .withColumn("__keep",
        struct(col(idCol), col("chunk_idx")) === col("__w"))
      .groupBy(col(idCol))
      .agg(
        concat_ws("", transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("chunk_idx"), col("__ctxt"))))),
          x => x.getField("__ctxt"))).as("clean_text"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__keep"), 0L).otherwise(1L)).as("n_removed"),
        sum(when(col("__keep"), 0L)
          .otherwise(col("cend") - col("cstart") + 1)).as("chars_removed"))
  }
}
