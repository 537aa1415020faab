package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the canonical pipeline a corpus goes
  * through before pre-training, composed from the engine's operators —
  *
  *   normalize → exact dedup → near-dedup (MinHash-LSH + connected
  *   components) → benchmark decontamination → quality filter →
  *   deterministic train/validation/test split
  *
  * Each stage is the scale-shaped operator documented on its own object;
  * this entry point fixes the order (dedup before decontamination so
  * near-duplicate contaminated docs cannot slip through as "clean" copies)
  * and returns per-stage survivor counts for the curation report.
  */
object Curation {

  final case class CurationReport(
      nInput: Long,
      nAfterExact: Long,
      nAfterNearDup: Long,
      nAfterDecontam: Long,
      nAfterQuality: Long,
      splitCounts: Map[String, Long])

  /** Run the full pipeline. The returned DataFrame carries a `split` column
    * ("train" / "validation" / "test"); the report materializes stage
    * counts (one action per stage — curation is a batch job, not a lazy
    * view).
    *
    * `checkpointDir`: stable-storage directory (HDFS/object store on a
    * cluster) for RELIABLE checkpoints during the connected-components
    * iteration inside near-dedup. Without it the iteration truncates
    * lineage with `localCheckpoint`, whose blocks live in executor storage
    * — on a real cluster an executor loss mid-run then kills the job
    * (documented Spark semantics). A multi-hour 100 TB curation run should
    * always set this; the per-round checkpoint write is tiny (the label
    * table, two longs per candidate doc). Applied via
    * `sc.setCheckpointDir`, which [[Dedup.connectedComponents]] picks up. */
  def curate(docs: DataFrame, benchmark: DataFrame,
             idCol: String, textCol: String,
             nearDupThreshold: Double = 0.8,
             decontamN: Int = 8,
             minQuality: Double = 0.25,
             trainPct: Int = 90, validationPct: Int = 5,
             checkpointDir: Option[String] = None): (DataFrame, CurationReport) = {
    checkpointDir.foreach(docs.sparkSession.sparkContext.setCheckpointDir)
    val nInput = docs.count()

    // 1. exact dedup on the NORMALIZED text (casing/punct/ws-insensitive),
    //    deterministic min-id survivor; hash groupBy — content never shuffles
    val normalized = docs.withColumn("__norm", Text.normalizeText(col(textCol)))
    val exactSurvivors = normalized
      .join(Dedup.exactDedupIds(normalized, "__norm", idCol), Seq(idCol))
    val nAfterExact = exactSurvivors.count()

    // 2. near-duplicate removal (banded LSH → components → min-id survivor)
    val nearDeduped = Dedup.dedupNearDuplicates(
      exactSurvivors, idCol, textCol, threshold = nearDupThreshold)
    val nAfterNearDup = nearDeduped.count()

    // 3. benchmark decontamination (shared n-gram hashes)
    val decontaminated = Decontamination.decontaminate(
      nearDeduped, benchmark, idCol, textCol, n = decontamN)
    val nAfterDecontam = decontaminated.count()

    // 4. quality floor (codegen'd heuristic score)
    val qualityFiltered = decontaminated
      .filter(Text.qualityScore(col(textCol)) >= minQuality)
    val nAfterQuality = qualityFiltered.count()

    // 5. deterministic content-hash split
    val withSplit = qualityFiltered
      .withColumn("split",
        when(Decontamination.hashBucket(col(idCol)) < trainPct, "train")
          .when(Decontamination.hashBucket(col(idCol)) < trainPct + validationPct,
            "validation")
          .otherwise("test"))
      .drop("__norm")
    val splitCounts = withSplit.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    (withSplit, CurationReport(nInput, nAfterExact, nAfterNearDup,
      nAfterDecontam, nAfterQuality, splitCounts))
  }
}
