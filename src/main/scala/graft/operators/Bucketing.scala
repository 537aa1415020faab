package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-shuffle a fact table ONCE at write time so
  * every subsequent equi-join or aggregation on the bucket key runs with no
  * exchange at all — the canonical way to amortize the dominant shuffle of
  * a 100 TB pipeline across every query that joins on the same key.
  *
  * Spark bucketing (hash(key) mod n files per partition, recorded in the
  * catalog) makes both sides of a same-key same-count join report the same
  * output partitioning, so Catalyst plans a SortMergeJoin/ShuffledHashJoin
  * with NO Exchange on either side (asserted in BucketingSpec). Works with
  * the in-memory session catalog — no Hive metastore needed.
  */
object Bucketing {

  /** Write `df` as a bucketed external table at `path`, registered as
    * `table` in the session catalog. Sorting within buckets lets the join
    * skip its sort too. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, numBuckets: Int,
                    sortWithinBuckets: Boolean = true): Unit = {
    val w = df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
    (if (sortWithinBuckets) w.sortBy(bucketCol) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata comes from the catalog —
    * reading the bare parquet path would lose it). */
  def bucketedTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Join two tables bucketed on the same key with the same bucket count;
    * with matching bucketing this plans exchange-free. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Bucketed persistence for a StarTable: unit metadata rides in the
    * parquet/catalog schema (StarTable.UnitMetaKey), so the re-read wrapper
    * recovers units AND same-key joins stay exchange-free. */
  def writeBucketedStarTable(t: graft.model.StarTable, table: String, path: String,
                             bucketCol: String, numBuckets: Int): Unit = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.MetadataBuilder
    val withMeta = t.df.select(t.columnNames.map { c =>
      col(c).as(c, new MetadataBuilder()
        .putString(graft.model.StarTable.UnitMetaKey, t.unit(c)).build())
    }: _*)
    writeBucketed(withMeta, table, path, bucketCol, numBuckets)
  }

  /** Read a bucketed StarTable back with units restored from the schema. */
  def readBucketedStarTable(spark: SparkSession, table: String,
                            name: String): graft.model.StarTable = {
    val df = spark.table(table)
    val units = df.schema.fields.collect {
      case f if f.metadata.contains(graft.model.StarTable.UnitMetaKey) =>
        f.name -> f.metadata.getString(graft.model.StarTable.UnitMetaKey)
    }.toMap
    graft.model.StarTable.fromDataFrame(df, name, units)
  }
}
