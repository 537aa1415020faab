package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucketed keyed store for POINT LOOKUPS — the "get me these ids"
  * access path a 100 TB corpus needs beside its scans: fetching a sample
  * of documents for inspection, joining a handful of ids from a ticket,
  * serving a debug UI. A full scan for 5 ids reads everything; this
  * layout reads ~k/`buckets` of the data per lookup.
  *
  * Write: rows land in `__bucket = pmod(xxhash64(key), buckets)` partition
  * directories, sorted by key within files — so a lookup (a) prunes to
  * the probed ids' bucket PARTITIONS at planning time (literal bucket
  * list → PartitionFilters) and (b) skips row groups inside them via the
  * key min/max footers that the sort makes tight. The same layered-layout
  * idea as the LSH/IVF indexes, applied to exact keys.
  *
  * Lookup bucket ids are computed by evaluating THE SAME xxhash64
  * expression on a literal frame (one metadata-sized job) — no
  * driver-side reimplementation of Spark's hash to drift out of sync. */
object KeyedStore {

  def write(df: DataFrame, path: String, keyCol: String,
            buckets: Int = 256): Unit = {
    require(buckets > 0, s"KeyedStore.write: buckets must be positive")
    // Hash a CANONICAL type (long) on both sides: xxhash64 is
    // type-sensitive (hashInt/hashLong/string bytes all differ), and
    // lookup() hashes its probe keys as Seq[Long] — hashing an
    // IntegerType key column natively here would silently put every row
    // in a bucket the lookup never probes. Integral key types only;
    // anything else must refuse loudly rather than return empty lookups.
    val dt = df.schema(keyCol).dataType
    require(Seq("bigint", "int", "smallint", "tinyint").contains(dt.simpleString),
      s"KeyedStore.write: key column '$keyCol' must be an integral type " +
        s"(lookup probes are Seq[Long]); got ${dt.simpleString}")
    df.withColumn("__bucket",
        pmod(xxhash64(col(keyCol).cast("long")), lit(buckets.toLong)))
      .repartition(col("__bucket"))
      .sortWithinPartitions(col(keyCol))
      .write.partitionBy("__bucket").mode("overwrite").parquet(path)
  }

  /** Rows whose `keyCol` ∈ `keys`, touching only the matching bucket
    * partitions. */
  def lookup(spark: SparkSession, path: String, keyCol: String,
             keys: Seq[Long], buckets: Int = 256): DataFrame = {
    require(keys.nonEmpty, "KeyedStore.lookup: no keys")
    import spark.implicits._
    val bucketIds = keys.toDF("__k")
      .select(pmod(xxhash64(col("__k")), lit(buckets.toLong)).as("__b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    spark.read.parquet(path)
      .filter(col("__bucket").isInCollection(bucketIds) &&
        col(keyCol).isInCollection(keys))
      .drop("__bucket")
  }
}
