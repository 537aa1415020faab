package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.StarTable

/** Testdata table access: every query goes through the StarTable wrapper so
  * the correctness gate exercises the engine's own surface, with units per
  * FIXTURES.md §8 (numerics '-', strings 'text', timestamps 'datetime' —
  * inferred by StarTable.fromDataFrame).
  */
object Tables {
  def df(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = {
      // Some testdata generations write events.ts as TIMESTAMP(NANOS),
      // which the Spark reader rejects by default; the legacy conf reads
      // those as raw int64 nanos (harmless for µs-typed generations).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
    }
    if (name == "events") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      // Normalize ts to a session-TZ timestamp whatever the generation:
      // int64 nanos → µs instants (integer division — nanos exceed
      // double's 2^53 mantissa); TIMESTAMP_NTZ (µs, isAdjustedToUTC =
      // false) → the same instants under the UTC session timezone.
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    } else raw
  }

  def star(spark: SparkSession, dir: String, name: String): StarTable =
    StarTable.fromDataFrame(df(spark, dir, name), name)
}
