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
      // events.parquet carries TIMESTAMP(NANOS) which the Spark reader
      // rejects by default; read the raw int64 nanos and convert to
      // microsecond timestamps (lossless here: source values are µs-grained).
      // Integer division — the values exceed double's 2^53 mantissa.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
    }
    if (name == "events")
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
  }

  def star(spark: SparkSession, dir: String, name: String): StarTable =
    StarTable.fromDataFrame(df(spark, dir, name), name)
}
