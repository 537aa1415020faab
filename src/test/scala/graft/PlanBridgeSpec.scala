package graft

import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `PlanBridge.flattenPlan` must copy rows out of the physical iterator
  * (as `Dataset.checkpoint` does): `execute()` may yield REUSED UnsafeRow
  * buffers, and a caller persisting or localCheckpointing the flattened RDD
  * would otherwise store one aliased buffer per partition. */
class PlanBridgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("flattenPlan yields independent row buffers (checkpoint-grade copy)") {
    // whole-stage codegen writes every output row into a single reused
    // UnsafeRowWriter buffer — exactly the aliasing hazard under test
    val df = spark.range(0, 64).select((col("id") * 2).as("x")).coalesce(1)
    val flat = org.apache.spark.sql.graft.PlanBridge.flattenPlan(df)
    val rdd = flat.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }.head
    // materializing the raw InternalRows (what persist would store): all 64
    // must be distinct values, not one buffer holding the last row
    val vals = rdd.collect().map(_.getLong(0)).toSet
    assert(vals == (0L until 64L).map(_ * 2).toSet,
      s"aliased row buffers: got ${vals.size} distinct of 64")
    // and the flattened frame still evaluates correctly end-to-end
    assert(flat.agg(sum("x")).head().getLong(0) == (0L until 64L).map(_ * 2).sum)
  }
}
