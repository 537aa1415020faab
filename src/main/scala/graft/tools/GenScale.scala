package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generate the rehearsal replica dataset for a mult (same construction as
  * ScaleRehearsal) without running the full rehearsal. Lets a
  * targeted probe (WinnowProbe) run without paying for the full
  * rehearsal suite. */
object GenScale {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val baseDocs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val docPath = s"/tmp/graft_scale_v3_$mult/documents.parquet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(docPath, "_SUCCESS"))) {
      val tail = concat((1 to 15).map(j =>
        concat(lit(s" zq"), col("rep"), lit(s"w$j"))): _*)
      baseDocs.crossJoin(spark.range(mult).toDF("rep"))
        .select((col("rep") * 1000000L + col("doc_id")).as("doc_id"),
          concat(col("text"), tail).as("text"))
        .repartition(32).write.mode("overwrite").parquet(docPath)
    }
    println(s"[gen] $docPath rows=" + spark.read.parquet(docPath).count())
    spark.stop()
  }
}
