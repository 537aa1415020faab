package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.{CsvReader, CsvWriter, JsonIo}
import graft.model._
import graft.units.BuiltinUnitConverter

/** Executable demo of the full vertical slice (SURVEY §7.3) — the analog of
  * the reference's examples/pdtable_demo.py. Run:
  *   sbt "runMain graft.Demo"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bundleCsv =
      """author:;XYODA
        |purpose:;Save the galaxy
        |
        |***read_this_summer
        |War and Peace
        |Crime and Punishment
        |
        |**places_to_go
        |all
        |place;distance;ETA;is_hot
        |text;km;datetime;onoff
        |home;0;2020-08-04 08:00;1
        |work;1;2020-08-04 09:00;0
        |beach;2;2020-08-04 17:00;TRUE
        |wonderland;-;-;FaLsE
        |
        |**spelling_numbers
        |all
        |number;spelling
        |-;text
        |1;one
        |6;six
        |42;forty-two
        |""".stripMargin

    println("=== 1. read CSV -> TableBundle ===")
    val bundle = CsvReader.readBundleFromString(spark, bundleCsv)
    bundle.iterator.foreach(t => println(s"  $t  rows=${t.df.count()}"))

    println("\n=== 2. query: hot places, avg distance ===")
    val places = bundle.unique("places_to_go")
    val hot = places
      .filter(col("is_hot") === true)
      .groupByAgg(Seq.empty :+ "is_hot", Seq(avg(col("distance")).as("avg_km")))
    hot.df.show()
    println(s"  origin: ${hot.meta.origin.render()}")

    println("=== 3. unit conversion km -> m (vectorized affine) ===")
    val km = new BuiltinUnitConverter(extra = Map("km" -> ("m", graft.units.Affine(1000))))
    val inMeters = places.convertColumnUnits("distance", Some("m"), km)
    inMeters.df.show()
    println(s"  units now: ${inMeters.units.mkString(", ")}")

    println("=== 4. write back as StarTable CSV ===")
    print(CsvWriter.tableToCsvString(inMeters))

    println("=== 5. JSON interchange ===")
    println(JsonIo.tableToJsonString(bundle.unique("spelling_numbers")))

    println("\n=== 6. physical plan of the query (Catalyst) ===")
    hot.df.explain("formatted")

    spark.stop()
  }
}
