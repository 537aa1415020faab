package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.CsvReader
import graft.model._

/** Ports of the reference's whitelisted-pandas-operation tests
  * (reference: pdtable/test/test_pdtable.py:174-324, 384-525
  * TestPandasOperations) onto the StarTable wrapper.
  */
class StarTableOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def mk(csv: String, name: String): StarTable =
    CsvReader.readBundleFromString(spark, csv).unique(name)

  def places: StarTable = mk(
    """**places
      |all
      |place;distance;ETA;is_hot
      |text;km;datetime;onoff
      |home;0;2020-08-04 08:00;1
      |work;1;2020-08-04 09:00;0
      |beach;2;2020-08-04 17:00;1
      |wonderland;-;-;0
      |""".stripMargin, "places")

  test("filter keeps metadata (mask selection, test_pdtable.py:294-300)") {
    val t = places.filter(col("is_hot") === true)
    assert(t.df.count() == 2)
    assert(t.name == "places")
    assert(t.unit("distance") == "km")
    assert(!t.meta.origin.isLeaf) // origin got a branch node
  }

  test("drop column keeps remaining metadata (reindex, :285-291)") {
    val t = places.drop("ETA")
    assert(t.columnNames == Seq("place", "distance", "is_hot"))
    assert(t.unit("distance") == "km")
  }

  test("withColumn infers unit from type when omitted (frame.py:303-307)") {
    val t = places.withColumn("double_dist", col("distance") * 2)
    assert(t.unit("double_dist") == "-")
    val t2 = places.withColumn("double_dist", col("distance") * 2, unit = Some("km"))
    assert(t2.unit("double_dist") == "km")
  }

  test("groupBy + agg (test_pdtable.py:303-316)") {
    val t = places.groupByAgg(Seq("is_hot"),
      Seq(sum(col("distance")).as("total_km"), count(lit(1)).as("n")))
    assert(t.df.count() == 2)
    assert(t.unit("is_hot") == "onoff")
    val hot = t.df.filter(col("is_hot") === true).collect()(0)
    assert(hot.getDouble(hot.fieldIndex("total_km")) == 2.0)
  }

  test("join combines metadata; unit conflict raises (frame.py:128-145)") {
    val other = mk(
      """**dist_class
        |all
        |distance;klass
        |km;text
        |0;near
        |1;near
        |2;far
        |""".stripMargin, "dist_class")
    val j = places.join(other, Seq("distance"))
    assert(j.df.count() == 3)
    assert(j.unit("klass") == "text")
    assert(j.unit("distance") == "km")

    val conflicting = mk(
      """**dist_class
        |all
        |distance;klass
        |mm;text
        |0;near
        |""".stripMargin, "dist_class")
    assertThrows[InvalidTableCombineError] {
      places.join(conflicting, Seq("distance"))
    }
  }

  test("concat stacks rows; unit mismatch on shared columns raises (:174-188)") {
    val t2 = places
    val cat = places.concat(t2)
    assert(cat.df.count() == 8)
    assert(cat.unit("distance") == "km")

    val wrongUnits = mk(
      """**places
        |all
        |place;distance
        |text;mm
        |moon;384
        |""".stripMargin, "places")
    assertThrows[InvalidTableCombineError] { places.concat(wrongUnits) }
  }

  test("orderBy sorts (sort_index, :393-398)") {
    val t = places.orderBy(col("distance").desc)
    val first = t.df.collect()(0)
    assert(first.getString(0) == "beach")
  }

  test("replace values (:384-391)") {
    val t = places.replace("place", Map("home" -> "HOME"))
    assert(t.df.filter(col("place") === "HOME").count() == 1)
    // unit-type guard: replacing a boolean with a string raises (:389-391)
    assertThrows[ColumnUnitException] {
      places.replace("is_hot", Map[Any, Any](true -> "a"))
    }
  }

  test("cast: legal and illegal under strict types (:409-424)") {
    // numeric -> numeric is fine
    val t = places.castColumn("distance", IntegerType)
    assert(t.df.schema("distance").dataType == IntegerType)
    // numeric column with unit km -> string contradicts the unit
    assertThrows[ColumnUnitException] {
      places.castColumn("distance", StringType)
    }
  }

  test("fillna (:440-457)") {
    val t = places.fillna(99.0, Seq("distance"))
    assert(t.df.filter(col("distance") === 99.0).count() == 1)
    // type guard: filling a numeric column with text raises
    assertThrows[ColumnUnitException] {
      places.fillna("oops", Seq("distance"))
    }
  }

  test("rename carries column metadata (:459-469)") {
    val t = places.withColumnRenamed("distance", "dist")
    assert(t.unit("dist") == "km")
    assert(!t.columnMeta.contains("distance"))
  }

  test("unpivot/melt (frame.py:87)") {
    val t = mk(
      """**wide
        |all
        |key;a;b
        |text;-;-
        |r1;1;2
        |r2;3;4
        |""".stripMargin, "wide")
    val long = t.unpivot(Seq("key"), Seq("a", "b"))
    assert(long.df.count() == 4)
    assert(long.columnNames == Seq("key", "variable", "value"))
  }

  test("pivot/unstack (:471-505)") {
    val t = mk(
      """**long
        |all
        |key;variable;value
        |text;text;-
        |r1;a;1
        |r1;b;2
        |r2;a;3
        |r2;b;4
        |""".stripMargin, "long")
    val wide = t.pivot("key", "variable", "value")
    assert(wide.df.count() == 2)
    assert(wide.columnNames.toSet == Set("key", "a", "b"))
  }

  test("append row (:426-438)") {
    val t = places.appendRow(Seq("moon", 384400.0,
      java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), false))
    assert(t.df.count() == 5)
  }

  test("limit + getRow positional access (proxy.py:236-238)") {
    assert(places.limit(2).df.count() == 2)
    val r = places.orderByNames("place").getRow(0)
    assert(r.head == "beach")
  }

  test("equalsTable: numeric type-insensitive, missing==missing (proxy.py:288-316)") {
    val a = mk("**t\nall\nx;y\n-;text\n10;u\n-;v\n", "t")
    val intTyped = a.castColumn("x", LongType)
    assert(a.equalsTable(intTyped)) // 10 == 10.0
    val renamed = a.withColumnRenamed("x", "z")
    assert(!a.equalsTable(renamed))
    val differentUnit = a.withUnit("x", "kg")
    assert(!a.equalsTable(differentUnit))
  }

  test("strict_types OR-off propagates through combine (frame.py:114-119)") {
    val lax = places.copy(meta = places.meta.copy(strictTypes = false))
    val j = places.concat(lax)
    assert(!j.meta.strictTypes)
  }

  test("destinations filtering on bundle (store.py:56)") {
    val csv =
      """**a
        |for_me
        |x
        |-
        |1
        |
        |**b
        |for_you
        |x
        |-
        |2
        |""".stripMargin
    val bundle = CsvReader.readBundleFromString(spark, csv)
    assert(bundle.forDestination("for_me").map(_.name) == Seq("a"))
  }
}
