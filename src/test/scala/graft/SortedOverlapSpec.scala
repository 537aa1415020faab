package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.expressions.SortedOverlap

/** The zero-allocation merge-count that replaced size(array_intersect) in
  * SetSimilarityJoin's verification: must agree with array_intersect on
  * every sorted-distinct input, in BOTH the interpreted and codegen paths. */
class SortedOverlapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("agrees with size(array_intersect) on randomized sorted-distinct arrays") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map { _ =>
      def arr() = rnd.shuffle((0 until 40).toList).take(rnd.nextInt(12))
        .map(i => s"tok$i").distinct.sorted
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
      .withColumn("fast", SortedOverlap.sortedOverlapCount(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))))
    assert(df.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("edge cases: empty, identical, disjoint, unicode binary order") {
    val df = Seq(
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b", "c"), Seq("a", "b", "c")),
      (Seq("a", "b"), Seq("c", "d")),
      // UTF8String binary order: 'Z' < 'a' < 'é' — matches array_sort's
      (Seq("Z", "a", "é"), Seq("Z", "é"))
    ).toDF("a", "b")
      .withColumn("fast", SortedOverlap.sortedOverlapCount(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))))
    val r = df.select("fast", "ref").collect()
    assert(r.forall(x => x.getInt(0) == x.getInt(1)))
    assert(r.map(_.getInt(0)).toSeq === Seq(0, 3, 0, 2))
  }

  test("interpreted eval matches codegen result") {
    // force the non-codegen path via the expression's nullSafeEval
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def ad(xs: String*) = ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray)
    assert(SortedOverlap.count(ad("a", "c", "e"), ad("b", "c", "d", "e")) === 2)
    assert(SortedOverlap.count(ad(), ad("a")) === 0)
  }

  test("null ELEMENTS match array_intersect semantics (nulls-last order, " +
    "null matches null) — no NPE") {
    val df = Seq(
      (Seq("x", null), Seq("x", "y")),          // trailing null vs longer side
      (Seq("x", null), Seq("x", "y", null)),    // null on both -> one match
      (Seq[String](null), Seq("a", "b")),       // null-only vs values
      (Seq[String](null), Seq[String](null))    // null-only both
    ).toDF("a", "b")
      .withColumn("a", array_sort(array_distinct(col("a"))))
      .withColumn("b", array_sort(array_distinct(col("b"))))
      .withColumn("fast", SortedOverlap.sortedOverlapCount(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))))
    val r = df.select("fast", "ref").collect()
    assert(r.forall(x => x.getInt(0) == x.getInt(1)),
      s"null-element divergence: ${r.map(x => (x.getInt(0), x.getInt(1))).toSeq}")
    assert(r.map(_.getInt(0)).toSeq === Seq(1, 2, 0, 1))
  }

  test("null input arrays yield null, not a crash") {
    val df = Seq((Some(Seq("a")), Option.empty[Seq[String]])).toDF("a", "b")
      .withColumn("fast", SortedOverlap.sortedOverlapCount(col("a"), col("b")))
    assert(df.select("fast").collect()(0).isNullAt(0))
  }
}
