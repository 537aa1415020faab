package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Similarity

/** Lloyd's k-means: convergence, determinism, and assignment sanity. */
class KmeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("inertia is non-increasing across iterations (Lloyd's guarantee)") {
    val (_, _, inertias) = Similarity.kmeans(emb, "embedding", "vec_id",
      k = 4, dim = 64, iters = 4)
    assert(inertias.size == 4)
    inertias.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-6, s"inertia increased: $inertias")
    }
  }

  test("clustering is deterministic across runs and covers all vectors") {
    def sizes() = {
      val (assign, _, _) = Similarity.kmeans(emb, "embedding", "vec_id",
        k = 4, dim = 64, iters = 3)
      assign.groupBy("cluster").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    val a = sizes(); val b = sizes()
    assert(a == b)
    assert(a.values.sum == emb.count())
    assert(a.keySet.subsetOf((0 until 4).toSet))
  }

  test("separated synthetic clusters are recovered exactly") {
    import spark.implicits._
    // two tight clusters far apart in 4-d
    val rows = (0 until 20).map { i =>
      val base = if (i % 2 == 0) Array(10f, 0f, 0f, 0f) else Array(-10f, 0f, 0f, 0f)
      (i.toLong, base.zipWithIndex.map { case (v, j) => v + (i % 3) * 0.01f * (j + 1) }.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (assign, _, _) = Similarity.kmeans(df, "embedding", "vec_id",
      k = 2, dim = 4, iters = 3)
    val byCluster = assign.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val even = (0 until 20 by 2).map(i => byCluster(i.toLong)).toSet
    val odd = (1 until 20 by 2).map(i => byCluster(i.toLong)).toSet
    assert(even.size == 1 && odd.size == 1 && even != odd)
  }
}
