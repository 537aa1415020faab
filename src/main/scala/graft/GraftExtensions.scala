package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{FloatVecCosine, FloatVecDot, MinHashArray}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions so `spark.sql(...)` users get them
  * too. Activate with either
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` at session
  * build, or `GraftExtensions.register(spark)` on a live session.
  *
  *   - graft_cosine(a, b) — fused cosine similarity over float/double arrays
  *   - graft_dot(a, b)    — fused dot product
  *   - graft_minhash(hashes, k, seed) — k-minima minhash signature
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, (info, builder)) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  val functions: Seq[(String, (ExpressionInfo, Seq[Expression] => Expression))] = Seq(
    "graft_cosine" -> (
      new ExpressionInfo(classOf[FloatVecCosine].getName, "graft_cosine"),
      (args: Seq[Expression]) => FloatVecCosine(args(0), args(1))),
    "graft_dot" -> (
      new ExpressionInfo(classOf[FloatVecDot].getName, "graft_dot"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))),
    "graft_minhash" -> (
      new ExpressionInfo(classOf[MinHashArray].getName, "graft_minhash"),
      (args: Seq[Expression]) =>
        MinHashArray(args(0), intLit(args(1), "numHashes"),
          intLit(args(2), "seed").toLong))
  )

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, (_, builder)) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, exprs => builder(exprs), "scala_udf")
    }
}
