package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off timing dissection of jaccardPairs' internal phases on the bench
  * corpus (round-10 perf adjudication of q_setsim_join). */
object SetsimDissect {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Text

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dissect] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  -> $r")
      r
    }

    val threshold = 0.95
    val df = graft.queries.Tables.star(spark, sfDir, "documents").df
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val docs = df.select(col("doc_id").as("__id"), array_distinct(col("toks")).as("__toks"))
      .filter(size(col("__toks")) > 0).persist(lvl)
    t("docs materialize")(docs.count())

    val tok = docs.select(col("__id"), explode(col("__toks")).as("__t"))
    val dfreq = tok.groupBy("__t").agg(count(lit(1)).as("__df"))
    val ordered = tok.join(dfreq, "__t")
      .groupBy("__id")
      .agg(array_sort(collect_list(struct(col("__df"), col("__t")))).as("__st"))
      .select(col("__id"),
        transform(col("__st"), s => s.getField("__t")).as("__ord"),
        size(col("__st")).as("__n"))
    val prefLen = least(col("__n") - floor(lit(threshold) * col("__n")).cast("int") + 1, col("__n"))
    val pref = ordered
      .select(col("__id"), col("__n"), posexplode(slice(col("__ord"), lit(1), prefLen)))
      .select(col("__id"), col("__n"), (col("pos") + 1).as("__p"), col("col").as("__t"))
      .persist(lvl)
    t("pref materialize")(pref.count())

    val a = pref.select(col("__t"), col("__id").as("id_a"), col("__n").as("n_a"), col("__p").as("p_a"))
    val b = pref.select(col("__t"), col("__id").as("id_b"), col("__n").as("n_b"), col("__p").as("p_b"))
    val alpha = ceil(lit(threshold / (1.0 + threshold)) * (col("n_a") + col("n_b")) - lit(1e-6))
    val ubound = least(col("p_a") - 1, col("p_b") - 1) + 1 +
      least(col("n_a") - col("p_a"), col("n_b") - col("p_b"))
    val rawJoin = a.join(b, Seq("__t")).filter(col("id_a") < col("id_b"))
      .filter(col("n_b") >= lit(threshold) * col("n_a") - lit(1e-6) &&
              col("n_a") >= lit(threshold) * col("n_b") - lit(1e-6))
      .filter(ubound >= alpha)
    t("join+filters count")(rawJoin.count())
    val cands = rawJoin.select("id_a", "id_b").distinct().persist(lvl)
    t("distinct cands")(cands.count())

    val ta = docs.select(col("__id").as("id_a"), col("__toks").as("__ta"))
    val tb = docs.select(col("__id").as("id_b"), col("__toks").as("__tb"))
    val overlap = size(array_intersect(col("__ta"), col("__tb")))
    val union = col("__na") + col("__nb") - col("overlap")
    val result = cands
      .join(ta.withColumn("__na", size(col("__ta"))), Seq("id_a"))
      .join(tb.withColumn("__nb", size(col("__tb"))), Seq("id_b"))
      .withColumn("overlap", overlap)
      .withColumn("jac", col("overlap").cast("double") / union)
      .filter(col("jac") >= threshold)
    t("verify count")(result.count())
    spark.stop()
  }
}
