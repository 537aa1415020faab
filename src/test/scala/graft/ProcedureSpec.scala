package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** SQL CALL surface for dataset maintenance (Spark 4 ProcedureCatalog):
  * each procedure delegates to its Maintenance entry point — semantics
  * unchanged, reports returned as one-row results, refusals surface. */
class ProcedureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkDataset(): String = {
    val out = Files.createTempDirectory("graft_proc").resolve("ds").toString
    graft.io.CsvWriter.writePartitionedDataset(
      graft.model.StarTable.fromDataFrame(
        (0 until 600).map(i => (s"g${i % 3}", i.toDouble)).toDF("grp", "x"),
        "proc", units = Map("grp" -> "text")),
      out, Seq("grp"))
    out
  }

  private def withCatalog[A](f: => A): A = {
    spark.conf.set("spark.sql.catalog.graft", "graft.GraftCatalog")
    f
  }

  test("CALL graft.system.compact_dataset compacts and reports") {
    withCatalog {
      val ds = mkDataset()
      val before = spark.read.format("startable").load(ds).count()
      val r = spark.sql(
        s"CALL graft.system.compact_dataset(path => '$ds')").head()
      assert(r.getLong(0) > r.getLong(2), // files_before > files_after
        s"compaction did not reduce files: $r")
      assert(spark.read.format("startable").load(ds).count() === before)
    }
  }

  test("CALL graft.system.cluster_dataset clusters, writes file stats, " +
    "and positional args + default target_bytes work") {
    withCatalog {
      val ds = mkDataset()
      val r = spark.sql(
        s"CALL graft.system.cluster_dataset('$ds', 'x')").head()
      assert(r.getLong(0) === 3L, s"expected 3 slices, got $r") // slices
      val meta = graft.sources.StarTableSource.readDatasetMeta(Seq(ds)).get
      assert(spark.read.format("startable").load(ds).count() === 600)
      assert(meta.sliceStats.nonEmpty)
    }
  }

  test("CALL graft.system.shard_dataset_stats migrates inline stats to " +
    "per-leaf shards through SQL") {
    withCatalog {
      val ds = mkDataset()
      val r = spark.sql(
        s"CALL graft.system.shard_dataset_stats(path => '$ds')").head()
      assert(r.getLong(0) === 3L, s"expected 3 shards written, got $r")
      val meta = graft.sources.StarTableSource.readDatasetMeta(Seq(ds)).get
      assert(meta.statsSharded && meta.sliceStats.isEmpty)
      assert(spark.read.format("startable").load(ds).count() === 600)
    }
  }

  test("CALL graft.system.evolve_dataset_schema appends columns by sidecar " +
    "rewrite alone: old slices null-pad, the next plain backfill carries " +
    "them") {
    withCatalog {
      val ds = mkDataset()
      val r = spark.sql(s"CALL graft.system.evolve_dataset_schema(" +
        s"path => '$ds', columns => 'y, z:text')").head()
      assert(r.getLong(0) === 2L)
      val meta = graft.sources.StarTableSource.readDatasetMeta(Seq(ds)).get
      assert(meta.cols === Seq("x", "y", "z") &&
        meta.units === Seq("-", "-", "text") &&
        meta.lateCols === Seq("y", "z"), meta.toString)
      val back = spark.read.format("startable").load(ds)
      assert(back.columns.toSet === Set("grp", "x", "y", "z"))
      assert(back.agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.col("y"))).head().getLong(0) === 0L)
      // malformed spec refuses
      intercept[Exception] {
        spark.sql(s"CALL graft.system.evolve_dataset_schema(" +
          s"path => '$ds', columns => 'a:b:c')").collect()
      }
    }
  }

  test("named datasets (round-13 stretch): CREATE TABLE graft.db.t USING " +
    "startable LOCATION round-trips through the catalog with units " +
    "intact; the sidecar stays the source of truth; rename/drop are " +
    "external (names only)") {
    withCatalog {
      val ds = mkDataset()
      spark.sql(
        s"CREATE TABLE graft.data.named_ds USING startable LOCATION '$ds'")
      val back = spark.table("graft.data.named_ds")
      assert(back.count() === 600)
      assert(back.schema("grp").metadata
        .getString(graft.model.StarTable.UnitMetaKey) === "text",
        "units must ride the catalog resolution")
      val listed = spark.sql("SHOW TABLES IN graft.data").collect()
        .map(_.getString(1))
      assert(listed.contains("named_ds"), listed.mkString(", "))
      // a sidecar-only evolution is visible through the NAME immediately
      // (loadTable re-infers from the sidecar on every resolution)
      graft.io.CsvWriter.evolveDatasetSchema(spark, ds, Seq("zz" -> "-"))
      assert(spark.table("graft.data.named_ds").columns.contains("zz"))
      // rename remaps the name; drop unregisters it; the DATA survives both
      // the TO name is resolved INSIDE the same catalog (no catalog prefix)
      spark.sql("ALTER TABLE graft.data.named_ds RENAME TO data.named_ds2")
      assert(spark.table("graft.data.named_ds2").count() === 600)
      spark.sql("DROP TABLE graft.data.named_ds2")
      intercept[Exception] { spark.table("graft.data.named_ds2").collect() }
      assert(spark.read.format("startable").load(ds).count() === 600,
        "DROP TABLE must be external: the dataset survives")
      // refusals: a typo'd location fails at CREATE, not at first SELECT;
      // ALTER TABLE points at the procedures
      intercept[Exception] {
        spark.sql("CREATE TABLE graft.data.bad USING startable " +
          "LOCATION '/nonexistent_graft_ds'")
      }
      assert(spark.sql("SHOW TABLES IN graft.data").collect().isEmpty,
        "a failed CREATE must not register the name")
    }
  }

  test("CALL graft.system.show_dataset_locks lists exclusive and shared " +
    "leases with liveness judgment; empty after release") {
    withCatalog {
      val ds = mkDataset()
      val h = graft.io.DatasetLock.acquire(ds, "compact")
      val hs = graft.io.DatasetLock.acquireShared(ds + "_other", "backfill",
        Set(Seq("d1")))
      try {
        val rows = spark.sql(
          s"CALL graft.system.show_dataset_locks(path => '$ds')").collect()
        assert(rows.length === 1)
        assert(rows.head.getString(0) === "exclusive" &&
          rows.head.getString(1) === "compact" &&
          !rows.head.getBoolean(6), rows.head.toString)
        val shared = spark.sql(
          s"CALL graft.system.show_dataset_locks(path => '${ds}_other')").collect()
        assert(shared.length === 1 && shared.head.getString(0) === "shared" &&
          shared.head.getString(7) === "d1", shared.head.toString)
      } finally { h.release(); hs.release() }
      assert(spark.sql(
        s"CALL graft.system.show_dataset_locks(path => '$ds')").collect().isEmpty)
    }
  }

  test("CALL graft.system.drop_partitions drops slices; vacuum_dataset " +
    "cleans leftovers; unknown procedure refuses with the available list") {
    withCatalog {
      val ds = mkDataset()
      val r = spark.sql(
        s"""CALL graft.system.drop_partitions(
           |  path => '$ds', column => 'grp', values => 'g1,g2')""".stripMargin)
        .head()
      assert(r.getLong(0) === 2L, s"expected 2 dropped slices, got $r")
      assert(spark.read.format("startable").load(ds).count() === 200)
      // vacuum on a clean dataset: nothing restored/removed, and callable
      val v = spark.sql(
        s"CALL graft.system.vacuum_dataset(path => '$ds', tmp_min_age_ms => 0)")
        .head()
      assert((0 to 3).forall(i => v.getLong(i) === 0L), s"vacuum on clean: $v")
      val e = intercept[Exception] {
        spark.sql(s"CALL graft.system.nope(path => '$ds')").collect()
      }
      // Spark wraps loadProcedure failures in FAILED_TO_LOAD_ROUTINE; the
      // catalog's available-procedures list must survive in the cause chain
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
      assert(msgs.contains("compact_dataset"),
        s"unknown-procedure error must list what exists: $msgs")
      // the Maintenance refusals surface through SQL unchanged
      val e2 = intercept[Exception] {
        spark.sql("CALL graft.system.compact_dataset(path => '/nonexistent_graft')")
          .collect()
      }
      assert(e2.getMessage != null)
    }
  }

  test("concurrent CREATE TABLE from two threads: the registry CAS keeps " +
    "both registrations (round-14 hardening)") {
    withCatalog {
      val ds1 = mkDataset(); val ds2 = mkDataset()
      val tag = java.lang.Long.toHexString(System.nanoTime())
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val errs = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      def create(n: Int, ds: String): Thread = new Thread(() =>
        try {
          barrier.await(60, java.util.concurrent.TimeUnit.SECONDS)
          spark.sql(s"CREATE TABLE graft.race$tag.t$n USING startable " +
            s"LOCATION '$ds'")
        } catch { case t: Throwable => errs.compareAndSet(null, t) })
      val a = create(1, ds1); val b = create(2, ds2)
      a.start(); b.start(); a.join(60000); b.join(60000)
      val t = errs.get(); if (t != null) throw t
      val listed = spark.sql(s"SHOW TABLES IN graft.race$tag").collect()
        .map(_.getString(1)).toSet
      assert(listed === Set("t1", "t2"),
        s"a racing CREATE dropped a registration: $listed")
      assert(spark.table(s"graft.race$tag.t1").count() === 600)
      spark.sql(s"DROP TABLE graft.race$tag.t1")
      spark.sql(s"DROP TABLE graft.race$tag.t2")
    }
  }

  test("namespaces: CREATE/SHOW/DROP NAMESPACE; table-implied namespaces " +
    "list; DROP of a non-empty namespace needs CASCADE and stays external") {
    withCatalog {
      val tag = java.lang.Long.toHexString(System.nanoTime())
      spark.sql(s"CREATE NAMESPACE graft.ns$tag")
      val shown = spark.sql("SHOW NAMESPACES IN graft").collect()
        .map(_.getString(0)).toSet
      assert(shown.contains(s"ns$tag"), shown.mkString(", "))
      // duplicate create refuses; IF NOT EXISTS tolerates
      intercept[Exception] { spark.sql(s"CREATE NAMESPACE graft.ns$tag") }
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.ns$tag")
      // a registered table IMPLIES its namespace
      val ds = mkDataset()
      spark.sql(s"CREATE TABLE graft.imp$tag.t USING startable LOCATION '$ds'")
      assert(spark.sql("SHOW NAMESPACES IN graft").collect()
        .map(_.getString(0)).contains(s"imp$tag"))
      // DROP of the empty namespace works; the non-empty one refuses
      // without CASCADE, and CASCADE unregisters names but keeps data
      spark.sql(s"DROP NAMESPACE graft.ns$tag")
      intercept[Exception] { spark.sql(s"DROP NAMESPACE graft.imp$tag") }
      spark.sql(s"DROP NAMESPACE graft.imp$tag CASCADE")
      intercept[Exception] { spark.table(s"graft.imp$tag.t").collect() }
      assert(spark.read.format("startable").load(ds).count() === 600,
        "CASCADE must stay external: the dataset survives")
    }
  }

  test("named-table WRITE: INSERT OVERWRITE graft.db.t rewrites the " +
    "StarTable through the name; registered OPTIONS ride resolution") {
    withCatalog {
      val tag = java.lang.Long.toHexString(System.nanoTime())
      val loc = Files.createTempDirectory("graft_namedw").toString
      Seq(("seed", 0.0)).toDF("k", "v").write.format("startable")
        .option("table", "nt").mode("overwrite").save(loc)
      spark.sql(s"CREATE TABLE graft.wns.insert$tag USING startable " +
        s"OPTIONS (`table` 'nt') LOCATION '$loc'")
      Seq(("x", 10.0), ("y", 20.0), ("z", 30.0)).toDF("k", "v")
        .createOrReplaceTempView(s"named_w_src")
      spark.sql(s"INSERT OVERWRITE graft.wns.insert$tag " +
        "SELECT k, v FROM named_w_src")
      val back = spark.table(s"graft.wns.insert$tag")
      assert(back.collect().map(r => (r.getString(0), r.getDouble(1))).toSet ===
        Set(("x", 10.0), ("y", 20.0), ("z", 30.0)))
      // the write replaced nt.csv in place (the registered table option
      // rode the catalog resolution into the write builder)
      assert(new java.io.File(s"$loc/nt.csv").isFile)
      spark.sql(s"DROP TABLE graft.wns.insert$tag")
    }
  }

  test("CALL compact_dataset / cluster_dataset with slices => runs the " +
    "scoped SHARED-lease pass on exactly those slices") {
    withCatalog {
      val ds = mkDataset()
      val g0Before = graft.sources.StarTableSource.listPartitionedFiles(
        Seq(ds), Seq("grp")).filter(_._3 == Seq("g0")).map(_._1).sorted
      val r = spark.sql(
        s"CALL graft.system.compact_dataset(path => '$ds', slices => 'g1')")
        .head()
      assert(r.getLong(0) >= r.getLong(2) && r.getLong(2) >= 1,
        s"scoped compaction report off: $r")
      // untouched sibling slice keeps its exact files
      val g0After = graft.sources.StarTableSource.listPartitionedFiles(
        Seq(ds), Seq("grp")).filter(_._3 == Seq("g0")).map(_._1).sorted
      assert(g0After === g0Before)
      val c = spark.sql(
        s"CALL graft.system.cluster_dataset(path => '$ds', " +
          "sort_cols => 'x', slices => 'g2')").head()
      assert(c.getLong(0) === 1L, s"expected 1 clustered slice: $c")
      assert(spark.read.format("startable").load(ds).count() === 600)
      assert(graft.io.DatasetLock.listLocks(ds).isEmpty)
    }
  }
}
