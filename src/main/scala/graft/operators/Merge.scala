package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD-1 upsert: apply a change batch to a snapshot by key — the
  * incremental-maintenance primitive for a continuously-updated corpus
  * (re-crawled documents replace their old rows, new documents insert,
  * tombstones delete) without rewriting the 100 TB snapshot logic in every
  * pipeline.
  *
  * Semantics (keyed by `keyCols`):
  *   - snapshot rows whose key appears in `changes` are REPLACED by the
  *     change row (or dropped when the change is a tombstone);
  *   - change rows with unmatched keys are INSERTED (unless tombstoned);
  *   - rows with NULL in any key column never match (SQL join semantics) —
  *     they survive on the snapshot side and insert from the change side.
  *
  * `changes` must carry at most one row per key; pass
  * `requireUniqueKeys = true` to enforce that with a loud raise (one extra
  * aggregate over the change batch — cheap, it's the small side).
  *
  * Scale shape: the snapshot is touched by ONE left-anti join against the
  * distinct change keys — broadcast by default (a change batch is normally
  * orders of magnitude smaller than the snapshot, so the 100 TB side never
  * shuffles); pass `broadcastChanges = false` for rare snapshot-sized
  * batches and AQE plans the shuffle join. The union is a no-shuffle
  * concatenation.
  */
object Merge {

  def upsert(snapshot: DataFrame, changes: DataFrame, keyCols: Seq[String],
             deleteCol: Option[String] = None,
             broadcastChanges: Boolean = true,
             requireUniqueKeys: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val dataCols = snapshot.columns.toSeq
    deleteCol.foreach { d =>
      require(!dataCols.contains(d),
        s"deleteCol '$d' must not be a snapshot column")
    }
    if (requireUniqueKeys) {
      val dups = changes.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).count()
      require(dups == 0,
        s"changes carry $dups duplicate key(s) — merge would be ambiguous")
    }
    val keys = changes.select(keyCols.map(col): _*).distinct()
    val kept = snapshot.join(
      if (broadcastChanges) broadcast(keys) else keys,
      keyCols, "left_anti")
    val live = deleteCol match {
      case Some(d) => changes.filter(!coalesce(col(d), lit(false)))
      case None => changes
    }
    kept.unionByName(live.select(dataCols.map(col): _*))
  }
}
