package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Bridge to the executor-side streaming state-store lifecycle (package
  * `org.apache.spark.sql` visibility). A finished micro-batch query leaves
  * its loaded StateStoreProvider instances (and the background maintenance
  * thread) resident in the executor JVM; for benchmark isolation — and for
  * long-lived batch sessions that ran a streaming stage — unloading them
  * returns that memory. Spark restarts maintenance lazily on the next
  * streaming load, so calling this between queries is safe.
  */
object StreamingHygiene {
  /** Unload every cached state-store provider and stop the maintenance
    * task. */
  def stopStateStores(): Unit = StateStore.stop()
}
