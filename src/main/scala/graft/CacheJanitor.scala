package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Unpersist a query's intermediate caches AFTER its terminal action —
  * the missing half of the persist discipline for query bodies that
  * RETURN a lazy plan reading those caches (the body cannot unpersist
  * before returning or the action recomputes the pipeline; leaving the
  * handles leaked them into the session until some harness called
  * `catalog.clearCache`, which a long-lived session serving many
  * queries never does).
  *
  * Mechanism: a one-shot [[QueryExecutionListener]]. Every Dataset
  * action materializes through a fresh [[QueryExecution]] whose `id` is
  * drawn from a global monotonic counter, so an execution with
  * `id > result.queryExecution.id` must have been CREATED after the
  * query body finished — i.e. the caller's terminal materialization
  * (collects inside the body complete before registration but their
  * completion events may still be in flight on the async listener bus;
  * the id gate ignores them). `collect()`/`show()` on the returned
  * frame REUSE the frame's own QueryExecution instead of creating a
  * fresh one, so the same instance completing (`qe eq
  * result.queryExecution`) is by definition the terminal action and
  * triggers cleanup too. On that first post-body action — success or
  * failure — the caches are unpersisted and the listener removed.
  *
  * The one hazard this must defuse: a body-side action on the RETURNED
  * frame (e.g. a warm-up `result.collect()` before calling this). Its
  * completion event is still in flight on the async listener bus at
  * registration time and matches `qe eq result.queryExecution` — under
  * a naive gate it would unpersist the caches before the caller's real
  * terminal action (an uncached recompute; perf only, never a
  * correctness break). The SENTINEL sequences it out: registration
  * runs a no-op action (`emptyDataFrame.collect()` — posts a
  * completion event, launches no job) AFTER registering. The listener
  * bus delivers in posting order, so any in-flight body-side event for
  * `result.queryExecution` arrives BEFORE the sentinel's event and is
  * ignored; a same-instance event arriving after the sentinel can only
  * be a genuine post-registration action. Fresh executions
  * (`qe.id > sentinel.id`) are genuine regardless of arrival order —
  * the id counter is global and monotonic.
  */
object CacheJanitor {

  def afterTerminalAction(result: DataFrame, caches: Seq[DataFrame]): DataFrame = {
    if (caches.isEmpty) return result
    val spark = result.sparkSession
    val done = new AtomicBoolean(false)
    // Resolve the sentinel's QueryExecution BEFORE registering so the
    // listener can recognize its event; run it AFTER registering so the
    // event is guaranteed to be delivered (FIFO) behind any in-flight
    // body-side completion. The sentinel MUST be a freshly constructed
    // Dataset: `spark.emptyDataFrame` is a session-cached lazy val, so
    // reusing it pins `sentinelQe.id` to the id allocated at the
    // session's FIRST use — every later registration would compare
    // against a stale-small id and the `qe.id > sentinelQe.id` gate
    // below would pass for in-flight body-side completions, releasing
    // the caches before the caller's terminal action. A fresh empty
    // LocalRelation allocates its QueryExecution id HERE, after every
    // body-side execution already holds a smaller one.
    val sentinel = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      new org.apache.spark.sql.types.StructType())
    val sentinelQe = sentinel.queryExecution
    val armed = new AtomicBoolean(false)
    val listener = new QueryExecutionListener {
      private def cleanup(qe: QueryExecution): Unit = {
        if (qe eq sentinelQe) { armed.set(true); return }
        val genuine = qe.id > sentinelQe.id ||
          (armed.get() && (qe eq result.queryExecution))
        if (genuine && done.compareAndSet(false, true)) {
          caches.foreach(c =>
            try c.unpersist(blocking = false) catch { case _: Throwable => () })
          try spark.listenerManager.unregister(this)
          catch { case _: Throwable => () }
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = cleanup(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = cleanup(qe)
    }
    spark.listenerManager.register(listener)
    sentinel.collect() // posts the sequencing event; no job (LocalRelation)
    result
  }
}
