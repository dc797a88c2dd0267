package graft

import org.apache.spark.storage.StorageLevel

/** The janitor's sequencing gate: a completion event for the returned
  * frame that was POSTED before registration (a body-side
  * `result.collect()`) must not trigger cleanup — only an action run
  * after `afterTerminalAction` returns may. The sentinel event
  * registered after the listener sequences the two cases apart on the
  * FIFO listener bus.
  */
class CacheJanitorSpec extends SparkSpec {

  private def waitUntil(deadlineMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + deadlineMs * 1000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
    cond
  }

  test("a body-side action on the returned frame does not unpersist early") {
    val cached = spark.range(1000).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)
    cached.count()
    val result = cached.selectExpr("sum(x) AS s")
    // The documented hazard, now defused: an action on the frame the
    // body RETURNS, before janitor registration. Its completion event
    // is in flight on the async bus when the listener registers.
    result.collect()
    val out = CacheJanitor.afterTerminalAction(result, Seq(cached))
    // Give the bus time to deliver the stale event (and the sentinel).
    Thread.sleep(1500)
    assert(cached.storageLevel != StorageLevel.NONE,
      "stale pre-registration completion event unpersisted the caches early")
    // The caller's REAL terminal action — same QueryExecution instance,
    // delivered after the sentinel — triggers cleanup.
    out.collect()
    // 10 s again: the old 30 s bump papered over the stale-sentinel bug
    // (a body-side event passing the id gate under suite load); with the
    // per-registration sentinel the bound is just bus latency, and the
    // wait only runs long on failure.
    assert(waitUntil(10000)(cached.storageLevel == StorageLevel.NONE),
      "terminal action on the returned frame did not release the caches")
  }

  test("sentinel id is fresh even after spark.emptyDataFrame is session-cached") {
    // Regression for the stale-sentinel bug: `spark.emptyDataFrame` is a
    // lazy val, so a janitor built on it compares every event against the
    // id allocated at the session's FIRST use. Pre-touch the lazy val so
    // its id is old, then replay the body-side-action hazard. The hazard
    // only bites when the body-side completion is still in flight on the
    // async bus at registration time — under light load the bus drains
    // it first and the bug hides (it surfaced in full-suite runs). A
    // throttle listener that sleeps per event keeps the bus backed up so
    // the stale event is deterministically delivered AFTER registration:
    // with a stale sentinel its qe.id beats the old id and unpersists
    // early; with a fresh sentinel it is ignored.
    spark.emptyDataFrame.collect()
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val throttle = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        Thread.sleep(1200)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(throttle)
    try {
      val cached = spark.range(1000).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)
      cached.count()
      val result = cached.selectExpr("sum(x) AS s")
      result.collect() // completion event queued behind the throttle's sleep
      val out = CacheJanitor.afterTerminalAction(result, Seq(cached))
      // Let the bus drain the stale event through the janitor's listener.
      Thread.sleep(5000)
      assert(cached.storageLevel != StorageLevel.NONE,
        "stale session-cached sentinel let a body-side completion unpersist early")
      out.collect()
      assert(waitUntil(30000)(cached.storageLevel == StorageLevel.NONE),
        "terminal action on the returned frame did not release the caches")
    } finally spark.listenerManager.unregister(throttle)
  }

  test("a fresh post-registration execution (write/show path) cleans up") {
    val cached = spark.range(1000).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)
    cached.count()
    val out = CacheJanitor.afterTerminalAction(
      cached.selectExpr("sum(x) AS s"), Seq(cached))
    out.write.format("noop").mode("overwrite").save() // fresh QueryExecution
    // See above: 10 s of pure bus latency, long only on failure.
    assert(waitUntil(10000)(cached.storageLevel == StorageLevel.NONE),
      "fresh terminal execution did not release the caches")
  }
}
