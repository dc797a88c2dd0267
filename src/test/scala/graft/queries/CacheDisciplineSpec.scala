package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Persist discipline: a query body that caches intermediates must not
  * leak them into the session — after the TERMINAL action completes,
  * the cache manager is empty WITHOUT any harness clearCache. (The
  * bodies return lazy plans that read those caches, so the release
  * rides a one-shot QueryExecutionListener — graft.CacheJanitor — and
  * the RankOps percentile helpers unpersist internally because their
  * results are pure driver state.)
  */
class CacheDisciplineSpec extends SparkSpec {

  // EVERY registered query (round 9 — was a tracked subset until the
  // iterative graph operators turned out to leak caches the subset
  // never exercised). Session-scoped Stages keep their data as RDD
  // checkpoint blocks with explicit handles, not cache-manager entries,
  // so staging passes this gate by construction.
  private val tracked = SparkEntry.queries.keys.toSeq.sorted

  private def cacheEmpty: Boolean = spark.sharedState.cacheManager.isEmpty

  tracked.foreach { name =>
    test(s"$name leaves no cache entries after its terminal action") {
      // Hermetic per query: a leak elsewhere must not cascade into this
      // test's verdict.
      spark.sharedState.cacheManager.clearCache()
      val fn = SparkEntry.queries(name)
      fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      // The janitor fires on the async listener bus — poll briefly.
      val deadline = System.nanoTime() + 10_000_000_000L
      while (!cacheEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(cacheEmpty, s"$name leaked cache entries")
    }
  }
}
