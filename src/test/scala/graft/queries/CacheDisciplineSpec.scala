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

  // The five sites round 6 flagged + the RankOps-backed consumers +
  // the index-lifecycle queries (round 9: DedupIndex persists several
  // intermediates per build/append and must unpersist them all before
  // returning).
  private val tracked = Seq(
    "q_sketch_builtin", "q_sketch_cms_heavy_hitters",
    "q_embed_pq_topk", "q_embed_ivfpq_search",
    "q_docs_decontaminate", "q_docs_corpus_build",
    "q_docs_substring_dedup", "q_customer_rfm",
    "q_dedup_incremental", "q_dedup_index_append",
    "q_graph_shortest_paths", "q_graph_shortest_path_nodes")

  private def cacheEmpty: Boolean = spark.sharedState.cacheManager.isEmpty

  tracked.foreach { name =>
    test(s"$name leaves no cache entries after its terminal action") {
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
