package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: count, per corpus document, the distinct
  * n-gram shingles it shares with an eval set — the overlap check every
  * pretraining pipeline runs before training (beyond-reference; part of
  * the corpus-curation family).
  *
  * Scale posture:
  *   - Shingles are 64-bit-hashed (`xxhash64`) BEFORE the join, so the
  *     exchange carries 8-byte keys instead of n-token strings (~5×
  *     fewer shuffle bytes on 5-gram text) and the broadcast index is
  *     a long set, not a string set. At corpus scale the 2⁻⁶⁴ collision
  *     rate is far below the noise floor of an overlap THRESHOLD
  *     decision (birthday bound ≈ n²/2⁶⁵: ~3e-8 for a billion distinct
  *     shingles).
  *   - The eval side is usually corpus-small (benchmarks are thousands
  *     of docs), so its distinct hash index broadcasts and the corpus
  *     probe is map-side — document text never shuffles. But "usually"
  *     is not a plan: the broadcast only happens under an explicit SIZE
  *     GUARD (one cheap count of the distinct index — an aggregate over
  *     the small side only), and an oversized eval set falls back to a
  *     shuffle join on the hash instead of OOMing every executor.
  */
object Decontaminate {

  /** Default guard: broadcast the eval index only below this many
    * distinct shingle hashes (~8 MB of longs plus hash-set overhead —
    * comfortably inside a 10s-of-MB broadcast budget). */
  val BroadcastCap = 1000000L

  /** Distinct-overlap counts `(doc_id, overlap_cnt)` for corpus docs
    * sharing ≥ 1 shingle with the eval set; docs with zero overlap are
    * absent (the clean corpus never leaves the map side).
    *
    * `corpus` and `eval` carry `(doc_id, shs: array<string>)` with shs
    * already distinct per doc (so count(1) after the hash join IS the
    * distinct-overlap count).
    */
  def overlap(corpus: DataFrame, eval: DataFrame,
              broadcastCap: Long = BroadcastCap): DataFrame = {
    val evalIdx = eval.selectExpr("explode(shs) AS sh")
      .selectExpr("xxhash64(sh) AS h").distinct()
    // The guard count is an action, but only over the eval side — the
    // decision input a static planner can't know and AQE would only
    // learn after materializing the exchange.
    val idx = if (evalIdx.count() <= broadcastCap) broadcast(evalIdx) else evalIdx
    corpus.selectExpr("doc_id", "explode(shs) AS sh")
      .selectExpr("doc_id", "xxhash64(sh) AS h")
      .join(idx, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("overlap_cnt"))
  }
}
