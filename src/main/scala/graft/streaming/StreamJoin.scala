package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join.
  *
  * The reference joins its live event feed to recently-inserted orders
  * batch-side after landing both in MySQL (streaming/consumer.py writes,
  * the dashboard joins on read). Structured Streaming can do the join
  * IN-FLIGHT: both sides buffer in state keyed by the join key, and the
  * watermark + interval bound tells the engine exactly when a buffered
  * row can never match again and is evicted — bounded state, no landing
  * table.
  *
  * Scale shape: state is hash-partitioned on the join key across
  * executors like any shuffle; the interval condition is what makes
  * eviction possible (an unbounded-time stream-stream join would grow
  * state forever and is rejected by the analyzer in append mode).
  */
object StreamJoin {

  /** Each event joins the same user's orders placed within
    * `windowHours` BEFORE the event (streaming attribution: "which
    * recent order is this event about?"). Both inputs must carry an
    * event-time column: `ts` on events, `o_ts` on orders.
    *
    * The watermark (allowed lateness) scales with the join interval:
    * a fixed 1-hour delay under a 24-hour window would silently drop
    * rows more than 1 hour late in event time, diverging from the
    * batch-join semantics the operator documents. `lateHours` defaults
    * to the window bound itself — state is already O(windowHours) of
    * buffered rows, so matching the lateness to it does not change the
    * asymptotic state size.
    */
  def eventsWithRecentOrders(events: DataFrame, orders: DataFrame,
                             windowHours: Int,
                             lateHours: Option[Int] = None): DataFrame = {
    val late = s"${lateHours.getOrElse(math.max(windowHours, 1))} hours"
    val e = events.withWatermark("ts", late)
    val o = orders.withWatermark("o_ts", late)
    e.join(
      o,
      e("user_id") === o("o_custkey") &&
        o("o_ts") <= e("ts") &&
        o("o_ts") >= e("ts") - expr(s"INTERVAL $windowHours HOURS"))
  }
}
