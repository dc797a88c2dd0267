package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.functions.Exact

/** Window-FRAME analytics (RANGE / ROWS BETWEEN, lag deltas) — the
  * moving-aggregate surface the reference renders as dashboard trend
  * charts (webapp/mysql_routes.py:158-199 returns month buckets and the
  * JS front-end differences them; here the frame math is in the engine).
  *
  * Scale shapes:
  *   - `q_rolling_revenue_7d` pre-aggregates to one row per DAY before
  *     any window runs — the frame operates on ~2.5 k rows regardless of
  *     fact-table size, so the unpartitioned ordered window (a single
  *     task) is the right plan even at 100 TB of orders. The heavy
  *     lifting (fact scan → per-day partial agg) is map-side combined.
  *   - `q_customer_cumulative_spend` partitions its running sum by
  *     customer: each frame is one customer's order history, so the
  *     window parallelizes across the hash shuffle like any keyed agg.
  *
  * Frame sums run over DECIMAL(18,2) (see [[Exact]]) so the rolling
  * totals are accumulation-order-independent and bit-identical to the
  * DuckDB oracle.
  */
object WindowQueries {

  val defs: Seq[QueryDef] = Seq(

    // 7-day rolling revenue over the order stream: RANGE frame on a day
    // index, so calendar gaps shorten the window (a missing day is NOT a
    // zero row — cnt7 carries how many days the frame actually saw).
    QueryDef(
      "q_rolling_revenue_7d",
      t => {
        val daily = t.orders
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(Exact.dsum(col("o_totalprice")).as("day_rev"))
          .withColumn("day_idx", datediff(col("day"), lit("1992-01-01").cast("date")))
        val w = Window.orderBy(col("day_idx")).rangeBetween(-6, 0)
        daily
          .withColumn("rev7", sum(col("day_rev").cast("decimal(18,2)")).over(w).cast("double"))
          .withColumn("cnt7", count(lit(1)).over(w))
          .select(
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("day_rev"), col("rev7"), col("cnt7").cast("long").as("cnt7"))
          .orderBy(col("day"))
      },
      Some(s"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 ${Exact.sqlSum("o_totalprice")} AS day_rev,
                 date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day_idx
          FROM orders GROUP BY 1, 3
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               day_rev,
               CAST(SUM(CAST(day_rev AS DECIMAL(18,2)))
                 OVER (ORDER BY day_idx RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev7,
               COUNT(*) OVER (ORDER BY day_idx RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS cnt7
        FROM daily ORDER BY day""")),

    // Per-customer running total: ROWS frame, deterministic tie-break on
    // (o_orderdate, o_orderkey). One row per order with the cumulative
    // spend and the order's 1-based sequence number.
    QueryDef(
      "q_customer_cumulative_spend",
      t => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t.orders
          .withColumn("cum_spend",
            sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
          .withColumn("order_seq", row_number().over(
            Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))))
          .select(
            col("o_custkey").cast("long").as("custkey"),
            col("o_orderkey").cast("long").as("orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
            col("order_seq").cast("long").as("order_seq"),
            col("cum_spend"))
          .orderBy(col("custkey"), col("order_seq"))
      },
      Some("""
        SELECT CAST(o_custkey AS BIGINT) AS custkey,
               CAST(o_orderkey AS BIGINT) AS orderkey,
               strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_day,
               CAST(row_number() OVER w AS BIGINT) AS order_seq,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY custkey, order_seq""")),

    // Month-over-month revenue momentum: lag(1) delta over the monthly
    // series (post-agg cardinality = #months, same single-task argument
    // as the rolling query).
    QueryDef(
      "q_revenue_momentum",
      t => {
        val monthly = t.orders
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(Exact.dsum(col("o_totalprice")).as("rev"))
        val w = Window.orderBy(col("month"))
        monthly
          .withColumn("prev_rev", lag(col("rev"), 1).over(w))
          .withColumn("delta",
            (col("rev").cast("decimal(18,2)") - col("prev_rev").cast("decimal(18,2)"))
              .cast("double"))
          .select(col("month"), col("rev"), col("prev_rev"), col("delta"))
          .orderBy(col("month"))
      },
      Some(s"""
        WITH monthly AS (
          SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
                 ${Exact.sqlSum("o_totalprice")} AS rev
          FROM orders GROUP BY 1
        )
        SELECT month, rev,
               lag(rev, 1) OVER (ORDER BY month) AS prev_rev,
               CAST(CAST(rev AS DECIMAL(18,2)) - CAST(lag(rev, 1) OVER (ORDER BY month) AS DECIMAL(18,2)) AS DOUBLE) AS delta
        FROM monthly ORDER BY month""")),
  )
}
