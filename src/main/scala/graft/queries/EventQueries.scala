package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.functions.Exact._
import graft.operators.{AsOfJoin, RangeJoin}

/** Event-stream analytics in batch form (the streaming twins live in
  * graft.streaming and are spec-tested — no SQL oracle for them).
  * Covers A7/A8 time-series shapes plus the beyond-reference operators
  * a training-data pipeline needs: sessionization and as-of joins.
  */
object EventQueries {

  private val SessionGapUs = 30L * 60 * 1000 * 1000 // 30 min in µs

  val defs: Seq[QueryDef] = Seq(

    // A7/A8 (time-series bucketing) on the event stream: tumbling 1-hour
    // windows per event type. Batch twin of the Structured Streaming
    // windowed agg. Ref: webapp/mysql_routes.py:719-732.
    QueryDef(
      "q_events_hourly",
      t => t.events
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("event_cnt"),
          dsum(col("value")).as("total_value"))
        .orderBy(col("hour_start"), col("event_type")),
      Some(s"""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_start,
          event_type,
          COUNT(*) AS event_cnt,
          ${sqlSum("value")} AS total_value
        FROM events
        GROUP BY hour_start, event_type
        ORDER BY hour_start, event_type""")),

    // Sessionization via window lag (gap > 30 min ⇒ new session): one
    // shuffle on user_id, one sort — the scalable batch sessionizer.
    // Beyond-reference operator (reference has no session logic, ST3).
    QueryDef(
      "q_events_sessions",
      t => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        t.events
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_session",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > SessionGapUs, 1L)
              .otherwise(0L))
          .groupBy(col("user_id"))
          .agg(
            sum(col("new_session")).as("session_cnt"),
            count(lit(1)).as("event_cnt"),
            dsum(col("value")).as("total_value"))
          .orderBy(col("user_id"))
      },
      Some(s"""
        WITH lagged AS (
          SELECT user_id, value,
            epoch_us(ts) - LAG(epoch_us(ts), 1)
              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          FROM events)
        SELECT user_id,
          CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > $SessionGapUs
                        THEN 1 ELSE 0 END) AS BIGINT) AS session_cnt,
          COUNT(*) AS event_cnt,
          ${sqlSum("value")} AS total_value
        FROM lagged
        GROUP BY user_id
        ORDER BY user_id""")),

    // Built-in session_window (the Structured-Streaming-native gap
    // sessionizer, usable in batch too): per-user session count +
    // longest session span. Cross-checked against the lag-based
    // formulation in the oracle — the two definitions must agree.
    QueryDef(
      "q_events_session_windows",
      t => t.events
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"),
          (unix_micros(col("session_window.end")) -
            unix_micros(col("session_window.start"))).as("span_us"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("session_cnt"),
          sum(col("n")).as("event_cnt"),
          // span includes the trailing 30-min gap by definition;
          // subtract it to get max intra-session duration.
          max(col("span_us") - lit(30L * 60 * 1000000)).as("max_session_us"))
        .orderBy(col("user_id")),
      // >= gap starts a new session: session_window's end bound is
      // exclusive, so an event exactly `gap` after the previous one does
      // NOT merge — the lag formulation must use >= to agree.
      Some(s"""
        WITH lagged AS (
          SELECT user_id, ts,
            CASE WHEN LAG(ts, 1) OVER w IS NULL OR
              epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w >= ${30L * 60 * 1000000}
            THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sessions AS (
          SELECT user_id, ts,
            SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
              ROWS UNBOUNDED PRECEDING) AS session_id
          FROM lagged),
        per_session AS (
          SELECT user_id, session_id, COUNT(*) AS n,
            epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS span
          FROM sessions GROUP BY user_id, session_id)
        SELECT user_id,
          COUNT(*) AS session_cnt,
          CAST(SUM(n) AS BIGINT) AS event_cnt,
          MAX(span) AS max_session_us
        FROM per_session
        GROUP BY user_id
        ORDER BY user_id""")),

    // As-of join (beyond-reference; union+window implementation — see
    // graft.operators.AsOfJoin): each event picks up the most recent
    // order date of the same customer at event time.
    QueryDef(
      "q_events_asof_last_order",
      t => AsOfJoin.lastValueAsOf(
          t.events, col("user_id"), col("ts"),
          t.orders, col("o_custkey"), col("o_orderdate"),
          date_format(to_date(col("o_orderdate")), "yyyy-MM-dd"), "last_order_date")
        .select(col("event_id"), col("user_id"), col("event_type"), col("last_order_date"))
        .orderBy(col("event_id")),
      Some("""
        SELECT event_id, user_id, event_type,
          (SELECT strftime(MAX(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
           FROM orders
           WHERE o_custkey = user_id AND o_orderdate <= ts) AS last_order_date
        FROM events
        ORDER BY event_id""")),

    // Same as-of semantics through the NATIVE plan node
    // (graft.plans.AsOfJoinPlan: logical node → strategy → sort-merge
    // exec): one merge pass per co-partition instead of union+window.
    // Shares the composed version's oracle — both must hash-match it.
    QueryDef(
      "q_events_asof_native",
      t => graft.operators.AsOfJoinNativeApi.lastValueAsOf(
          t.events, col("user_id"), col("ts"),
          t.orders, col("o_custkey"), col("o_orderdate"),
          date_format(to_date(col("o_orderdate")), "yyyy-MM-dd"), "last_order_date")
        .select(col("event_id"), col("user_id"), col("event_type"), col("last_order_date"))
        .orderBy(col("event_id")),
      Some("""
        SELECT event_id, user_id, event_type,
          (SELECT strftime(MAX(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
           FROM orders
           WHERE o_custkey = user_id AND o_orderdate <= ts) AS last_order_date
        FROM events
        ORDER BY event_id""")),

    // Banded range join (beyond-reference; see graft.operators.RangeJoin):
    // same-user follow-up events within 6 hours after each event. The
    // bucketized implementation shuffles O(n+m) rows with ≤2× fan-out —
    // never the per-key cross product a theta-join would make.
    // (Round-2 fixture fix: the old orders→events band was structurally
    // empty — orders end 2001, events live in 2024 — so the operator was
    // only ever proven on 0 = 0 rows. The self-band matches 5,540 pairs
    // at sf0.01; lo = 1 µs excludes the self-pair.)
    QueryDef(
      "q_events_followups",
      t => {
        val lead = t.events.select(col("event_id").as("lead_id"),
          col("user_id"), col("ts").as("lead_ts"),
          col("event_type").as("lead_type"))
        val follow = t.events.select(col("event_id").as("follow_id"),
          col("user_id").as("follow_user"), col("ts").as("follow_ts"))
        RangeJoin.bandJoin(
            lead, col("user_id"), col("lead_ts"),
            follow, col("follow_user"), col("follow_ts"),
            loUs = 1L, hiUs = 6L * 3600 * 1000000)
          .groupBy(col("lead_type"))
          .agg(count(lit(1)).as("followup_cnt"),
            countDistinct(col("lead_id")).as("leads_with_followups"))
          .orderBy(col("lead_type"))
      },
      Some(s"""
        SELECT a.event_type AS lead_type,
          COUNT(*) AS followup_cnt,
          COUNT(DISTINCT a.event_id) AS leads_with_followups
        FROM events a JOIN events b
          ON b.user_id = a.user_id
          AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 1 AND ${6L * 3600 * 1000000}
        GROUP BY lead_type
        ORDER BY lead_type""")),

    // A23 (zero-filled fixed-domain distribution, 24-slot hour-of-day).
    // Ref: webapp/mysql_routes.py:271-280.
    QueryDef(
      "q_events_hour_of_day",
      t => {
        val domain = t.spark.range(0, 24).select(col("id").as("hour_of_day"))
        val counts = t.events
          .groupBy(hour(col("ts")).cast("long").as("hour_of_day"))
          .agg(count(lit(1)).as("event_cnt"))
        domain.join(counts, Seq("hour_of_day"), "left")
          .na.fill(0)
          .orderBy(col("hour_of_day"))
      },
      Some("""
        SELECT d.hour_of_day, COALESCE(c.event_cnt, 0) AS event_cnt
        FROM (SELECT range AS hour_of_day FROM range(0, 24)) d
        LEFT JOIN (
          SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day, COUNT(*) AS event_cnt
          FROM events GROUP BY 1) c USING (hour_of_day)
        ORDER BY d.hour_of_day""")),

    // J8 (left join with coalesce fallback — the reference's Anonymous
    // user name, webapp/mongodb_routes.py:511-542): events enriched with
    // customer names; unknown users fall back. Dim side broadcasts.
    QueryDef(
      "q_events_user_names",
      t => t.events
        .join(t.customer, col("user_id") === col("c_custkey"), "left")
        .withColumn("user_name", coalesce(col("c_name"), lit("Anonymous")))
        .groupBy(col("user_name"))
        .agg(count(lit(1)).as("event_cnt"))
        .orderBy(col("event_cnt").desc, col("user_name").asc)
        .limit(20),
      Some("""
        SELECT COALESCE(c_name, 'Anonymous') AS user_name, COUNT(*) AS event_cnt
        FROM events LEFT JOIN customer ON user_id = c_custkey
        GROUP BY user_name
        ORDER BY event_cnt DESC, user_name
        LIMIT 20""")),

    // P8 (nested/semi-structured attribute predicate) via typed JSON
    // path extraction: filter + aggregate on a JSON attribute. The
    // reference's 120-line attribute coercion (webapp/mongodb_routes.py:
    // 151-274) collapses to a typed get_json_object.
    QueryDef(
      "q_events_props_typed",
      t => t.events
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("k").isNotNull && col("k") >= 2)
        .groupBy(col("event_type"), col("k"))
        .agg(count(lit(1)).as("event_cnt"))
        .orderBy(col("event_type"), col("k")),
      Some("""
        SELECT event_type, k, COUNT(*) AS event_cnt
        FROM (SELECT event_type,
                TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events)
        WHERE k IS NOT NULL AND k >= 2
        GROUP BY event_type, k
        ORDER BY event_type, k""")),

    // §1.2 attributes-as-MapType conformance + map functions
    // (map_keys/element_at over a real MAP column — the reference's
    // $objectToArray analytics shape, webapp/mongodb_routes.py:713-720):
    // the JSON blob conforms to map<string,string> at scan time, then
    // all predicates/aggregates are typed map ops.
    QueryDef(
      "q_events_props_map",
      t => t.events
        .withColumn("m", from_json(col("props"), lit("map<string,string>")))
        .select(col("event_type"),
          size(map_keys(col("m"))).cast("long").as("key_cnt"),
          element_at(col("m"), "k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("event_cnt"),
          max(col("key_cnt")).as("max_keys"),
          sum(col("k")).as("k_sum"))
        .orderBy(col("event_type")),
      Some("""
        SELECT event_type,
          COUNT(*) AS event_cnt,
          MAX(CAST(len(json_keys(props)) AS BIGINT)) AS max_keys,
          CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // §1.2 P8 multi-key TYPED conformance: a declarative KeySpec list
    // conforms the props blob to struct<k BIGINT, flag BOOLEAN,
    // tier STRING> in one scan-time projection (operators/Conform.scala
    // — the typed replacement for mongodb_routes.py:151-274's
    // per-request coercion), then the predicate composes typed tests on
    // THREE conformed fields. flag/tier are absent from this corpus, so
    // their typed-null result is exactly the coercion fallback the
    // reference probes for ("None"/missing → no match).
    QueryDef(
      "q_events_props_conformed",
      t => {
        import graft.operators.Conform
        val spec = Seq(
          Conform.KeySpec("k", Conform.IntKey),
          Conform.KeySpec("flag", Conform.BoolKey),
          Conform.KeySpec("tier", Conform.StrKey))
        t.events
          .withColumn("conf", Conform.conformed(col("props"), spec))
          .filter(col("conf.k").isNotNull && col("conf.k").between(10, 80) &&
            col("conf.flag").isNull && col("conf.tier").isNull)
          .groupBy(col("event_type"), (col("conf.k") % 10).as("k_mod"))
          .agg(count(lit(1)).as("event_cnt"))
          .orderBy(col("event_type"), col("k_mod"))
      },
      Some {
        import graft.operators.Conform
        val k = Conform.duckCoerce("props", Conform.KeySpec("k", Conform.IntKey))
        val flag = Conform.duckCoerce("props", Conform.KeySpec("flag", Conform.BoolKey))
        val tier = Conform.duckCoerce("props", Conform.KeySpec("tier", Conform.StrKey))
        s"""
        SELECT event_type, k % 10 AS k_mod, COUNT(*) AS event_cnt
        FROM (SELECT event_type, $k AS k, $flag AS flag, $tier AS tier
              FROM events)
        WHERE k IS NOT NULL AND k BETWEEN 10 AND 80
          AND flag IS NULL AND tier IS NULL
        GROUP BY event_type, k_mod
        ORDER BY event_type, k_mod"""
      }),

    // A17 (map/object key frequency) on the semi-structured props blob:
    // JSON keys exploded and counted — the document-analytics shape
    // (reference $objectToArray: webapp/mongodb_routes.py:713-720).
    QueryDef(
      "q_events_props_keys",
      t => t.events
        .selectExpr("explode(json_object_keys(props)) AS prop_key")
        .groupBy(col("prop_key"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("prop_key")),
      Some("""
        SELECT prop_key, COUNT(*) AS cnt
        FROM (SELECT unnest(json_keys(props)) AS prop_key FROM events)
        GROUP BY prop_key
        ORDER BY prop_key""")),

    // Skew-salted fact→dim join (operators/SkewOps.saltedJoin): events
    // join customer on user_id, salted 8 ways so a hot user spreads over
    // 8 reducers, then the tiny nation dim broadcasts. The oracle is the
    // PLAIN join — salting must be invisible in the result (dim key
    // unique ⇒ inner-join equivalence).
    QueryDef(
      "q_events_salted_nation",
      t => {
        val events = t.events
        val dim = t.customer.select(col("c_custkey"), col("c_nationkey"))
        val joined = graft.operators.SkewOps.saltedJoin(
          events, events("user_id"), dim, dim("c_custkey"), saltFactor = 8)
          .drop("c_custkey")
        joined
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"))
          .agg(
            count(lit(1)).as("event_cnt"),
            graft.functions.Exact.dsum(col("value")).as("total_value"))
          .orderBy(col("nation"))
      },
      Some(s"""
        SELECT n.n_name AS nation,
               COUNT(*) AS event_cnt,
               ${graft.functions.Exact.sqlSum("e.value")} AS total_value
        FROM events e
        JOIN customer c ON e.user_id = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY nation""")),

    // Join-key skew diagnostics — the report you run BEFORE deciding to
    // salt (q_events_salted_nation is the remedy; this is the
    // diagnosis): the heaviest keys with their share of the fact table
    // and their ratio to the median key, plus the global key-count
    // distribution. Per-key counts are ONE map-side-combined shuffle
    // (vocab-of-keys output, persisted — it feeds three passes); the
    // p50/p99 come from RankOps.exactPercentiles — a distributed range
    // sort + boundary-rank lookup, NOT Spark's exact `percentile`
    // aggregate, which buffers every value in one aggregation buffer
    // (the single-task shape this suite deliberately avoids); the top-k
    // is a TakeOrdered; the totals ride as literals.
    QueryDef(
      "q_events_key_skew",
      t => {
        val perKey = t.events.groupBy(col("user_id"))
          .agg(count(lit(1)).as("cnt"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val (nKeys, pcts) = graft.operators.RankOps
          .exactPercentiles(perKey, col("cnt"), Seq(0.5, 0.99))
        val total = perKey.agg(sum(col("cnt"))).collect()(0).getLong(0)
        // The exact unrounded percentiles ride as round-trippable double
        // literals; rounding happens IN the engine (round parity with
        // the oracle), and the skew ratio divides by the ROUNDED median
        // exactly as the oracle's CTE does.
        graft.CacheJanitor.afterTerminalAction(
          perKey.orderBy(col("cnt").desc, col("user_id")).limit(10)
            .selectExpr(
              "user_id", "CAST(cnt AS BIGINT) AS cnt",
              s"round(CAST(cnt AS DOUBLE) / CAST($total AS DOUBLE), 6) AS share",
              s"CAST($total AS BIGINT) AS total_events",
              s"CAST($nKeys AS BIGINT) AS n_keys",
              s"round(CAST('${pcts(0.5)}' AS DOUBLE), 6) AS p50_cnt",
              s"round(CAST('${pcts(0.99)}' AS DOUBLE), 6) AS p99_cnt")
            .withColumn("skew_vs_median",
              round(col("cnt").cast("double") / col("p50_cnt"), 6))
            .orderBy(col("cnt").desc, col("user_id")), Seq(perKey))
      },
      Some("""
        WITH pk AS (
          SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
        ),
        st AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS n_keys,
                 round(quantile_cont(cnt, 0.5), 6) AS p50_cnt,
                 round(quantile_cont(cnt, 0.99), 6) AS p99_cnt
          FROM pk
        ),
        top AS (
          SELECT user_id, cnt FROM pk ORDER BY cnt DESC, user_id LIMIT 10
        )
        SELECT t.user_id, CAST(t.cnt AS BIGINT) AS cnt,
               round(CAST(t.cnt AS DOUBLE) / CAST(st.total AS DOUBLE), 6) AS share,
               st.total AS total_events, st.n_keys, st.p50_cnt, st.p99_cnt,
               round(CAST(t.cnt AS DOUBLE) / st.p50_cnt, 6) AS skew_vs_median
        FROM top t CROSS JOIN st
        ORDER BY cnt DESC, user_id""")),

    // Step funnel, FIRST-OCCURRENCES-ORDERED approximation: view →
    // click → purchase compared on each step's global first occurrence.
    // ONE shuffle regardless of step count — the cheapest funnel shape,
    // at the cost of missing users whose first click precedes their
    // first view but who re-clicked after viewing. The exact
    // ordered-step semantics is q_events_funnel_ordered below (one
    // conditional-min pass per step).
    QueryDef(
      "q_events_funnel",
      t => {
        val perUser = t.events
          .groupBy(col("user_id"))
          .agg(
            min(when(col("event_type") === "view", col("ts"))).as("t_view"),
            min(when(col("event_type") === "click", col("ts"))).as("t_click"),
            min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
        // Ordered re-firsts: the first click AFTER the first view needs a
        // second conditional pass — approximate the classic funnel with
        // the standard "first occurrences are ordered" semantics, which
        // both engines express identically.
        perUser.select(
          count(lit(1)).as("users_total"),
          count(col("t_view")).as("did_view"),
          count(when(col("t_click") > col("t_view"), lit(1))).as("view_then_click"),
          count(when(col("t_purchase") > col("t_click") && col("t_click") > col("t_view"),
            lit(1))).as("full_funnel"))
          .selectExpr(
            "CAST(users_total AS BIGINT) AS users_total",
            "CAST(did_view AS BIGINT) AS did_view",
            "CAST(view_then_click AS BIGINT) AS view_then_click",
            "CAST(full_funnel AS BIGINT) AS full_funnel",
            "round(full_funnel / CAST(users_total AS DOUBLE), 6) AS conversion")
      },
      Some("""
        WITH per_user AS (
          SELECT user_id,
            min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
            min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
            min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
          FROM events GROUP BY user_id
        )
        SELECT
          CAST(count(*) AS BIGINT) AS users_total,
          CAST(count(t_view) AS BIGINT) AS did_view,
          CAST(count(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT) AS view_then_click,
          CAST(count(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END) AS BIGINT) AS full_funnel,
          round(count(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
            / CAST(count(*) AS DOUBLE), 6) AS conversion
        FROM per_user""")),

    // EXACT ordered-step funnel: first view, then the first click
    // STRICTLY AFTER that view, then the first purchase STRICTLY AFTER
    // that click — the semantics the approximate query above trades
    // away (a user whose first click precedes their first view but who
    // re-clicked after viewing IS counted here). Shape: chained
    // per-user window minima — step k's conditional min reads step
    // k-1's column inside the SAME user partition, so the whole chain
    // is ONE fact shuffle (hashpartitioning(user_id)) + one local sort,
    // with each extra funnel step adding only a WindowExec pass over
    // already-partitioned rows. (The join-per-step formulation re-scans
    // and re-shuffles the fact once per step; plan-audited: no Join,
    // exactly one fact exchange.)
    QueryDef(
      "q_events_funnel_ordered",
      t => {
        val byUser = Window.partitionBy(col("user_id"))
        val w = t.events.select(col("user_id"), col("event_type"), col("ts"))
          .withColumn("t_view",
            min(when(col("event_type") === "view", col("ts"))).over(byUser))
          .withColumn("t_click",
            min(when(col("event_type") === "click" && col("ts") > col("t_view"),
              col("ts"))).over(byUser))
          .withColumn("t_purchase",
            min(when(col("event_type") === "purchase" && col("ts") > col("t_click"),
              col("ts"))).over(byUser))
        // One row per user (no exchange: already partitioned by user).
        val p = w.groupBy(col("user_id"))
          .agg(max(col("t_view")).as("t_view"), max(col("t_click")).as("t_click"),
            max(col("t_purchase")).as("t_purchase"))
        p.select(
          count(lit(1)).as("users_total"),
          count(col("t_view")).as("did_view"),
          count(col("t_click")).as("view_then_click"),
          count(col("t_purchase")).as("full_funnel"))
          .selectExpr(
            "CAST(users_total AS BIGINT) AS users_total",
            "CAST(did_view AS BIGINT) AS did_view",
            "CAST(view_then_click AS BIGINT) AS view_then_click",
            "CAST(full_funnel AS BIGINT) AS full_funnel",
            "round(full_funnel / CAST(users_total AS DOUBLE), 6) AS conversion")
      },
      Some("""
        WITH v AS (
          SELECT user_id,
            min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
          FROM events GROUP BY user_id
        ),
        c AS (
          SELECT e.user_id, max(v.t_view) AS t_view,
            min(CASE WHEN e.event_type = 'click' AND e.ts > v.t_view THEN e.ts END) AS t_click
          FROM events e JOIN v USING (user_id) GROUP BY e.user_id
        ),
        p AS (
          SELECT e.user_id, max(c.t_view) AS t_view, max(c.t_click) AS t_click,
            min(CASE WHEN e.event_type = 'purchase' AND e.ts > c.t_click THEN e.ts END) AS t_purchase
          FROM events e JOIN c USING (user_id) GROUP BY e.user_id
        )
        SELECT
          CAST(count(*) AS BIGINT) AS users_total,
          CAST(count(t_view) AS BIGINT) AS did_view,
          CAST(count(t_click) AS BIGINT) AS view_then_click,
          CAST(count(t_purchase) AS BIGINT) AS full_funnel,
          round(count(t_purchase) / CAST(count(*) AS DOUBLE), 6) AS conversion
        FROM p""")),

    // Retention cohorts: users grouped by first-activity week, counted
    // again in each subsequent week they return — the warehouse
    // retention matrix. First-activity is one groupBy(user); the matrix
    // is one groupBy(cohort, week_offset) over the (user, week) distinct
    // activity — two shuffles total, independent of the week count.
    QueryDef(
      "q_events_retention",
      t => {
        val firstWeek = t.events
          .groupBy(col("user_id"))
          .agg(min(expr("CAST(floor(datediff(CAST(ts AS DATE), DATE '2024-01-01') / 7) AS BIGINT)")).as("cohort_week"))
        val activity = t.events
          .selectExpr("user_id",
            "CAST(floor(datediff(CAST(ts AS DATE), DATE '2024-01-01') / 7) AS BIGINT) AS active_week")
          .distinct()
        activity.join(firstWeek, Seq("user_id"))
          .groupBy(col("cohort_week"),
            (col("active_week") - col("cohort_week")).as("week_offset"))
          .agg(countDistinct(col("user_id")).as("active_users"))
          .selectExpr("cohort_week", "week_offset",
            "CAST(active_users AS BIGINT) AS active_users")
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some("""
        WITH fw AS (
          SELECT user_id,
            min(CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS BIGINT)) AS cohort_week
          FROM events GROUP BY user_id
        ),
        act AS (
          SELECT DISTINCT user_id,
            CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS BIGINT) AS active_week
          FROM events
        )
        SELECT fw.cohort_week,
               act.active_week - fw.cohort_week AS week_offset,
               CAST(count(DISTINCT act.user_id) AS BIGINT) AS active_users
        FROM act JOIN fw USING (user_id)
        GROUP BY fw.cohort_week, week_offset
        ORDER BY cohort_week, week_offset"""))
  )
}
