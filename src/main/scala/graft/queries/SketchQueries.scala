package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef

/** Approximate-analytics sketches over the `events` stream — the
  * bounded-state summaries a 100 TB pipeline uses where exact
  * distinct/quantile aggregation would shuffle the full key set
  * (reference analogue: the dashboard's distinct/summary counters,
  * webapp/mysql_routes.py:200-260, which MySQL computes exactly because
  * its data fits one node).
  *
  * Two tiers:
  *   - `q_sketch_kmv_distinct` — a KMV (k-minimum-values) distinct-count
  *     sketch whose hash is md5-derived and therefore BIT-REPRODUCIBLE
  *     across engines: the DuckDB oracle recomputes the same k-min set
  *     and the same estimate, so even the *approximation* is
  *     hash-checked. State per group is k longs (graft_kmin native
  *     aggregate, map-side partial, mergeable).
  *   - `q_sketch_builtin` — Spark's own HLL++ / KLL sketches
  *     (`approx_count_distinct`, `percentile_approx`): engine-specific
  *     layouts, so the query emits deterministic error-BOUND booleans
  *     (sketch within 3σ / rank-bracket of exact) that the DuckDB twin
  *     replays as TRUE literals — the hash gate then checks the bounds.
  */
object SketchQueries {

  /** 60-bit uniform hash both engines can compute bit-identically:
    * first 15 hex chars of md5 of the decimal string. */
  private val sparkH =
    "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
  private val duckH =
    "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"

  private val K = 64

  val defs: Seq[QueryDef] = Seq(

    // KMV distinct sketch, oracle-checked INCLUDING the estimate: both
    // engines hash users to uniform 60-bit values, keep the K smallest
    // distinct per event type, and estimate distinct = (K-1)·2^60/kth.
    // Spark keeps the k-min set in bounded aggregate state (graft_kmin);
    // the oracle reproduces it with a window top-K over distinct hashes.
    QueryDef(
      "q_sketch_kmv_distinct",
      t => t.events
        .selectExpr("event_type", "user_id", s"$sparkH AS h")
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("exact_distinct"),
          expr(s"graft_kmin(h, $K)").as("kmin"))
        .selectExpr(
          "event_type",
          "CAST(exact_distinct AS BIGINT) AS exact_distinct",
          s"CAST(size(kmin) AS BIGINT) AS k_filled",
          s"""CAST(CASE WHEN size(kmin) < $K THEN size(kmin)
              ELSE CAST(round(${K - 1}.0 * pow(2.0, 60) / CAST(element_at(kmin, $K) AS DOUBLE)) AS BIGINT)
              END AS BIGINT) AS kmv_estimate""")
        .orderBy(col("event_type")),
      Some(s"""
        WITH h AS (
          SELECT DISTINCT event_type, $duckH AS h FROM events
        ),
        r AS (
          SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n_distinct
          FROM h
        ),
        k AS (
          SELECT event_type,
                 least(max(n_distinct), $K) AS k_filled,
                 max(CASE WHEN rn = $K THEN h END) AS kth
          FROM r WHERE rn <= $K GROUP BY event_type
        ),
        e AS (
          SELECT event_type, count(DISTINCT user_id) AS exact_distinct
          FROM events GROUP BY event_type
        )
        SELECT e.event_type,
          CAST(e.exact_distinct AS BIGINT) AS exact_distinct,
          CAST(k.k_filled AS BIGINT) AS k_filled,
          CAST(CASE WHEN k.k_filled < $K THEN k.k_filled
            ELSE CAST(round(${K - 1}.0 * pow(2.0, 60) / CAST(k.kth AS DOUBLE)) AS BIGINT)
            END AS BIGINT) AS kmv_estimate
        FROM e JOIN k USING (event_type)
        ORDER BY event_type""")),

    // Count-min sketch heavy hitters: per-user event counts estimated
    // from a 4×256 counter matrix (CMS rows = independent md5-derived
    // hashes; estimate = min over rows — always ≥ exact). The build is
    // ONE shuffle whose key space is the 1 024 counters regardless of
    // user cardinality — the bounded-state alternative to a full
    // groupBy(user) at 100 TB. Estimates are md5-deterministic, so the
    // oracle reproduces the counter matrix and every estimate exactly.
    QueryDef(
      "q_sketch_cms_heavy_hitters",
      t => {
        val W = 256
        val D = 4
        val cell =
          s"pmod(CAST(conv(substr(md5(concat(CAST(r AS STRING), '|', CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT), $W)"
        val ev = t.events.select(col("user_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cms = ev
          .selectExpr("user_id", s"explode(sequence(0, ${D - 1})) AS r")
          .selectExpr("r", s"$cell AS c")
          .groupBy(col("r"), col("c")).agg(count(lit(1)).as("cnt"))
        val top = ev.groupBy(col("user_id"))
          .agg(count(lit(1)).as("exact_cnt"))
          .orderBy(col("exact_cnt").desc, col("user_id"))
          .limit(20)
        top
          .selectExpr("user_id", "exact_cnt", s"explode(sequence(0, ${D - 1})) AS r")
          .selectExpr("user_id", "exact_cnt", "r", s"$cell AS c")
          .join(broadcast(cms), Seq("r", "c"))
          .groupBy(col("user_id"), col("exact_cnt"))
          .agg(min(col("cnt")).as("cms_cnt"))
          .selectExpr("user_id", "CAST(exact_cnt AS BIGINT) AS exact_cnt",
            "CAST(cms_cnt AS BIGINT) AS cms_cnt",
            "CAST(cms_cnt - exact_cnt AS BIGINT) AS overcount")
          .orderBy(col("exact_cnt").desc, col("user_id"))
          .transform(out => graft.CacheJanitor.afterTerminalAction(out, Seq(ev)))
      },
      Some(s"""
        WITH cells AS (
          SELECT user_id, r,
            ('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 256 AS c
          FROM events, (SELECT unnest(generate_series(0, 3)) AS r)
        ),
        cms AS (SELECT r, c, count(*) AS cnt FROM cells GROUP BY r, c),
        top AS (
          SELECT user_id, count(*) AS exact_cnt FROM events
          GROUP BY user_id ORDER BY exact_cnt DESC, user_id LIMIT 20
        ),
        est AS (
          SELECT t.user_id, t.exact_cnt, min(m.cnt) AS cms_cnt
          FROM top t
          JOIN cells ce ON ce.user_id = t.user_id
          JOIN cms m ON m.r = ce.r AND m.c = ce.c
          GROUP BY t.user_id, t.exact_cnt
        )
        SELECT user_id, CAST(exact_cnt AS BIGINT) AS exact_cnt,
               CAST(cms_cnt AS BIGINT) AS cms_cnt,
               CAST(cms_cnt - exact_cnt AS BIGINT) AS overcount
        FROM est ORDER BY exact_cnt DESC, user_id""")),

    // Spark's built-in sketches: HLL++ distinct + KLL-style quantiles.
    // The sketch layouts are engine-specific, so raw sketch outputs can
    // never hash-match another engine — instead the query emits
    // deterministic BOUND columns: booleans asserting each sketch lands
    // inside an error envelope computed from EXACT aggregation in the
    // same pass. The DuckDB twin computes the exact side and emits TRUE
    // literals — a drifting sketch flips a boolean and fails the hash
    // gate, which is precisely the contract a sketch can honor.
    //   - hll_ok: |HLL − exact| ≤ 3σ = 3·rsd·exact (rsd = 0.02).
    //   - p50_ok/p95_ok: percentile_approx(accuracy 1000 ⇒ rank error
    //     ≤ 0.1%) returns a data element whose value must sit between
    //     the exact data elements at rank h ± max(1% of n, 1 rank) — a
    //     10× margin, floored at one rank so tiny groups keep a
    //     non-degenerate envelope.
    QueryDef(
      "q_sketch_builtin",
      t => {
        // Exact bracket VALUES via the distributed ranking machinery
        // (no buffering percentile aggregate — the error-bound harness
        // must not itself carry a does-not-scale aggregation buffer):
        // element values at local ranks h ± max(1% of n, 1 rank),
        // h = (n−1)q. The ±1-rank floor keeps the envelope meaningful
        // on tiny groups, where a pure rank-fraction bracket collapses
        // below one element and can exclude the element the sketch
        // correctly returns. groupedValuesAtRanks is TWO passes over
        // the sorted frame (fused span/offset aggregate + boundary
        // fetch) — the cheapest exact formulation.
        def bracketRanks(n: Long): Seq[(Double, Long, Long)] =
          Seq(0.5, 0.95).map { q =>
            val h = (n - 1) * q
            val d = math.max(0.01 * (n - 1), 1.0)
            (q, math.max(0L, math.floor(h - d).toLong),
              math.min(n - 1L, math.ceil(h + d).toLong))
          }
        val brackets = graft.operators.RankOps.groupedValuesAtRanks(
          t.events, col("event_type"), col("value"),
          n => bracketRanks(n).flatMap(x => Seq(x._2, x._3)))
        val bracket = (q: Double, hi: Boolean) => brackets.toSeq
          .map { case (g, (n, vals)) =>
            val (_, lo, up) = bracketRanks(n).find(_._1 == q).get
            s"WHEN '$g' THEN CAST('${vals(if (hi) up else lo)}' AS DOUBLE)" }
          .mkString("CASE event_type ", " ", " END")
        // The exact-distinct side runs as its OWN aggregate joined back
        // on the 4 group rows: countDistinct mixed into the sketch
        // aggregate forces Catalyst's EXPAND plan (every row duplicated
        // per distinct group) — measured 3× the cost of the two
        // aggregates run separately.
        val sketches = t.events
          .groupBy(col("event_type"))
          .agg(
            approx_count_distinct(col("user_id"), rsd = 0.02).as("hll"),
            percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50s"),
            percentile_approx(col("value"), lit(0.95), lit(1000)).as("p95s"))
        val exact = t.events.select(col("event_type"), col("user_id")).distinct()
          .groupBy(col("event_type")).agg(count(lit(1)).as("exact_d"))
        sketches.join(exact, Seq("event_type"))
          .selectExpr(
            "event_type",
            "CAST(exact_d AS BIGINT) AS exact_distinct",
            "abs(CAST(hll AS DOUBLE) - CAST(exact_d AS DOUBLE)) <= 0.06 * CAST(exact_d AS DOUBLE) AS hll_ok",
            s"p50s BETWEEN ${bracket(0.5, false)} AND ${bracket(0.5, true)} AS p50_ok",
            s"p95s BETWEEN ${bracket(0.95, false)} AND ${bracket(0.95, true)} AS p95_ok")
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type,
          CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
          TRUE AS hll_ok, TRUE AS p50_ok, TRUE AS p95_ok
        FROM events GROUP BY event_type ORDER BY event_type""")),
  )
}
