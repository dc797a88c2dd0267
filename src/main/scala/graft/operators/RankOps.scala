package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed exact ranking: global row_number / ntile over a UNIQUE
  * total order without the single-task sort an unpartitioned
  * `Window.orderBy` collapses to (Spark plans it as
  * `Exchange SinglePartition` + one sorting task — a straight OOM/stall
  * once the ranked frame is a billion rows).
  *
  * Shape: range-repartition on the order key (a distributed sort — the
  * same exchange a global ORDER BY uses), sort within partitions, then
  * global position = per-partition offset + local position. The offsets
  * come from ONE count per range partition — bounded driver state
  * (numShufflePartitions rows, never data rows) riding back as a plan
  * literal. Local position is `monotonically_increasing_id`'s low bits,
  * which Spark assigns in row order within each partition — evaluated
  * ABOVE the local sort, so it is the sorted position (the classic
  * zipWithIndex shape, kept inside whole-stage codegen; equality with
  * the window formulation is spec-asserted, see RankOpsSpec).
  *
  * The ordering MUST be unique (tiebreak on a key column) — that is
  * what makes the rank, and therefore every downstream tile boundary,
  * deterministic and engine-replayable.
  */
object RankOps {

  private val LocalBits = 33 // monotonically_increasing_id: pid << 33 | local

  /** Above this many boundary ranks the literal `isin` list stops being
    * a sane plan node (it is compiled into the predicate); fetch via a
    * broadcast semi-join on a ranks frame instead. Keeps the operator's
    * contract self-enforcing when a caller passes a high-cardinality
    * grouping (2·|qs|·|groups| boundary ranks). */
  private[operators] val IsinFetchMax = 512

  /** Fetch the `__v` value at each needed global rank. Small lists ride
    * as an `isin` literal (partition-prunable after the range sort);
    * large lists become a broadcast semi-join so the plan never carries
    * a multi-thousand-entry predicate. Either way the collect is
    * ≤ |need| boundary rows — bounded driver state by construction. */
  private def fetchRankValues(rn: DataFrame, need: Seq[Long]): Map[Long, Double] = {
    val picked =
      if (need.size <= IsinFetchMax) rn.filter(col("__rn").isin(need: _*))
      else {
        val spark = rn.sparkSession
        import spark.implicits._
        rn.join(broadcast(need.toDF("__rn")), Seq("__rn"), "left_semi")
      }
    picked.select(col("__rn"), col("__v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  /** `df` plus `out` = exact 1-based global row number in the `order`
    * total order. The returned frame is persisted (the range shuffle
    * feeds both the offsets count and the main plan); use the Tracked
    * variant + graft.CacheJanitor to release it after the caller's
    * terminal action. */
  def withGlobalRowNumber(df: DataFrame, order: Seq[Column], out: String,
                          partitions: Int = 0): DataFrame =
    withGlobalRowNumberAndTotal(df, order, out, partitions)._1

  /** Also returns the total row count — already known from the offsets
    * pass, so tile arithmetic does not need a second action. */
  def withGlobalRowNumberAndTotal(df: DataFrame, order: Seq[Column], out: String,
                                  partitions: Int = 0): (DataFrame, Long) =
    withGlobalRowNumberTracked(df, order, out, partitions,
      scala.collection.mutable.ArrayBuffer.empty[DataFrame])

  /** As above, but the internal persist handle (the range-sorted frame
    * both the offsets count and the ranked plan read) lands in `caches`
    * so the caller can unpersist it once its boundary fetches are done —
    * the percentile helpers below return pure driver values and release
    * it before returning; lazy consumers hand it to graft.CacheJanitor. */
  def withGlobalRowNumberTracked(df: DataFrame, order: Seq[Column], out: String,
                                 partitions: Int,
                                 caches: scala.collection.mutable.ArrayBuffer[DataFrame])
      : (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    caches += sorted
    // One row per RANGE PARTITION (≤ numShufflePartitions) — bounded
    // driver state regardless of data size.
    val counts = sorted
      .select(shiftright(col("__mid"), LocalBits).cast("int").as("__pid"))
      .groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = new Array[Long](parts)
    var acc = 0L
    var p = 0
    while (p < parts) {
      offsets(p) = acc
      acc += counts.getOrElse(p, 0L)
      p += 1
    }
    // Offsets ride as a tiny plan-literal map: global rn is a pure
    // map-side projection — no join, no window, no extra exchange.
    val offMap = map_from_arrays(
      array((0 until parts).map(i => lit(i)): _*),
      array(offsets.map(lit): _*))
    val rn = sorted
      .withColumn(out,
        element_at(offMap, shiftright(col("__mid"), LocalBits).cast("int")) +
          (col("__mid").bitwiseAND(lit((1L << LocalBits) - 1))) + lit(1L))
      .drop("__mid")
    (rn, acc)
  }

  /** Exact interpolated percentiles (type-7, the `percentile` /
    * `quantile_cont` definition: h = (n−1)q + 1 over the sorted values,
    * linear interpolation between ranks ⌊h⌋ and ⌈h⌉) computed WITHOUT
    * buffering the value set: Spark's exact `percentile` aggregate
    * holds every value of the group in ONE aggregation buffer — a
    * straight OOM once the ranked frame is a billion rows — whereas
    * this is a distributed range sort + a filter to the ≤ 2·|qs|
    * boundary ranks (bounded driver state). Ties need no rule: rank
    * positions are unique even when values repeat.
    *
    * Returns (n, q → value); NaN values when the frame is empty. The
    * interpolation arithmetic matches both engines' formula shape
    * (lower + frac·(upper − lower), IEEE-exact given exact inputs).
    *
    * NULL values are dropped before ranking (and n counts only non-null
    * rows) — the semantics of the aggregates this replaces: Spark's
    * `percentile` and DuckDB's `quantile_cont` both ignore NULLs, so a
    * drop-in replacement must too (ranking them would inflate n and can
    * land a boundary rank on a NULL row).
    */
  def exactPercentiles(df: DataFrame, value: Column, qs: Seq[Double],
                       partitions: Int = 0): (Long, Map[Double, Double]) = {
    val caches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val (rn, n) = withGlobalRowNumberTracked(
      df.select(value.cast("double").as("__v")).filter(col("__v").isNotNull),
      Seq(col("__v")), "__rn", partitions, caches)
    if (n == 0) { caches.foreach(_.unpersist()); return (0L, qs.map(_ -> Double.NaN).toMap) }
    // 0-based h = (n−1)·q, exactly the double expression Spark's
    // Percentile and DuckDB's quantile_cont evaluate — a 1-based
    // (h+1) variant differs in the last ulp after the extra add.
    val targets = qs.map { q =>
      val h = (n - 1) * q
      val lo = math.floor(h).toLong
      (q, lo + 1, math.min(lo + 2, n), h - lo)
    }
    val need = targets.flatMap(t => Seq(t._2, t._3)).distinct
    val vals = fetchRankValues(rn, need)
    // Everything returned is driver state — release the ranked frame's
    // cache now rather than leaking it into the session.
    caches.foreach(_.unpersist())
    val out = targets.map { case (q, lo, hi, f) =>
      q -> (vals(lo) + f * (vals(hi) - vals(lo)))
    }.toMap
    (n, out)
  }

  /** Grouped exact order statistics, distributed, in TWO passes over
    * the sorted frame: one global ranking ordered by (group, value) —
    * each group a CONTIGUOUS rank span, split across range partitions
    * when the group outgrows one (the scale property the buffering
    * `percentile` aggregate and even a partitioned window lack: no task
    * ever owns a whole group) — then the values at the caller-chosen
    * 0-based LOCAL ranks `ranks(groupCount)` of each group.
    *
    * Driver state is strictly tiered: the offsets pass collects ONE row
    * per range partition (never per group); group spans — count and
    * first global rank, the latter a distributed `min` of (partition
    * offset + in-partition position, read straight off
    * `monotonically_increasing_id`'s low bits) — aggregate in ONE
    * shuffle and collect one row per GROUP, which is the size of the
    * returned map itself (an operator returning a driver map cannot do
    * better; callers with result-scale group cardinality should keep
    * the spans frame distributed instead). The boundary fetch is
    * [[fetchRankValues]]: `isin` literal or broadcast semi-join above
    * [[IsinFetchMax]].
    *
    * NULLs are dropped before ranking (counts are non-null counts);
    * returns group → (count, localRank → value).
    */
  def groupedValuesAtRanks(df: DataFrame, group: Column, value: Column,
                           ranks: Long => Seq[Long], partitions: Int = 0)
      : Map[Any, (Long, Map[Long, Double])] = {
    val spark = df.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.select(group.as("__g"), value.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .repartitionByRange(parts, col("__g"), col("__v"))
      .sortWithinPartitions(col("__g"), col("__v"))
      .withColumn("__mid", monotonically_increasing_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val local = col("__mid").bitwiseAND(lit((1L << LocalBits) - 1))
    val pid = shiftright(col("__mid"), LocalBits).cast("int")
    // Pass 1 — partition offsets: ≤ `parts` rows of driver state,
    // independent of group cardinality.
    val pidTotals = sorted.select(pid.as("__pid"))
      .groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (pidTotals.isEmpty) { sorted.unpersist(); return Map.empty }
    val offsets = new Array[Long](parts)
    var acc = 0L
    var p = 0
    while (p < parts) {
      offsets(p) = acc
      acc += pidTotals.getOrElse(p, 0L)
      p += 1
    }
    val offMap = map_from_arrays(
      array((0 until parts).map(i => lit(i)): _*),
      array(offsets.map(lit): _*))
    // Pass 2 — group spans, aggregated DISTRIBUTED on the 0-based
    // global position (offset + local; group spans are contiguous after
    // the range sort, so min(position) is the span start): the collect
    // is one row per group — exactly the output's own cardinality.
    val gpos = (element_at(offMap, pid) + local).as("__p0")
    val spans = sorted.select(col("__g"), gpos)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), (min(col("__p0")) + 1L).as("start"))
      .collect().map(r => (r.get(0), r.getLong(1), r.getLong(2)))
    val targets = spans.flatMap { case (g, n, start) =>
      ranks(n).map(l => (g, l, start + l))
    }
    val rn = sorted.withColumn("__rn",
      element_at(offMap, pid) + local + lit(1L))
    val vals = fetchRankValues(rn, targets.map(_._3).distinct.toSeq)
    sorted.unpersist() // returned maps are pure driver state
    val byGroup = targets.groupBy(_._1)
    spans.map { case (g, n, _) =>
      g -> (n, byGroup(g).map { case (_, l, gr) => l -> vals(gr) }.toMap)
    }.toMap
  }

  /** Grouped exact type-7 percentiles — interpolation over
    * [[groupedValuesAtRanks]] (see there for the distribution shape;
    * boundary ranks per q are ⌊h⌋ and ⌈h⌉, h = (n−1)·q — the same
    * 0-based expression both engines evaluate, see [[exactPercentiles]]).
    * Intended for dimension-keyed groupings where |groups| is
    * driver-bounded. NULL values are dropped (group row counts are
    * non-null counts) — matching `percentile` / `quantile_cont`.
    *
    * Returns group → (group row count, q → value).
    */
  def exactPercentilesBy(df: DataFrame, group: Column, value: Column,
                         qs: Seq[Double], partitions: Int = 0)
      : Map[Any, (Long, Map[Double, Double])] = {
    def bounds(n: Long): Seq[(Double, Long, Long, Double)] = qs.map { q =>
      val h = (n - 1) * q
      val lo = math.floor(h).toLong
      (q, lo, math.min(lo + 1, n - 1), h - lo)
    }
    groupedValuesAtRanks(df, group, value, n => bounds(n).flatMap(t => Seq(t._2, t._3)),
        partitions)
      .map { case (g, (n, vals)) =>
        g -> (n, bounds(n).map { case (q, lo, hi, f) =>
          q -> (vals(lo) + f * (vals(hi) - vals(lo)))
        }.toMap)
      }
  }

  /** `df` plus `out` = ntile(`tiles`) over the unique `order` — same
    * semantics as `ntile(n).over(Window.orderBy(order))` (first
    * `total % n` tiles get the extra row), computed distributed:
    * boundaries are ARITHMETIC on the exact global row number, so no
    * quantile estimation and no tie ambiguity. */
  def withGlobalNtile(df: DataFrame, order: Seq[Column], out: String,
                      tiles: Int, partitions: Int = 0): DataFrame =
    withGlobalNtileTracked(df, order, out, tiles, partitions,
      scala.collection.mutable.ArrayBuffer.empty[DataFrame])

  /** As [[withGlobalNtile]], with the internal sort cache exposed via
    * `caches` — hand it to graft.CacheJanitor so a lazy consumer's
    * terminal action releases it instead of leaking it to the session. */
  def withGlobalNtileTracked(df: DataFrame, order: Seq[Column], out: String,
                             tiles: Int, partitions: Int,
                             caches: scala.collection.mutable.ArrayBuffer[DataFrame])
      : DataFrame = {
    require(tiles > 0, "tiles must be positive")
    val (rn, total) = withGlobalRowNumberTracked(df, order, "__rn", partitions, caches)
    val base = total / tiles
    val rem = total % tiles
    // ntile: first `rem` tiles have base+1 rows, the rest `base`.
    val cut = rem * (base + 1) // last row number inside the big tiles
    val tile =
      if (base == 0) col("__rn") // fewer rows than tiles: tile i = row i
      else when(col("__rn") <= cut, (col("__rn") - 1) / (base + 1) + 1)
        .otherwise(lit(rem) + (col("__rn") - cut - 1) / base + 1)
    rn.withColumn(out, tile.cast("int")).drop("__rn")
  }
}
