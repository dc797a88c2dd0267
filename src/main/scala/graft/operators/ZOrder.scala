package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Morton (Z-order) clustering: a compaction layout whose files prune
  * on TWO independent keys at once. Range-clustering on (a, b) gives
  * tight per-file manifest bounds on `a` only — every file spans b's
  * whole domain unless b correlates with a — so a table probed by BOTH
  * a time slice and a key lookup (the fact store: `factsInRange` on ts,
  * the ST2 idempotence probe on event_id) keeps pruning for one access
  * path and anti-scans for the other after every fold. Interleaving the
  * bits of the two keys' RANK positions (Delta's OPTIMIZE ZORDER does
  * the same over range-partition ids) makes each z-contiguous file a
  * small rectangle in (a, b) space: min/max bounds narrow on both
  * columns, so both probes skip files ([[graft.sources.TxTable]] stats
  * pruning needs nothing new — z-order only changes WHICH rows share a
  * file).
  *
  * Rank space, not value space: ntile positions are skew-immune (a hot
  * key or a sparse range can't collapse the grid) and monotone in the
  * value, so per-file value bounds stay narrow wherever the data is
  * dense. The price is two extra bounded shuffle passes
  * ([[RankOps.withGlobalNtile]] per key) before the z repartition —
  * maintenance-time cost, the read-side win is permanent.
  */
object ZOrder {

  /** Tiles per key: 2^16 ranks each, interleaved into a 32-bit z —
    * finer than any realistic file count (pruning granularity is files,
    * and 65536² grid cells ≫ files even at 100 TB). */
  val Tiles: Int = 1 << 16

  /** x (low 32 bits) spread to the even bit positions — the classic
    * Morton bit-twiddle as built-in codegen'd column ops. */
  private def spread(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** The Morton code of two non-negative ints (a in the even bits, b in
    * the odd): z-adjacent values are (a, b)-rectangle-adjacent. */
  def zvalue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Result-transparent z-order layout for [[graft.sources.TxTable
    * .compactDirs]]: rank-bucket each key with the distributed exact
    * ntile, range-partition the fold into `parts` files by the Morton
    * code of the two rank positions, drop the helper columns (the
    * schema must round-trip exactly — compaction is layout maintenance,
    * not a data change). The ntile's internal sort caches land in
    * `caches`; the caller unpersists them after the terminal write
    * ([[graft.CacheJanitor]] discipline — the layout fn is consumed
    * lazily inside the compaction, so it cannot release them itself). */
  def clusterTracked(parts: Int, a: Column, b: Column,
                     caches: scala.collection.mutable.ArrayBuffer[DataFrame],
                     tiles: Int = Tiles): DataFrame => DataFrame = { df =>
    val ta = RankOps.withGlobalNtileTracked(df, Seq(a), "__za", tiles, 0, caches)
    val tb = RankOps.withGlobalNtileTracked(ta, Seq(b), "__zb", tiles, 0, caches)
    tb.withColumn("__z",
        zvalue(col("__za").cast("long") - 1, col("__zb").cast("long") - 1))
      .repartitionByRange(math.max(1, parts), col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__za", "__zb", "__z")
  }
}
