package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed fact keys.
  *
  * A hash-shuffle join sends every fact row with the same key to ONE
  * reducer; a hot key (one user producing 1% of a 100 TB event stream)
  * turns that reducer into the straggler that dominates the stage. AQE's
  * skew-join split handles the SORT-MERGE case adaptively, but only
  * after materializing skewed shuffle blocks; salting fixes the layout
  * at plan time and also composes with bucketed/pre-partitioned layouts
  * where AQE's splitting does not apply.
  *
  * Shape: the fact side gets a deterministic salt in [0, n) derived from
  * a caller-supplied spread expression (a unique-ish column — event id,
  * row content hash), widening the join key to (key, salt); the dim side
  * is exploded n× so every (key, salt) cell finds its dim row. A hot
  * fact key now spreads over n reducers; the dim side grows n× (dims are
  * the small side by construction — n·|dim| rows is still tiny next to
  * the fact shuffle it de-skews).
  *
  * Inner-join equivalence to the unsalted join holds when `dimKey` is
  * unique in `dim` (each fact row matches exactly the one salt copy it
  * carries) — asserted in SkewJoinSpec.
  */
object SkewJoin {

  /** Inner-join `fact` to `dim` on fact(`factKey`) = dim(`dimKey`),
    * salted `n` ways. `spread` must be deterministic per fact row (NOT
    * rand(): a retried task would re-salt differently and drop/dup rows).
    * Dim columns win name clashes; the dim key column is dropped.
    */
  def salted(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
             spread: Column, n: Int): DataFrame = {
    require(n > 0, s"salt fan-out must be positive, got $n")
    val sf = fact.withColumn("_graft_salt_f", pmod(spread.cast("long"), lit(n.toLong)))
    val sd = dim
      .withColumn("_graft_salt_d", explode(sequence(lit(0L), lit(n.toLong - 1))))
    sf.join(
        sd,
        sf(factKey) === sd(dimKey) && sf("_graft_salt_f") === sd("_graft_salt_d"))
      .drop("_graft_salt_f", "_graft_salt_d")
      .drop(sd(dimKey))
  }
}
