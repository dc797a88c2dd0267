package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (SURVEY.md §4 / 100 TB posture): when one
  * join or group key carries a disproportionate share of rows, the
  * single reducer owning it becomes the job's wall-clock. AQE's skew
  * handling splits oversized SHUFFLE partitions; these operators handle
  * the cases AQE cannot — broadcast-ineligible skewed joins and
  * straggler-free pre-aggregation — by salting the hot side explicitly.
  */
object SkewOps {

  /** Equi-join `big ⋈ small` where `big`'s key is skewed and `small` is
    * too large to broadcast: salt the big side into `saltFactor`
    * sub-keys (deterministic hash of the full row, no rand()), replicate
    * the small side once per salt, and join on (key, salt). The hot key's
    * rows spread across `saltFactor` reducers at the cost of
    * `saltFactor`× the small side (still ≪ big side by assumption).
    */
  def saltedJoin(big: DataFrame, bigKey: Column,
                 small: DataFrame, smallKey: Column,
                 saltFactor: Int): DataFrame = {
    val bigS = big.withColumn("__salt",
      pmod(hash(struct(big.columns.map(col).toSeq: _*)), lit(saltFactor)))
    val saltDomain = explode(sequence(lit(0), lit(saltFactor - 1)))
    val smallS = small.withColumn("__salt", saltDomain)
    bigS.join(smallS, bigKey === smallKey && bigS("__salt") === smallS("__salt"))
      .drop("__salt")
  }

  /** Two-phase aggregation under key skew: partial aggregate on
    * (key, salt), then final aggregate on key. Spark's hash aggregate is
    * already partial+final; explicit salting additionally splits a hot
    * key's FINAL-stage row group across reducers — relevant when the
    * per-key state is wide (e.g. large collect/distinct sketches).
    *
    * @param partialAggs (colName → partial expr over raw rows)
    * @param finalAggs   (colName → final expr over partial columns)
    */
  def saltedAgg(df: DataFrame, key: Column, saltFactor: Int,
                partialAggs: Seq[(String, Column)],
                finalAggs: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(struct(df.columns.map(col).toSeq: _*)), lit(saltFactor)))
    val partial = salted.groupBy(key.as("__k"), col("__salt"))
      .agg(partialAggs.head._2.as(partialAggs.head._1),
        partialAggs.tail.map { case (n, c) => c.as(n) }: _*)
    partial.groupBy(col("__k"))
      .agg(finalAggs.head._2.as(finalAggs.head._1),
        finalAggs.tail.map { case (n, c) => c.as(n) }: _*)
  }
}
