package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalMeanSpec extends SparkSpec {

  test("typed Aggregator equals the exact decimal mean, any partitioning") {
    val s = spark
    import s.implicits._
    val values = (1 to 500).map(i => (i % 7).toDouble + 0.25)
    val ds = values.toDS().repartition(7)
    val viaAgg = ds.select(IncrementalMean.toColumn).collect()(0)
    val viaExact = ds.toDF("v").agg(Exact.davg(col("v"), 9)).collect()(0).getDouble(0)
    assert(math.abs(viaAgg - viaExact) < 1e-12)
  }

  test("grouped usage through the typed API") {
    val s = spark
    import s.implicits._
    val ds = Seq((1L, 2.0), (1L, 4.0), (2L, 10.0)).toDS()
    val out = ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(IncrementalMean.toColumn)
      .collect().toMap
    assert(out(1L) == 3.0 && out(2L) == 10.0)
  }

  test("reference recurrence with a correct seed matches; with a wrong seed drifts") {
    val values = Seq(4.0, 2.0, 5.0, 3.0)
    val trueMean = values.sum / values.length
    // Seeded from nothing: exact.
    assert(math.abs(IncrementalMean.referenceRunningMean(0.0, 0L, values) - trueMean) < 1e-12)
    // Seeded from a stale stars value with claimed count 10 (what the
    // reference does): permanently biased — the documented divergence.
    val drifted = IncrementalMean.referenceRunningMean(4.5, 10L, values)
    assert(math.abs(drifted - trueMean) > 0.4)
  }
}
