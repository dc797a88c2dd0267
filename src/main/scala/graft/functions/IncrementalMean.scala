package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` for the streaming running mean (SURVEY.md §7.3's
  * optional custom aggregate; reference streaming/consumer.py:436).
  *
  * The reference updates `avg = (avg*n + s)/(n+1)` per event — a
  * SEQUENTIAL recurrence that drifts once the seed is wrong (it seeds
  * from `dim_business.stars`, SURVEY §7.4.3) and that cannot be merged
  * across partitions. The distributed-correct form keeps the exact
  * (sum, count) pair — associative, commutative, mergeable — and
  * divides once at the end; decimal sum keeps it order-independent.
  * [[referenceRunningMean]] reproduces the reference's sequential
  * arithmetic for the documented-divergence comparison.
  */
object IncrementalMean extends Aggregator[Double, (java.math.BigDecimal, Long), Double] {

  private val Scale = 9

  override def zero: (java.math.BigDecimal, Long) =
    (java.math.BigDecimal.ZERO.setScale(Scale), 0L)

  override def reduce(b: (java.math.BigDecimal, Long), v: Double): (java.math.BigDecimal, Long) =
    (b._1.add(java.math.BigDecimal.valueOf(v).setScale(Scale, java.math.RoundingMode.HALF_UP)), b._2 + 1)

  override def merge(a: (java.math.BigDecimal, Long), b: (java.math.BigDecimal, Long)): (java.math.BigDecimal, Long) =
    (a._1.add(b._1), a._2 + b._2)

  override def finish(b: (java.math.BigDecimal, Long)): Double =
    if (b._2 == 0) Double.NaN else b._1.doubleValue() / b._2

  override def bufferEncoder: Encoder[(java.math.BigDecimal, Long)] =
    Encoders.tuple(Encoders.DECIMAL.asInstanceOf[Encoder[java.math.BigDecimal]], Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** The reference's per-event recurrence, verbatim semantics: seedAvg /
    * seedN prime the state (that seeding is the drift source). Sequential
    * by construction — NOT distributable; exists to quantify divergence.
    */
  def referenceRunningMean(seedAvg: Double, seedN: Long, values: Seq[Double]): Double =
    values.foldLeft((seedAvg, seedN)) { case ((avg, n), s) =>
      ((avg * n + s) / (n + 1), n + 1)
    }._1
}
