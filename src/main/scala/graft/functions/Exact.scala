package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent, cross-engine-stable numeric aggregation.
  *
  * Floating-point `sum`/`avg` results depend on accumulation order, which
  * differs run-to-run under parallelism and engine-to-engine (Spark vs the
  * DuckDB oracle). Routing each value through an exact DECIMAL before
  * summing makes the aggregate order-independent and bit-identical across
  * engines; the final cast back to double is a single deterministic
  * rounding. The per-row double→decimal cast is itself deterministic
  * (same IEEE value → same decimal in both engines).
  *
  * At 100 TB this costs nothing extra: decimal sum is still a map-side
  * partial aggregate and stays inside whole-stage codegen.
  */
object Exact {

  /** Exact sum of a double column via decimal(18,scale), returned as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Order-independent mean: exact decimal sum divided by count. */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)

  /** SQL fragment mirroring [[dsum]] for the DuckDB oracle. */
  def sqlSum(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** SQL fragment mirroring [[davg]]. */
  def sqlAvg(expr: String, scale: Int = 2): String =
    s"${sqlSum(expr, scale)} / COUNT($expr)"
}
