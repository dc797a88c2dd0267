package graft.operators

/** Embedding-vector primitives for similarity search (beyond-reference:
  * the reference has no vector operations; this is the ANN surface a
  * training-data pipeline needs).
  *
  * All arithmetic routes each elementwise product through an exact
  * DECIMAL(30,15) before summation, making dot products and norms
  * order-independent and bit-identical across engines (same rationale as
  * [[graft.functions.Exact]] — IEEE double accumulation depends on
  * order; decimals don't). The per-element double→decimal cast is a
  * deterministic rounding of the same IEEE value in both Spark and the
  * DuckDB oracle. Final cosine values are surfaced `round(..., 6)` so
  * any residual last-ulp difference in rounding mode cannot leak into
  * output or ranking.
  *
  * Everything is a higher-order function over the array column —
  * map-side, no explode, no shuffle until candidates are joined.
  */
object VectorOps {

  /** Exact decimal dot product of two array<double> fragments → double. */
  def dot(a: String, b: String): String =
    s"""CAST(aggregate(
       |  zip_with($a, $b, (x, y) -> CAST(x * y AS DECIMAL(30,15))),
       |  CAST(0 AS DECIMAL(38,15)),
       |  (acc, v) -> CAST(acc + v AS DECIMAL(38,15))) AS DOUBLE)""".stripMargin
  // The inner re-cast keeps the accumulator type closed under addition
  // (Spark widens (38,15)+(30,15) to (38,14)); it is exact — unit-vector
  // sums never approach the 23 integer digits available.

  /** Exact squared L2 norm of an array<double> fragment → double. */
  def normSq(a: String): String = dot(a, a)

  /** Plain double-accumulation dot product — NOT order-stable, so never
    * surfaced in results; used only as a cheap prefilter with a safety
    * margin before the exact decimal verify (double vs decimal differ by
    * ≲1e-12 relative on unit-scale vectors, margins are set ≫ that).
    * ~10× cheaper than the decimal path (no BigDecimal allocation).
    */
  def dotApprox(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  /** Cosine similarity given precomputed squared norms. */
  def cosine(dotCol: String, nsqA: String, nsqB: String): String =
    s"$dotCol / (sqrt($nsqA) * sqrt($nsqB))"

  // ---- DuckDB oracle twins (same math, DuckDB list syntax) ----

  /** DuckDB: exact decimal dot product of two DOUBLE[] expressions. */
  def duckDot(a: String, b: String, dim: Int): String =
    s"""CAST(list_sum([ CAST($a[i] * $b[i] AS DECIMAL(30,15))
       |                for i in generate_series(1, $dim) ]) AS DOUBLE)""".stripMargin

  def duckNormSq(a: String, dim: Int): String = duckDot(a, a, dim)
}
