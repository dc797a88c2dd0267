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

  /** Random-hyperplane LSH bucket key (SimHash for vectors): `planes`
    * Rademacher hyperplanes w_j with w_j[i] = +1 iff the first hex digit
    * of md5(j || '_' || i) is 0-7 (deterministic, engine-portable), and
    * bit j of the key = [dot(e, w_j) >= 0]. Signed-dot through exact
    * decimals so both engines compute the SAME bucket even when a dot
    * sits at ±1e-15. Cosine-similar vectors agree on most bits, so
    * near-dup candidates collide on the full key; the quadratic compare
    * never happens across buckets.
    */
  def lshBucket(e: String, planes: Int, dim: Int): String = {
    val bits = (0 until planes).map { j =>
      val signedSum =
        s"""CAST(aggregate(transform(sequence(0, ${dim - 1}),
           |  i -> CAST(CASE WHEN instr('01234567', substring(md5(concat('$j', '_', CAST(i AS STRING))), 1, 1)) > 0
           |            THEN element_at($e, i + 1) ELSE -element_at($e, i + 1) END AS DECIMAL(30,15))),
           |  CAST(0 AS DECIMAL(38,15)), (acc, v) -> CAST(acc + v AS DECIMAL(38,15))) AS DOUBLE)""".stripMargin
      s"(CASE WHEN $signedSum >= 0 THEN ${1 << j} ELSE 0 END)"
    }
    bits.mkString("(", " + ", ")")
  }

  /** DuckDB twin of [[lshBucket]]. */
  def duckLshBucket(e: String, planes: Int, dim: Int): String = {
    val bits = (0 until planes).map { j =>
      val signedSum =
        s"""CAST(list_sum([ CAST(CASE WHEN strpos('01234567', substr(md5('${j}_' || CAST(i AS VARCHAR)), 1, 1)) > 0
           |  THEN $e[i + 1] ELSE -$e[i + 1] END AS DECIMAL(30,15))
           |  for i in generate_series(0, ${dim - 1}) ]) AS DOUBLE)""".stripMargin
      s"(CASE WHEN $signedSum >= 0 THEN ${1 << j} ELSE 0 END)"
    }
    bits.mkString("(", " + ", ")")
  }

  // ---- DuckDB oracle twins (same math, DuckDB list syntax) ----

  /** DuckDB: exact decimal dot product of two DOUBLE[] expressions. */
  def duckDot(a: String, b: String, dim: Int): String =
    s"""CAST(list_sum([ CAST($a[i] * $b[i] AS DECIMAL(30,15))
       |                for i in generate_series(1, $dim) ]) AS DOUBLE)""".stripMargin

  def duckNormSq(a: String, dim: Int): String = duckDot(a, a, dim)
}
