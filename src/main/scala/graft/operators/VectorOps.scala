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

  /** Map-side nearest-centroid argmax over a centroid array column
    * `cents` — `array<struct<cl:bigint, c:array<double>, cnsq:double>>`
    * sorted by `cl` ascending — returning the best
    * `struct<cos:double, cl:bigint>` for vector `e` with squared norm
    * `nsq`. Strict `>` keeps the FIRST (smallest cl) cell on
    * rounded-cosine ties, the same winner as `ORDER BY cos DESC, cl`.
    *
    * This is the scale-correct coarse-quantizer assignment: the
    * centroid set rides along as one broadcast array row and each
    * vector folds over it IN PLACE — no N×k row amplification, no
    * window, no exchange (the crossJoin+row_number formulation it
    * replaces shuffled N×k rows to pick each argmax).
    */
  def nearestCentroid(cents: String, e: String, nsq: String): String =
    s"""aggregate(
       |  transform($cents, ct -> named_struct(
       |    'cos', round(${dot(e, "ct.c")} / (sqrt($nsq) * sqrt(ct.cnsq)), 6),
       |    'cl', ct.cl)),
       |  named_struct('cos', CAST(-2.0 AS DOUBLE), 'cl', CAST(-1 AS BIGINT)),
       |  (bacc, sc) -> IF(sc.cos > bacc.cos, sc, bacc))""".stripMargin

  /** Map-side nearest-centroid argMIN by squared L2 distance over the
    * same sorted centroid array as [[nearestCentroid]] — the metric a
    * product quantizer trains with (cosine ranks angle; PQ minimizes
    * reconstruction error ‖x − c‖²). `‖e‖²` is constant per row, so the
    * fold ranks by the variable part `round(cnsq − 2·dot, 6)`; strict
    * `<` keeps the FIRST (smallest cl) cell on rounded ties, the same
    * winner as `ORDER BY round(cnsq − 2·dot, 6) ASC, cl`. */
  def nearestCentroidL2(cents: String, e: String): String =
    s"""aggregate(
       |  transform($cents, ct -> named_struct(
       |    'd2', round(ct.cnsq - 2.0D * ${dot(e, "ct.c")}, 6),
       |    'cl', ct.cl)),
       |  named_struct('d2', CAST('Infinity' AS DOUBLE), 'cl', CAST(-1 AS BIGINT)),
       |  (bacc, sc) -> IF(sc.d2 < bacc.d2, sc, bacc))""".stripMargin

  /** The `nprobe` nearest cells for `e` as `array<bigint>`, map-side
    * over the same sorted centroid array as [[nearestCentroid]]: rank by
    * rounded cosine descending (ties → smaller cl, via ascending sort on
    * `(-cos, cl)` structs) and keep the first `nprobe`. */
  def probeCells(cents: String, e: String, nsq: String, nprobe: Int): String =
    s"""transform(slice(array_sort(transform($cents, ct -> named_struct(
       |    'negcos', -round(${dot(e, "ct.c")} / (sqrt($nsq) * sqrt(ct.cnsq)), 6),
       |    'cl', ct.cl))), 1, $nprobe), pc -> pc.cl)""".stripMargin

  /** Deterministic Rademacher sign row for hyperplane j: sign[i] = +1
    * iff the first hex digit of md5(s"${j}_${i}") is 0-7. Evaluated once
    * at PLAN BUILD time — the sign matrix is emitted as a literal array
    * in the generated expression, so neither engine pays a per-row md5.
    */
  private def signRow(j: Int, dim: Int): IndexedSeq[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { i =>
      val h = md.digest(s"${j}_${i}".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) < 8) 1 else -1
    }
  }

  /** Random-hyperplane bucket for ONE band of a banded LSH scheme:
    * `bits` hyperplanes (indices band*bits .. band*bits+bits-1), bit k
    * of the key = [dot(e, w_{band*bits+k}) >= 0]. Signed projections run
    * through exact decimals so both engines compute the SAME bucket even
    * when a projection sits at ±1e-15.
    *
    * Banding math (two vectors at angle θ, p = 1 − θ/π per hyperplane):
    * one-band collision = p^bits, candidate recall over `bands`
    * independent bands = 1 − (1 − p^bits)^bands. With bits=4, bands=8:
    * cosine 0.35 → p ≈ 0.614 → recall ≈ 0.71; cosine 0.9 (real near-dup
    * territory) → p ≈ 0.857 → recall ≈ 0.998. Scale knobs: per-band
    * bucket count is 2^bits, so in-bucket pair work is
    * O(bands · N²/2^bits) — raise `bits` as N grows to keep buckets
    * sparse, raise `bands` (≈ ln(1/(1−R))/p^bits) to restore recall R.
    * A single non-banded key has no second knob: adding bits collapses
    * recall exponentially with nothing to win it back.
    */
  def bandBucket(e: String, band: Int, bits: Int, dim: Int): String =
    (0 until bits).map { k =>
      val arr = signRow(band * bits + k, dim).map(s => s"${s}.0D")
        .mkString("array(", ", ", ")")
      val signedSum =
        s"""CAST(aggregate(zip_with($e, $arr, (x, y) -> CAST(x * y AS DECIMAL(30,15))),
           |  CAST(0 AS DECIMAL(38,15)), (acc, v) -> CAST(acc + v AS DECIMAL(38,15))) AS DOUBLE)""".stripMargin
      s"(CASE WHEN $signedSum >= 0 THEN ${1 << k} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** All band buckets as one array<int> (posexplode to (band, bucket)). */
  def bandBuckets(e: String, bands: Int, bits: Int, dim: Int): String =
    (0 until bands).map(bandBucket(e, _, bits, dim)).mkString("array(", ", ", ")")

  /** DuckDB twin of [[bandBucket]] (literal-list indexing). */
  def duckBandBucket(e: String, band: Int, bits: Int, dim: Int): String =
    (0 until bits).map { k =>
      val arr = signRow(band * bits + k, dim).map(s => s"${s}.0")
        .mkString("[", ", ", "]")
      val signedSum =
        s"""CAST(list_sum([ CAST($e[i] * ($arr)[i] AS DECIMAL(30,15))
           |  for i in generate_series(1, $dim) ]) AS DOUBLE)""".stripMargin
      s"(CASE WHEN $signedSum >= 0 THEN ${1 << k} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  // ---- DuckDB oracle twins (same math, DuckDB list syntax) ----

  /** DuckDB: exact decimal dot product of two DOUBLE[] expressions. */
  def duckDot(a: String, b: String, dim: Int): String =
    s"""CAST(list_sum([ CAST($a[i] * $b[i] AS DECIMAL(30,15))
       |                for i in generate_series(1, $dim) ]) AS DOUBLE)""".stripMargin

  def duckNormSq(a: String, dim: Int): String = duckDot(a, a, dim)
}
