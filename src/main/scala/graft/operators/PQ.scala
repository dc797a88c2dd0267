package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Product quantization (Jégou et al. 2011): compress each vector into
  * `m` small codes — one per disjoint subspace — so similarity search
  * scans bytes instead of floats (beyond-reference; completes the ANN
  * family: exact KNN → IVF cells → LSH bands → PQ codes).
  *
  * Training: an independent squared-L2 k-means ([[KMeans.fitL2]]) per
  * subspace, `ksub` centroids each, deterministic seeding — so the whole
  * fit replays relationally in the DuckDB oracle, like the IVF
  * quantizer. Codebooks are renumbered 0..ksub-1 in centroid-id order
  * (seed ids are arbitrary vec_ids; stable ranks make codes and LUT
  * indices line up across engines).
  *
  * Search (ADC — asymmetric distance computation): the query stays
  * exact; per query a LUT of `m × ksub` query-subvector·centroid dot
  * products is computed ONCE, and each corpus vector's approximate dot
  * is `Σ_s LUT[s][code_s]` — m array lookups per vector instead of a
  * dim-wide multiply. At 100 TB this is the point of PQ: the scan reads
  * `m` bytes of codes per vector (not `dim` floats) and the LUT lives
  * in RAM beside the scan, exactly FAISS's IVF-ADC inner loop. Here the
  * LUT rides the plan as a literal (built from a bounded |Q|·m·ksub
  * collect of SPARK-computed decimals, so both engines see identical
  * doubles), making the corpus pass pure map-side: scan → fold → top-k.
  */
object PQ {

  /** Subvector s (0-based) of column `e`: dims [s·dsub+1, (s+1)·dsub]. */
  def subExpr(e: String, s: Int, dsub: Int): String =
    s"slice($e, ${s * dsub + 1}, $dsub)"

  /** Train one codebook per subspace on `vecs` (must carry `vec_id`,
    * `e: array<double>`; persist it — each subspace fit scans it
    * iters+1 times). Returns codebooks with cl renumbered 0..ksub-1. */
  def fit(vecs: DataFrame, m: Int, dsub: Int, ksub: Int, iters: Int): Seq[Seq[KMeans.Cent]] =
    (0 until m).map { s =>
      val sub = vecs
        .selectExpr("vec_id", s"${subExpr("e", s, dsub)} AS e")
        .selectExpr("vec_id", "e", s"${VectorOps.normSq("e")} AS nsq")
      renumber(KMeans.fitL2(sub, ksub, iters))
    }

  /** Stable code ids: rank in centroid-id order (matches the oracle's
    * `row_number() OVER (ORDER BY cl) - 1`). */
  def renumber(cents: Seq[KMeans.Cent]): Seq[KMeans.Cent] =
    cents.sortBy(_.cl).zipWithIndex.map { case (c, i) => c.copy(cl = i.toLong) }

  /** Encode `e` to its `array<bigint>` of m codes — a map-side fold per
    * subspace over the codebook literals (no join, no shuffle). */
  def encodeExpr(cbs: Seq[Seq[KMeans.Cent]], e: String, dsub: Int): String =
    cbs.zipWithIndex.map { case (cb, s) =>
      s"${VectorOps.nearestCentroidL2(KMeans.literal(cb), subExpr(e, s, dsub))}.cl"
    }.mkString("array(", ", ", ")")

  /** One query's ADC LUT as a literal `array<array<double>>`:
    * lut(s)(code) = dot(q_s, c_{s,code}). Values must come from the
    * engine's own decimal arithmetic (collect of a Spark-computed
    * frame) so the literal round-trips bit-exactly via Double.toString.
    */
  def lutLiteral(lut: Seq[Seq[Double]]): String =
    lut.map(row => row.map(d => s"CAST('$d' AS DOUBLE)")
        .mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")

  /** ADC approximate dot for a corpus row carrying `codes`
    * (array<bigint>, 0-based code per subspace): Σ_s lut[s][code_s] —
    * m literal-array lookups, summed left-to-right (fixed order, so the
    * double sum is deterministic and the oracle can mirror it). */
  def adcDotExpr(lutLit: String, codes: String, m: Int): String =
    (0 until m).map { s =>
      s"element_at(element_at($lutLit, ${s + 1}), CAST(element_at($codes, ${s + 1}) + 1 AS INT))"
    }.mkString("(", " + ", ")")

  /** The Spark frame whose collect feeds [[lutLiteral]]: one row per
    * (subspace, code) with the exact-decimal dot against each query
    * subvector — computed in-engine so the doubles are the engine's. */
  def lutFrame(queries: DataFrame, cbs: Seq[Seq[KMeans.Cent]], dsub: Int): DataFrame = {
    val perSub = cbs.zipWithIndex.map { case (cb, s) =>
      s"""transform(${KMeans.literal(cb)}, ct -> named_struct(
         |  's', CAST($s AS BIGINT), 'code', ct.cl,
         |  'd', ${VectorOps.dot(subExpr("qe", s, dsub), "ct.c")}))""".stripMargin
    }.mkString("flatten(array(", ", ", "))")
    queries.selectExpr("q_id", s"explode($perSub) AS lc")
      .select(col("q_id"), col("lc.s").as("s"), col("lc.code").as("code"), col("lc.d").as("d"))
  }
}
