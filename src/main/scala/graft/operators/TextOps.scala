package graft.operators

/** Text-pipeline building blocks: tokenization, shingling, MinHash
  * signatures and SimHash fingerprints — the operators a large-scale
  * training-data pipeline needs (beyond the reference surface; the
  * reference's only text handling is substring search,
  * webapp/mysql_routes.py:619-626).
  *
  * Everything here is expressed as Spark SQL *higher-order functions*
  * over per-row arrays (`transform` / `aggregate` / `zip_with` /
  * `array_min`), so per-document feature extraction runs entirely
  * map-side — zero shuffle until the candidate-pair join. At 100 TB this
  * is the difference between one shuffle of compact signatures and
  * shuffling exploded (doc × shingle × hash) rows.
  *
  * Hashing uses md5 hex strings ordered lexicographically: md5 is
  * bit-identical across engines (and to the DuckDB oracle), and
  * lexicographic min over lowercase-hex strings is a uniform minhash.
  */
object TextOps {

  /** Whitespace tokens of a text column (SQL fragment). */
  def tokens(text: String): String = s"split(trim($text), '\\\\s+')"

  /** Distinct word n-gram shingles of a token-array column.
    * `sequence(a, b)` is guarded: Spark generates DESCENDING sequences
    * when b < a, so short docs must short-circuit to an empty array. */
  def shingles(toks: String, n: Int = 3): String =
    s"""CASE WHEN size($toks) >= $n
       |  THEN array_distinct(transform(sequence(1, size($toks) - ${n - 1}),
       |         i -> concat_ws(' ', slice($toks, i, $n))))
       |  ELSE CAST(array() AS array<string>) END""".stripMargin

  /** MinHash signature: `k` independent hash functions, each realized as
    * the lexicographic min of `md5(seed || '|' || shingle)`. */
  def minhashSignature(shs: String, k: Int = 12): String =
    s"""transform(sequence(0, ${k - 1}),
       |  k -> array_min(transform($shs, x -> md5(concat(CAST(k AS STRING), '|', x)))))""".stripMargin

  /** LSH band keys from a minhash signature: `bands` buckets of
    * `rowsPerBand` signature positions, each hashed to one key.
    * Two docs sharing any band key become a candidate pair. */
  def bandKeys(sig: String, bands: Int = 4, rowsPerBand: Int = 3): String = {
    val keys = (0 until bands).map { b =>
      val parts = (1 to rowsPerBand).map(r => s"element_at($sig, ${b * rowsPerBand + r})")
      s"md5(concat(${parts.mkString(", ")}))"
    }
    s"array(${keys.mkString(", ")})"
  }

  // Hex-digit membership strings: bit 3 (value 8) down to bit 0 (value 1).
  // `instr(set, hexChar) > 0` tests one bit of a hex digit — engine-portable
  // (no hex→int conversion needed anywhere).
  private val bitSets = Seq("89abcdef", "4567cdef", "2367abef", "13579bdf")

  /** Per-feature-set 32-bit SimHash, entirely map-side: fold the feature
    * array into 32 signed bit-counts (`+1` if bit j of `md5(feature)` is
    * set, else `-1`), then assemble the sign vector into a BIGINT.
    * Bit j comes from hex digit `j div 4` of the md5, tested by set
    * membership of the hex char. */
  def simhash32(features: String): String = {
    val bitCase =
      s"""CASE j % 4 WHEN 0 THEN '${bitSets(0)}' WHEN 1 THEN '${bitSets(1)}'
         | WHEN 2 THEN '${bitSets(2)}' ELSE '${bitSets(3)}' END""".stripMargin
    // md5 is hoisted out of the per-bit lambda (one digest per feature,
    // not 32): the fold then only does substring + set-membership per bit.
    s"""aggregate(
       |  zip_with(
       |    aggregate(transform($features, f -> md5(f)),
       |      array_repeat(CAST(0 AS BIGINT), 32),
       |      (acc, h) -> zip_with(acc,
       |        transform(sequence(0, 31), j ->
       |          CASE WHEN instr($bitCase, substring(h, 1 + (j div 4), 1)) > 0
       |               THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END),
       |        (x, y) -> x + y)),
       |    sequence(31, 0, -1),
       |    (s, p) -> CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), p)
       |                   ELSE CAST(0 AS BIGINT) END),
       |  CAST(0 AS BIGINT), (a, b) -> a + b)""".stripMargin
  }

  /** Pigeonhole chunks of a 32-bit simhash for hamming-distance banding:
    * 4 byte-chunks — any pair within hamming distance 3 must agree on at
    * least one chunk, so a join on (chunk#, value) finds all such pairs
    * without the quadratic all-pairs comparison. */
  def simhashChunks(sh: String, chunks: Int = 4): String = {
    val cs = (0 until chunks).map(c => s"(($sh div ${1L << (c * 8)}) % 256)")
    s"array(${cs.mkString(", ")})"
  }
}
