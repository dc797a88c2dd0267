package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.TextOps

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between raw ingest and tokenization: benchmark decontamination,
  * stratified sampling, data-mix weighting, and PII scrubbing (builder
  * prompt first-class family; no reference twin — the reference has no
  * corpus tooling at all).
  *
  * Scale posture shared by the family: per-document features are
  * higher-order functions over token arrays (map-side, zero shuffle);
  * the only joins are against corpus-small frames (the eval-set n-gram
  * index, per-stratum totals) that broadcast. Nothing here shuffles
  * document text.
  */
object PipelineQueries {

  private val toks = TextOps.tokens("text")
  private val duckToks = "string_split_regex(trim(text), '\\s+')"

  /** Decontamination n-gram width. 5-gram overlap on this short-vocab
    * synthetic corpus plays the role 8-13-gram overlap plays on real
    * text: long enough that random collisions vanish, short enough that
    * true shared passages still hit. */
  private val DecontamN = 5

  /** Eval-set membership: a deterministic key split stands in for the
    * benchmark-document set (every 7th doc). Real pipelines load the
    * eval suite here; the operator shape is identical. */
  private val EvalMod = 7

  // PII regexes, written without backslashes ([.] for a literal dot) so
  // the same pattern text is valid in Spark (Java regex) and the DuckDB
  // oracle (RE2) without double-escaping drift.
  private val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
  private val PhonePat = "[0-9]{3}-[0-9]{4}"
  private val IpPat    = "([0-9]{1,3}[.]){3}[0-9]{1,3}"

  /** The corpus carries no PII (synthetic word soup, zero digits), so the
    * scrubber is exercised on deterministically augmented text: docs at
    * fixed key residues gain an email / phone / IPv4 trailer derived from
    * their own doc_id. Both engines build the identical augmented string,
    * so detection counts and the redacted-text digest stay oracle-exact
    * while the regex pipeline (the real operator) does real work. */
  private val sparkAug =
    s"""concat(text,
       |  CASE WHEN doc_id % 7 = 0
       |       THEN concat(' contact user', CAST(doc_id AS STRING), '@example.com now') ELSE '' END,
       |  CASE WHEN doc_id % 11 = 0
       |       THEN concat(' call 555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), ' today') ELSE '' END,
       |  CASE WHEN doc_id % 13 = 0
       |       THEN concat(' from 10.0.', CAST(doc_id % 256 AS STRING), '.', CAST(doc_id * 7 % 256 AS STRING), ' logged') ELSE '' END)""".stripMargin

  private val duckAug =
    """text ||
      |  (CASE WHEN doc_id % 7 = 0
      |        THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END) ||
      |  (CASE WHEN doc_id % 11 = 0
      |        THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today' ELSE '' END) ||
      |  (CASE WHEN doc_id % 13 = 0
      |        THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id * 7 % 256 AS VARCHAR) || ' logged' ELSE '' END)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Benchmark DECONTAMINATION: flag corpus documents sharing any
    // DecontamN-gram with the eval set — the overlap check every
    // pretraining pipeline runs before training. The operator
    // (operators/Decontaminate) hashes shingles to 64-bit before the
    // join (8-byte keys instead of 5-gram strings on every exchange) and
    // SIZE-GUARDS the eval-index broadcast — an oversized eval set falls
    // back to a shuffle join instead of OOMing the executors. The oracle
    // joins on the raw strings: identical output (the 2⁻⁶⁴ hash
    // collision rate is below any real corpus's noise floor), which the
    // hash gate then proves per-run.
    QueryDef(
      "q_docs_decontaminate",
      t => {
        val shs = TextOps.shingles(toks, DecontamN)
        // Persisted: Generate fuses the shingle projection into its own
        // child, re-evaluating the split+slice+concat chain per OUTPUT
        // row (once per shingle, not per doc) — caching the arrays first
        // makes the explode a cheap array walk (8.9 → 1.9 s at sf0.1).
        val docs = t.documents.selectExpr("doc_id", s"$shs AS shs")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        graft.CacheJanitor.afterTerminalAction(
          graft.operators.Decontaminate.overlap(
              corpus = docs.filter(col("doc_id") % EvalMod =!= 0),
              eval = docs.filter(col("doc_id") % EvalMod === 0))
            .orderBy(col("doc_id")),
          Seq(docs))
      },
      Some(s"""
        WITH sh AS (
          SELECT doc_id,
            list_distinct([ s[i] || ' ' || s[i+1] || ' ' || s[i+2] || ' ' || s[i+3] || ' ' || s[i+4]
                            for i in range(1, greatest(len(s) - ${DecontamN - 2}, 1)) ]) shs
          FROM (SELECT doc_id, $duckToks s FROM documents)),
        ev AS (SELECT DISTINCT unnest(shs) sh FROM sh WHERE doc_id % $EvalMod = 0)
        SELECT doc_id, COUNT(*) AS overlap_cnt
        FROM (SELECT doc_id, unnest(shs) sh FROM sh WHERE doc_id % $EvalMod <> 0) c
        JOIN ev USING (sh)
        GROUP BY doc_id
        ORDER BY doc_id""")),

    // STRATIFIED SAMPLING: per-language keep rates applied via a
    // deterministic md5 key bucket (the q_sample_customers idiom at
    // corpus scale) — English kept at 50%, everything else at 20%.
    // Pure map-side filter: stable across runs, engines, and cluster
    // layouts, and pushdown-friendly (no rand(), no sample()).
    QueryDef(
      "q_docs_stratified_sample",
      t => t.documents
        .filter(substring(md5(col("doc_id").cast("string")), 1, 2) <
          when(col("lang") === "en", lit("80")).otherwise(lit("33")))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id, lang, source, n_chars
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
          (CASE WHEN lang = 'en' THEN '80' ELSE '33' END)
        ORDER BY doc_id""")),

    // QUALITY-WEIGHTED (importance) sampling: keep probability
    // proportional to the doc's quality score — upsample clean text,
    // downsample junk — via the same deterministic md5-bucket idiom
    // (never rand(): retried tasks must re-decide identically). The
    // 60-bit key normalizes to [0,1) and keeps the doc iff
    // key < quality·scale; pure map-side, stable across runs, engines,
    // and partitionings. Output aggregates kept counts per quality
    // decile so the oracle checks the SHAPE of the acceptance curve.
    QueryDef(
      "q_docs_importance_sample",
      t => {
        val q = s"""(0.4 * least(1.0, size($toks) / 100.0)
           + 0.3 * (1.0 - size(filter($toks, x -> x IN ('the','a','of','and','in','to','is'))) / CAST(size($toks) AS DOUBLE))
           + 0.3 * (size(array_distinct($toks)) / CAST(size($toks) AS DOUBLE)))"""
        val key =
          "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS DOUBLE) / CAST(pow(2.0, 60) AS DOUBLE)"
        t.documents
          .selectExpr("doc_id", s"$q AS quality", s"$key AS key")
          .selectExpr("doc_id", "quality", "key",
            "CAST(floor(quality * 10) AS BIGINT) AS decile",
            "key < quality * 0.8 AS kept")
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("docs"),
            count(when(col("kept"), lit(1))).as("kept_docs"))
          .selectExpr("decile", "CAST(docs AS BIGINT) AS docs",
            "CAST(kept_docs AS BIGINT) AS kept_docs",
            "round(kept_docs / CAST(docs AS DOUBLE), 6) AS keep_rate")
          .orderBy(col("decile"))
      },
      Some(s"""
        WITH scored AS (
          SELECT doc_id,
            (0.4 * least(1.0, len(s) / 100.0)
             + 0.3 * (1.0 - len(list_filter(s, x -> x IN ('the','a','of','and','in','to','is'))) / CAST(len(s) AS DOUBLE))
             + 0.3 * (len(list_distinct(s)) / CAST(len(s) AS DOUBLE))) AS quality,
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE) / CAST(pow(2.0, 60) AS DOUBLE) AS key
          FROM (SELECT doc_id, $duckToks s FROM documents)
        )
        SELECT CAST(floor(quality * 10) AS BIGINT) AS decile,
               CAST(count(*) AS BIGINT) AS docs,
               CAST(count(CASE WHEN key < quality * 0.8 THEN 1 END) AS BIGINT) AS kept_docs,
               round(count(CASE WHEN key < quality * 0.8 THEN 1 END) / CAST(count(*) AS DOUBLE), 6) AS keep_rate
        FROM scored
        GROUP BY decile
        ORDER BY decile""")),

    // DATA-MIX WEIGHTS: per-language token inventory → corpus share →
    // per-doc sampling weight that would hit a target mix (en 40%, other
    // languages 15% each). The aggregate shrinks to |languages| rows
    // before the share/weight math, so the window total costs nothing;
    // the corpus pass is one map-side token count.
    QueryDef(
      "q_docs_mix_weights",
      t => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy()
        t.documents
          .selectExpr("lang", s"CAST(size($toks) AS BIGINT) AS tok")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("doc_cnt"), sum(col("tok")).as("token_cnt"))
          .withColumn("token_share",
            round(col("token_cnt") / sum(col("token_cnt")).over(w), 6))
          .withColumn("target_share",
            when(col("lang") === "en", lit(0.4)).otherwise(lit(0.15)))
          .withColumn("mix_weight", round(col("target_share") / col("token_share"), 6))
          .select(col("lang"), col("doc_cnt"), col("token_cnt"),
            col("token_share"), col("target_share"), col("mix_weight"))
          .orderBy(col("lang"))
      },
      Some(s"""
        SELECT lang, doc_cnt, token_cnt,
          round(token_cnt / SUM(token_cnt) OVER (), 6) AS token_share,
          (CASE WHEN lang = 'en' THEN 0.4 ELSE 0.15 END) AS target_share,
          round((CASE WHEN lang = 'en' THEN 0.4 ELSE 0.15 END) /
            round(token_cnt / SUM(token_cnt) OVER (), 6), 6) AS mix_weight
        FROM (
          SELECT lang, COUNT(*) doc_cnt, CAST(SUM(len($duckToks)) AS BIGINT) token_cnt
          FROM documents GROUP BY lang)
        ORDER BY lang""")),

    // PII SCAN + REDACTION: regex detection counts per class and the
    // digest of the redacted text (emails → [EMAIL], IPv4 → [IP],
    // phone → [PHONE]; email first so its host dots never half-match the
    // IP pattern). Entirely map-side — the scrubber runs at parquet-scan
    // speed and only flagged rows leave the stage.
    QueryDef(
      "q_text_pii_scan",
      t => t.documents
        .withColumn("aug", expr(sparkAug))
        .selectExpr(
          "doc_id",
          s"CAST(size(regexp_extract_all(aug, '$EmailPat', 0)) AS BIGINT) AS email_cnt",
          s"CAST(size(regexp_extract_all(aug, '$PhonePat', 0)) AS BIGINT) AS phone_cnt",
          s"CAST(size(regexp_extract_all(aug, '$IpPat', 0)) AS BIGINT) AS ip_cnt",
          s"""md5(regexp_replace(regexp_replace(regexp_replace(aug,
             |  '$EmailPat', '[EMAIL]'),
             |  '$IpPat', '[IP]'),
             |  '$PhonePat', '[PHONE]')) AS redacted_fp""".stripMargin)
        .filter(col("email_cnt") + col("phone_cnt") + col("ip_cnt") > 0)
        .orderBy(col("doc_id")),
      Some(s"""
        SELECT doc_id,
          len(regexp_extract_all(aug, '$EmailPat')) AS email_cnt,
          len(regexp_extract_all(aug, '$PhonePat')) AS phone_cnt,
          len(regexp_extract_all(aug, '$IpPat')) AS ip_cnt,
          md5(regexp_replace(regexp_replace(regexp_replace(aug,
            '$EmailPat', '[EMAIL]', 'g'),
            '$IpPat', '[IP]', 'g'),
            '$PhonePat', '[PHONE]', 'g')) AS redacted_fp
        FROM (SELECT doc_id, $duckAug AS aug FROM documents)
        WHERE len(regexp_extract_all(aug, '$EmailPat'))
            + len(regexp_extract_all(aug, '$PhonePat'))
            + len(regexp_extract_all(aug, '$IpPat')) > 0
        ORDER BY doc_id""")),

    // Sequence packing: assign documents to fixed-token-budget training
    // sequences (the T5/GPT packing step before tokenized examples hit
    // the trainer). Greedy sequential fill per source stratum: docs in
    // doc_id order, a doc lands in the bin its cumulative START offset
    // falls in — floor((cumsum − tokens)/B) — so bins are contiguous
    // spans and token_cnt may straddle the budget by one document (the
    // "pack then split at boundary" accounting). The per-stratum running
    // sum is a keyed ROWS window: parallel across the source shuffle,
    // one linear pass per stratum — at 100 TB the strata would be finer
    // (source × shard) so no single window task owns a whole corpus.
    QueryDef(
      "q_docs_pack_sequences",
      t => {
        val B = 512
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        t.documents
          .selectExpr("doc_id", "source", s"CAST(size($toks) AS BIGINT) AS tok")
          .withColumn("cum", sum(col("tok")).over(w))
          .withColumn("bin", floor((col("cum") - col("tok")) / B))
          .groupBy(col("source"), col("bin"))
          .agg(
            count(lit(1)).as("doc_cnt"),
            sum(col("tok")).as("token_cnt"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy(col("source"), col("bin"))
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, source, CAST(len($duckToks) AS BIGINT) AS tok
          FROM documents
        ),
        c AS (
          SELECT doc_id, source, tok,
                 SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM d
        )
        SELECT source, CAST(floor((cum - tok) / 512) AS BIGINT) AS bin,
               COUNT(*) AS doc_cnt,
               CAST(SUM(tok) AS BIGINT) AS token_cnt,
               MIN(doc_id) AS first_doc,
               MAX(doc_id) AS last_doc
        FROM c
        GROUP BY source, bin
        ORDER BY source, bin""")),

    // Corpus-statistics fluency scoring (the CCNet-style "does this doc
    // look like the corpus" filter): per document, the mean corpus
    // probability of its tokens and the fraction of corpus-rare tokens.
    // NOTE the arithmetic is INTEGER sums + one final double division:
    // the canonical formulation (mean log-prob / perplexity) needs
    // ln(), which is not IEEE-exact — glibc and the JVM may differ in
    // the last ulp, so a cross-engine hash gate cannot carry
    // transcendentals (the repo's double discipline: only +,*,/,sqrt,
    // all exactly specified by IEEE-754). mean_token_p ranks documents
    // identically to mean token probability under any monotone
    // transform, so the FILTER this feeds is unchanged.
    //
    // Scale shape: corpus term counts are one map-side-combined shuffle
    // keyed by token (vocab-sized output); scoring re-joins the
    // exploded tokens to the counts (token-keyed shuffle, or a
    // broadcast once the Zipf head is pruned) and aggregates back per
    // doc. Nothing quadratic, no text shuffled after the explode.
    QueryDef(
      "q_docs_token_rarity",
      t => {
        val RareDf = 2
        val tk = t.documents.selectExpr("doc_id", s"explode($toks) AS tok")
        val counts = tk.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        val total = counts.agg(sum(col("cnt")).cast("long").as("total"))
        tk.join(counts, Seq("tok"))
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_tokens"),
            sum(col("cnt")).as("sum_cnt"),
            count(when(col("cnt") <= RareDf, lit(1))).as("rare_cnt"))
          .crossJoin(broadcast(total)) // 1-row scalar frame
          .selectExpr(
            "doc_id",
            "CAST(n_tokens AS BIGINT) AS n_tokens",
            // sum_cnt/(n·total): one IEEE-exact division over exact ints
            "round(CAST(sum_cnt AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * CAST(total AS DOUBLE)), 9) AS mean_token_p",
            "round(CAST(rare_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS rare_frac")
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH tk AS (
          SELECT doc_id, unnest($duckToks) AS tok FROM documents
        ),
        counts AS (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY tok),
        total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM counts)
        SELECT tk.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               round(CAST(SUM(c.cnt) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * CAST(MAX(total.total) AS DOUBLE)), 9) AS mean_token_p,
               round(CAST(COUNT(CASE WHEN c.cnt <= 2 THEN 1 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS rare_frac
        FROM tk JOIN counts c USING (tok) CROSS JOIN total
        GROUP BY tk.doc_id
        ORDER BY tk.doc_id""")),

    // EXACT SUBSTRING DEDUP (the Lee et al. "Deduplicating Training
    // Data" span family): find every k-token window that occurs in ≥2
    // documents and report, per doc, how many windows and how many
    // TOKEN POSITIONS duplicated spans cover — the measurement that
    // drives span-removal decisions (full-doc dedup misses partially
    // copied text; this catches the copied SPANS). Distributed shape:
    // window fingerprints are map-side md5s (one per position, no
    // text shuffled — the 16-byte hash is the join key), the document
    // frequency pass is one shuffle of O(tokens) narrow rows (the same
    // inverted-index cost the shingle pipeline pays), and the span
    // coverage explode runs ONLY on duplicated windows — rare on a
    // clean corpus, which is what makes this tractable where the
    // reference suffix-array formulation is single-node. A production
    // deployment persists the window index like DedupIndex does the
    // shingle index.
    QueryDef(
      "q_docs_substring_dedup",
      t => {
        val k = 12
        val base = t.documents.selectExpr("doc_id", s"$toks AS t")
          .filter(size(col("t")) >= k)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val wins = base.selectExpr("doc_id",
          s"""explode(transform(sequence(1, size(t) - ${k - 1}),
              i -> named_struct('i', i, 'g', md5(concat_ws(' ', slice(t, i, $k)))))) AS w""")
          .select(col("doc_id"), col("w.i").as("i"), col("w.g").as("g"))
        val dupGrams = wins.groupBy(col("g"))
          .agg(countDistinct(col("doc_id")).as("df"))
          .filter(col("df") >= 2)
          .select(col("g"))
        val dwins = wins.join(dupGrams, Seq("g"), "left_semi")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cnt = dwins.groupBy(col("doc_id")).agg(count(lit(1)).as("dup_windows"))
        val cov = dwins
          .selectExpr("doc_id", s"explode(sequence(i, i + ${k - 1})) AS pos")
          .distinct()
          .groupBy(col("doc_id")).agg(count(lit(1)).as("covered"))
        val out = base.select(col("doc_id"), size(col("t")).cast("long").as("total_tokens"))
          .join(cnt, Seq("doc_id"), "left")
          .join(cov, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("dup_windows"), lit(0L)).cast("long").as("dup_windows"),
            coalesce(col("covered"), lit(0L)).cast("long").as("covered_tokens"),
            col("total_tokens"))
          .orderBy(col("doc_id"))
        graft.CacheJanitor.afterTerminalAction(out, Seq(base, dwins))
      },
      Some(s"""
        WITH base AS (
          SELECT doc_id, $duckToks s FROM documents
          WHERE len($duckToks) >= 12),
        wins AS (
          SELECT doc_id, i.i, md5(array_to_string(s[i.i : i.i + 11], ' ')) g
          FROM base, LATERAL (SELECT unnest(generate_series(1, len(s) - 11)) AS i) i),
        dup AS (
          SELECT g FROM wins GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
        dwins AS (SELECT w.doc_id, w.i FROM wins w JOIN dup USING (g)),
        cnt AS (SELECT doc_id, COUNT(*) dup_windows FROM dwins GROUP BY doc_id),
        cov AS (
          SELECT doc_id, COUNT(DISTINCT pos) covered FROM (
            SELECT doc_id, unnest(generate_series(i, i + 11)) pos FROM dwins) z
          GROUP BY doc_id)
        SELECT b.doc_id,
          CAST(coalesce(cnt.dup_windows, 0) AS BIGINT) AS dup_windows,
          CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered_tokens,
          CAST(len(b.s) AS BIGINT) AS total_tokens
        FROM base b
        LEFT JOIN cnt USING (doc_id)
        LEFT JOIN cov USING (doc_id)
        ORDER BY b.doc_id""")),

    // Token-window chunking: split each document into fixed-size token
    // windows with overlap (64-token chunks, 48-token stride — the
    // RAG-indexing / long-context-pretraining chunker; overlap keeps
    // boundary-straddling passages retrievable). Pure MAP-SIDE: the
    // window starts are a per-row sequence, the slices are array ops on
    // the already-split tokens, so the explode multiplies rows by
    // ~W/S ≈ 1.3 and nothing shuffles but the final ORDER BY. Chunk
    // identity travels as an md5 fingerprint so the output stays narrow
    // (a real pipeline would carry the chunk text or token ids to the
    // tokenizer).
    QueryDef(
      "q_docs_chunk",
      t => {
        val W = 64 // window tokens
        val S = 48 // stride (W − S = 16 tokens of overlap)
        t.documents
          .selectExpr("doc_id", s"$toks AS t")
          .selectExpr("doc_id", "CAST(size(t) AS BIGINT) AS n_tokens",
            s"""posexplode(transform(
               |  sequence(0, CASE WHEN size(t) <= $W THEN 0
               |    ELSE CAST(ceil((size(t) - $W) / CAST($S AS DOUBLE)) AS INT) END),
               |  i -> named_struct(
               |    'ct', CAST(size(slice(t, i * $S + 1, $W)) AS BIGINT),
               |    'fp', md5(concat_ws(' ', slice(t, i * $S + 1, $W)))))) AS (chunk_id, c)""".stripMargin)
          .selectExpr("doc_id", "n_tokens",
            "CAST(chunk_id AS BIGINT) AS chunk_id",
            "c.ct AS chunk_tokens", "c.fp AS chunk_fp")
          .orderBy(col("doc_id"), col("chunk_id"))
      },
      Some(s"""
        WITH tk AS (
          SELECT doc_id, $duckToks AS t FROM documents
        ),
        ix AS (
          SELECT doc_id, t, len(t) AS n_tokens,
            unnest(generate_series(0, CASE WHEN len(t) <= 64 THEN 0
              ELSE CAST(ceil((len(t) - 64) / 48.0) AS INT) END)) AS chunk_id
          FROM tk
        )
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(chunk_id AS BIGINT) AS chunk_id,
               CAST(len(t[chunk_id*48+1 : chunk_id*48+64]) AS BIGINT) AS chunk_tokens,
               md5(array_to_string(t[chunk_id*48+1 : chunk_id*48+64], ' ')) AS chunk_fp
        FROM ix ORDER BY doc_id, chunk_id""")),

    // End-to-end corpus build: the curation stages COMPOSED into one
    // declarative plan — quality gate → exact dedup (min-doc_id winner
    // per content fingerprint) → decontamination (drop docs overlapping
    // the held-out eval shard's 5-grams) — reported as a per-source
    // survival funnel. Each stage is the already-verified shape (the
    // standalone queries above); composing them costs ONE plan, not
    // three jobs with intermediate materialization, and Catalyst prunes
    // the doc payload columns each stage doesn't need.
    QueryDef(
      "q_docs_corpus_build",
      t => {
        val shs = TextOps.shingles(toks, DecontamN)
        val base = t.documents
          .selectExpr("doc_id", "source",
            s"CAST(size($toks) AS BIGINT) AS tok",
            s"size(filter($toks, x -> x IN ('the','a','of','and','in','to','is'))) / CAST(size($toks) AS DOUBLE) AS stop_ratio",
            "md5(lower(trim(text))) AS fp",
            s"$shs AS shs")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val quality = base.filter(col("tok") >= 20 && col("stop_ratio") <= 0.4)
        // Exact dedup: smallest doc_id survives per fingerprint.
        val winners = quality.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
        val deduped = quality.join(winners, Seq("fp", "doc_id"), "left_semi")
        // Decontamination vs the held-out eval shard (doc_id % EvalMod = 0).
        val contaminated = graft.operators.Decontaminate.overlap(
          corpus = deduped.select(col("doc_id"), col("shs")),
          eval = base.filter(col("doc_id") % EvalMod === 0).select(col("doc_id"), col("shs")))
        val clean = deduped
          .filter(col("doc_id") % EvalMod =!= 0)
          .join(contaminated.select(col("doc_id")), Seq("doc_id"), "left_anti")
        base.groupBy(col("source")).agg(count(lit(1)).as("input_docs"))
          .join(quality.groupBy(col("source")).agg(count(lit(1)).as("after_quality")), Seq("source"), "left")
          .join(deduped.groupBy(col("source")).agg(count(lit(1)).as("after_dedup")), Seq("source"), "left")
          .join(clean.groupBy(col("source"))
            .agg(count(lit(1)).as("kept"), sum(col("tok")).as("kept_tokens")), Seq("source"), "left")
          .selectExpr("source", "CAST(input_docs AS BIGINT) AS input_docs",
            "CAST(coalesce(after_quality, 0) AS BIGINT) AS after_quality",
            "CAST(coalesce(after_dedup, 0) AS BIGINT) AS after_dedup",
            "CAST(coalesce(kept, 0) AS BIGINT) AS kept",
            "CAST(coalesce(kept_tokens, 0) AS BIGINT) AS kept_tokens")
          .orderBy(col("source"))
          .transform(out => graft.CacheJanitor.afterTerminalAction(out, Seq(base)))
      },
      Some(s"""
        WITH base AS (
          SELECT doc_id, source,
            CAST(len(s) AS BIGINT) AS tok,
            len(list_filter(s, x -> x IN ('the','a','of','and','in','to','is'))) / CAST(len(s) AS DOUBLE) AS stop_ratio,
            md5(lower(trim(text))) AS fp,
            list_distinct([ s[i] || ' ' || s[i+1] || ' ' || s[i+2] || ' ' || s[i+3] || ' ' || s[i+4]
                            for i in range(1, greatest(len(s) - ${DecontamN - 2}, 1)) ]) AS shs
          FROM (SELECT doc_id, source, text, $duckToks s FROM documents)
        ),
        quality AS (SELECT * FROM base WHERE tok >= 20 AND stop_ratio <= 0.4),
        deduped AS (
          SELECT q.* FROM quality q
          JOIN (SELECT fp, min(doc_id) AS doc_id FROM quality GROUP BY fp) w
            ON q.fp = w.fp AND q.doc_id = w.doc_id
        ),
        ev AS (SELECT DISTINCT unnest(shs) sh FROM base WHERE doc_id % $EvalMod = 0),
        contaminated AS (
          SELECT DISTINCT c.doc_id
          FROM (SELECT doc_id, unnest(shs) sh FROM deduped) c
          JOIN ev USING (sh)
        ),
        clean AS (
          SELECT d.* FROM deduped d
          WHERE d.doc_id % $EvalMod <> 0
            AND NOT EXISTS (SELECT 1 FROM contaminated x WHERE x.doc_id = d.doc_id)
        )
        SELECT b.source,
          CAST(count(*) AS BIGINT) AS input_docs,
          CAST(coalesce(max(q.cnt), 0) AS BIGINT) AS after_quality,
          CAST(coalesce(max(dd.cnt), 0) AS BIGINT) AS after_dedup,
          CAST(coalesce(max(cl.cnt), 0) AS BIGINT) AS kept,
          CAST(coalesce(max(cl.toks), 0) AS BIGINT) AS kept_tokens
        FROM base b
        LEFT JOIN (SELECT source, count(*) cnt FROM quality GROUP BY source) q USING (source)
        LEFT JOIN (SELECT source, count(*) cnt FROM deduped GROUP BY source) dd USING (source)
        LEFT JOIN (SELECT source, count(*) cnt, sum(tok) toks FROM clean GROUP BY source) cl USING (source)
        GROUP BY b.source
        ORDER BY b.source"""))
  )
}
