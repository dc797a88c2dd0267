package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef

/** Text-analysis operators over the `documents` table — the language-ID /
  * quality-scoring / token-counting / fingerprinting surface a
  * training-data pipeline needs (builder-prompt first-class family; the
  * reference's only text operator is substring search,
  * webapp/mysql_routes.py:619-626).
  *
  * Every per-document feature is a higher-order function over the token
  * array (see [[graft.operators.TextOps]]): purely map-side, stays in the
  * scan stage, no shuffle — at 100 TB these run at parquet-read speed with
  * full column pruning (only `doc_id`+`text` are ever read).
  */
object TextQueries {

  // Shared SQL fragments (Spark side).
  private val toks = graft.operators.TextOps.tokens("text")
  private val tokLens = s"transform($toks, x -> length(x))"
  private val stopSet = "('the', 'a', 'of', 'and', 'in', 'to', 'is')"

  // DuckDB twin of the token array.
  private val duckToks = "string_split_regex(trim(text), '\\s+')"

  val defs: Seq[QueryDef] = Seq(

    // Token counting: whitespace tokenization + distinct-type counts.
    QueryDef(
      "q_text_token_stats",
      t => t.documents.selectExpr(
        "doc_id",
        s"CAST(size($toks) AS BIGINT) AS token_cnt",
        s"CAST(size(array_distinct($toks)) AS BIGINT) AS distinct_cnt",
        "CAST(length(text) AS BIGINT) AS char_cnt",
        s"round(aggregate($tokLens, CAST(0 AS BIGINT), (a, v) -> a + v) / CAST(size($toks) AS DOUBLE), 6) AS avg_token_len",
        s"round(size(array_distinct($toks)) / CAST(size($toks) AS DOUBLE), 6) AS type_token_ratio")
        .orderBy(col("doc_id")),
      Some(s"""
        SELECT doc_id,
          len(s) AS token_cnt,
          len(list_distinct(s)) AS distinct_cnt,
          length(text) AS char_cnt,
          round(list_sum(list_transform(s, x -> length(x))) / CAST(len(s) AS DOUBLE), 6) AS avg_token_len,
          round(len(list_distinct(s)) / CAST(len(s) AS DOUBLE), 6) AS type_token_ratio
        FROM (SELECT doc_id, text, $duckToks s FROM documents)
        ORDER BY doc_id""")),

    // Quality scoring: stopword/punctuation ratios + composite keep score.
    QueryDef(
      "q_text_quality",
      t => t.documents.selectExpr(
        "doc_id",
        s"CAST(size($toks) AS BIGINT) AS token_cnt",
        s"CAST(size(filter($toks, x -> x IN $stopSet)) AS BIGINT) AS stopword_cnt",
        s"round(size(filter($toks, x -> x IN $stopSet)) / CAST(size($toks) AS DOUBLE), 6) AS stopword_ratio",
        "round(length(regexp_replace(text, '[a-z0-9 ]', '')) / CAST(length(text) AS DOUBLE), 6) AS punct_ratio",
        s"""round(0.4 * least(1.0, size($toks) / 100.0)
           + 0.3 * (1.0 - size(filter($toks, x -> x IN $stopSet)) / CAST(size($toks) AS DOUBLE))
           + 0.3 * (size(array_distinct($toks)) / CAST(size($toks) AS DOUBLE)), 6) AS quality_score""",
        s"""(0.4 * least(1.0, size($toks) / 100.0)
           + 0.3 * (1.0 - size(filter($toks, x -> x IN $stopSet)) / CAST(size($toks) AS DOUBLE))
           + 0.3 * (size(array_distinct($toks)) / CAST(size($toks) AS DOUBLE))) >= 0.5 AS keep""")
        .orderBy(col("doc_id")),
      Some(s"""
        SELECT doc_id,
          len(s) AS token_cnt,
          len(list_filter(s, x -> x IN $stopSet)) AS stopword_cnt,
          round(len(list_filter(s, x -> x IN $stopSet)) / CAST(len(s) AS DOUBLE), 6) AS stopword_ratio,
          round(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
          round(0.4 * least(1.0, len(s) / 100.0)
            + 0.3 * (1.0 - len(list_filter(s, x -> x IN $stopSet)) / CAST(len(s) AS DOUBLE))
            + 0.3 * (len(list_distinct(s)) / CAST(len(s) AS DOUBLE)), 6) AS quality_score,
          (0.4 * least(1.0, len(s) / 100.0)
            + 0.3 * (1.0 - len(list_filter(s, x -> x IN $stopSet)) / CAST(len(s) AS DOUBLE))
            + 0.3 * (len(list_distinct(s)) / CAST(len(s) AS DOUBLE))) >= 0.5 AS keep
        FROM (SELECT doc_id, text, $duckToks s FROM documents)
        ORDER BY doc_id""")),

    // Language-ID: marker-word scoring with deterministic argmax. On this
    // synthetic uniform-vocab corpus the scores degenerate (documented);
    // the mechanism — per-language marker hits + tie-broken argmax,
    // fully map-side — is what the operator demonstrates.
    QueryDef(
      "q_text_language_id",
      t => {
        def hits(set: String) = s"CAST(size(filter($toks, x -> x IN ($set))) AS BIGINT)"
        val en = hits("'the', 'a', 'and'")
        val es = hits("'el', 'la', 'los'")
        val de = hits("'der', 'die', 'und'")
        val fr = hits("'le', 'les', 'et'")
        t.documents.selectExpr(
          "doc_id", "lang",
          s"$en AS en_hits", s"$es AS es_hits", s"$de AS de_hits", s"$fr AS fr_hits",
          s"""CASE WHEN $en >= $es AND $en >= $de AND $en >= $fr THEN 'en'
                   WHEN $es >= $de AND $es >= $fr THEN 'es'
                   WHEN $de >= $fr THEN 'de' ELSE 'fr' END AS predicted""")
          .withColumn("is_match", col("predicted") === col("lang"))
          .orderBy(col("doc_id"))
      },
      Some {
        def hits(set: String) = s"len(list_filter(s, x -> x IN ($set)))"
        val en = hits("'the', 'a', 'and'")
        val es = hits("'el', 'la', 'los'")
        val de = hits("'der', 'die', 'und'")
        val fr = hits("'le', 'les', 'et'")
        s"""
        SELECT doc_id, lang,
          $en AS en_hits, $es AS es_hits, $de AS de_hits, $fr AS fr_hits,
          CASE WHEN $en >= $es AND $en >= $de AND $en >= $fr THEN 'en'
               WHEN $es >= $de AND $es >= $fr THEN 'es'
               WHEN $de >= $fr THEN 'de' ELSE 'fr' END AS predicted,
          (CASE WHEN $en >= $es AND $en >= $de AND $en >= $fr THEN 'en'
                WHEN $es >= $de AND $es >= $fr THEN 'es'
                WHEN $de >= $fr THEN 'de' ELSE 'fr' END) = lang AS is_match
        FROM (SELECT doc_id, lang, $duckToks s FROM documents)
        ORDER BY doc_id"""
      }),

    // Document fingerprinting: content hash + order-insensitive vocab hash.
    QueryDef(
      "q_text_fingerprint",
      t => t.documents.selectExpr(
        "doc_id",
        "md5(lower(trim(text))) AS content_fp",
        s"md5(concat_ws('|', array_sort(array_distinct($toks)))) AS vocab_fp",
        s"CAST(size($toks) AS BIGINT) AS token_cnt")
        .orderBy(col("doc_id")),
      Some(s"""
        SELECT doc_id,
          md5(lower(trim(text))) AS content_fp,
          md5(array_to_string(list_sort(list_distinct(s)), '|')) AS vocab_fp,
          len(s) AS token_cnt
        FROM (SELECT doc_id, text, $duckToks s FROM documents)
        ORDER BY doc_id""")),

    // P3/P4 (case-insensitive substring search) + P9 (conjunctive
    // predicates) + O1/O3 (sort + offset/limit pagination) over documents.
    QueryDef(
      "q_search_documents",
      t => t.documents
        .filter(lower(col("text")).contains("query") &&
          col("n_chars").between(100, 400))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
        .offset(10)
        .limit(10),
      Some("""
        SELECT doc_id, lang, source, n_chars
        FROM documents
        WHERE contains(lower(text), 'query') AND n_chars BETWEEN 100 AND 400
        ORDER BY n_chars DESC, doc_id
        LIMIT 10 OFFSET 10""")),

    // A14-A16 array-function family (size/filter/transform/slice/sort)
    // as scalar outputs over the token array.
    QueryDef(
      "q_text_array_functions",
      t => t.documents.selectExpr(
        "doc_id",
        s"concat_ws(' ', slice($toks, 1, 3)) AS first3",
        s"array_contains($toks, 'data') AS has_data",
        s"CAST(size(filter($toks, x -> length(x) > 5)) AS BIGINT) AS long_token_cnt",
        s"CAST(array_max($tokLens) AS BIGINT) AS max_token_len",
        s"element_at(array_sort(array_distinct($toks)), 2) AS second_distinct")
        .orderBy(col("doc_id")),
      Some(s"""
        SELECT doc_id,
          array_to_string(s[1:3], ' ') AS first3,
          list_contains(s, 'data') AS has_data,
          len(list_filter(s, x -> length(x) > 5)) AS long_token_cnt,
          list_max(list_transform(s, x -> length(x))) AS max_token_len,
          list_sort(list_distinct(s))[2] AS second_distinct
        FROM (SELECT doc_id, $duckToks s FROM documents)
        ORDER BY doc_id""")),

    // BPE-ish regex tokenization (builder-prompt: "whitespace + a
    // BPE-ish regex"): letter runs / digit runs / single
    // non-alphanumerics — the pre-merge segmentation a BPE tokenizer
    // starts from. Pure map-side regexp_extract_all.
    QueryDef(
      "q_text_bpe_tokens",
      t => {
        // lit() pattern: a SQL string literal would eat the \s escape.
        t.documents
          .withColumn("st", regexp_extract_all(col("text"),
            lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
          .selectExpr("doc_id",
            "CAST(size(st) AS BIGINT) AS subword_cnt",
            "CAST(size(array_distinct(st)) AS BIGINT) AS distinct_cnt",
            "CAST(size(filter(st, x -> x rlike '^[a-zA-Z]+$')) AS BIGINT) AS alpha_cnt",
            "CAST(size(filter(st, x -> x rlike '^[0-9]+$')) AS BIGINT) AS digit_cnt")
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id,
          len(st) AS subword_cnt,
          len(list_distinct(st)) AS distinct_cnt,
          len(list_filter(st, x -> regexp_full_match(x, '[a-zA-Z]+'))) AS alpha_cnt,
          len(list_filter(st, x -> regexp_full_match(x, '[0-9]+'))) AS digit_cnt
        FROM (SELECT doc_id,
                regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]') AS st
              FROM documents)
        ORDER BY doc_id""")),

    // Rolling-hash fingerprinting (builder-prompt: "document
    // fingerprinting (rolling hash)"): Karp-Rabin polynomial hash over
    // token hashes mod 1e9+7, plus winnowing-style distinct window
    // minima (the MOSS fingerprint set). Token hash = first 32 bits of
    // md5, identical in both engines; modular fold keeps every value in
    // BIGINT range so overflow semantics never diverge.
    QueryDef(
      "q_text_rolling_fp",
      t => {
        val p = 1000000007L
        t.documents
          .withColumn("hs", expr(
            s"transform($toks, x -> CAST(conv(substring(md5(x), 1, 8), 16, 10) AS BIGINT))"))
          .selectExpr("doc_id",
            s"aggregate(hs, CAST(0 AS BIGINT), (acc, h) -> pmod(acc * 131 + h, $p)) AS rolling_fp",
            """CASE WHEN size(hs) >= 4
              |  THEN CAST(size(array_distinct(
              |    transform(sequence(1, size(hs) - 3), i -> array_min(slice(hs, i, 4))))) AS BIGINT)
              |  ELSE CAST(0 AS BIGINT) END AS winnow_cnt""".stripMargin,
            "CAST(size(hs) AS BIGINT) AS token_cnt")
          .orderBy(col("doc_id"))
      },
      Some(s"""
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
            (acc, h) -> (acc * 131 + h) % 1000000007) AS rolling_fp,
          CASE WHEN len(hs) >= 4
            THEN len(list_distinct([ list_min(hs[i:i+3]) for i in range(1, len(hs) - 2) ]))
            ELSE 0 END AS winnow_cnt,
          len(hs) AS token_cnt
        FROM (SELECT doc_id,
                list_transform($duckToks, x -> TRY_CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)) AS hs
              FROM documents)
        ORDER BY doc_id""")),

    // Multimodal plumbing: text payload as an opaque binary column with
    // typed metadata — byte length, content digest, header prefix. The
    // decode/feature-extract stage is the stubbed operator
    // (graft.operators.Multimodal, spec-tested); this query exercises the
    // real Spark-side schema + binary functions end-to-end.
    QueryDef(
      "q_multimodal_payload",
      t => t.documents
        .withColumn("payload", col("text").cast("binary"))
        .select(
          col("doc_id"),
          lit("text/plain").as("kind"),
          length(col("payload")).cast("long").as("byte_len"),
          sha2(col("payload"), 256).as("sha"),
          lower(substring(hex(col("payload")), 1, 16)).as("header_hex"))
        .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id,
          'text/plain' AS kind,
          octet_length(encode(text)) AS byte_len,
          sha256(text) AS sha,
          lower(substr(hex(encode(text)), 1, 16)) AS header_hex
        FROM documents
        ORDER BY doc_id""")),

    // TF-IDF term ranking — the classic relevance/feature weight a
    // training-data pipeline derives from a corpus. Term frequencies and
    // document frequencies are two aggregations over ONE exploded token
    // pass; N arrives as a broadcast scalar; ln() runs identically in
    // both engines and everything rounds to 6 decimals BEFORE ranking so
    // the top-3-per-doc window is deterministic (term tiebreak).
    // Scale: df is a global aggregate that shrinks to |vocabulary|; the
    // per-doc side never shuffles text, only (doc_id, term, tf).
    QueryDef(
      "q_text_tfidf",
      t => {
        val terms = t.documents.selectExpr("doc_id", s"explode($toks) AS term")
        val tf = terms.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val df = terms.distinct().groupBy(col("term"))
          .agg(count(lit(1)).as("df"))
        val nDocs = t.documents.agg(count(lit(1)).as("n_docs"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term").asc)
        tf.filter(col("doc_id") < 10)
          .join(df, Seq("term"))
          .crossJoin(broadcast(nDocs))
          .withColumn("tfidf", round(col("tf") * log(col("n_docs") / col("df")), 6))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"), col("tfidf"))
          .orderBy(col("doc_id"), col("rk"))
      },
      Some(s"""
        WITH s AS (
          SELECT doc_id, unnest(toks) term
          FROM (SELECT doc_id, $duckToks toks FROM documents)),
        tf AS (SELECT doc_id, term, COUNT(*) tf FROM s GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(DISTINCT doc_id) df FROM s GROUP BY term),
        n AS (SELECT COUNT(*) n_docs FROM documents)
        SELECT doc_id, rk, term, tf, df, tfidf FROM (
          SELECT t.doc_id, t.term, t.tf, d.df,
            round(t.tf * ln((SELECT n_docs FROM n) / d.df), 6) tfidf,
            CAST(row_number() OVER (PARTITION BY t.doc_id
              ORDER BY round(t.tf * ln((SELECT n_docs FROM n) / d.df), 6) DESC,
                       t.term) AS BIGINT) rk
          FROM tf t JOIN df d USING (term)
          WHERE t.doc_id < 10)
        WHERE rk <= 3
        ORDER BY doc_id, rk""")),

    // Quality-filter FUNNEL: the keep/drop decision a pretraining corpus
    // filter makes, with the FIRST failing rule as the drop reason —
    // language gate, length band, minimum tokens, stopword saturation,
    // repetition (type/token ratio). One map-side CASE per doc, one
    // tiny aggregation: the whole funnel reads the corpus once.
    QueryDef(
      "q_docs_quality_funnel",
      t => t.documents.selectExpr(
          s"""CASE
            WHEN lang <> 'en' THEN 'drop_lang'
            WHEN n_chars < 100 OR n_chars > 10000 THEN 'drop_length'
            WHEN size($toks) < 20 THEN 'drop_tokens'
            WHEN size(filter($toks, x -> x IN $stopSet)) / CAST(size($toks) AS DOUBLE) > 0.4 THEN 'drop_stopwords'
            WHEN size(array_distinct($toks)) / CAST(size($toks) AS DOUBLE) < 0.3 THEN 'drop_repetition'
            ELSE 'kept' END AS verdict""")
        .groupBy(col("verdict"))
        .agg(count(lit(1)).as("doc_cnt"))
        .orderBy(col("verdict")),
      Some(s"""
        SELECT CASE
            WHEN lang <> 'en' THEN 'drop_lang'
            WHEN n_chars < 100 OR n_chars > 10000 THEN 'drop_length'
            WHEN len(s) < 20 THEN 'drop_tokens'
            WHEN len(list_filter(s, x -> x IN $stopSet)) / CAST(len(s) AS DOUBLE) > 0.4 THEN 'drop_stopwords'
            WHEN len(list_distinct(s)) / CAST(len(s) AS DOUBLE) < 0.3 THEN 'drop_repetition'
            ELSE 'kept' END AS verdict,
          COUNT(*) AS doc_cnt
        FROM (SELECT lang, n_chars, $duckToks s FROM documents)
        GROUP BY verdict
        ORDER BY verdict""")),

    // Gopher-style repetition filters (Rae et al. 2021 §A1.1): fraction
    // of n-gram occurrences claimed by the single most frequent n-gram
    // (top-n-gram fraction) and by n-grams occurring more than once
    // (duplicate-n-gram fraction), for n = 2 and 3. The n-grams are
    // EXPLODED and counted via groupBy(doc_id, n, gram) — one shuffle
    // keyed on the composite, map-side partial combine — rather than a
    // per-row O(tokens²) self-count, so a pathological 1 M-token
    // document costs O(tokens) state like every other doc.
    QueryDef(
      "q_text_repetition",
      t => {
        val base = t.documents.selectExpr("doc_id", s"$toks AS s")
        val g2 = base.where(expr("size(s) >= 2")).selectExpr(
          "doc_id", "2 AS n",
          "explode(transform(sequence(1, size(s) - 1), i -> concat(element_at(s, i), ' ', element_at(s, i + 1)))) AS gram")
        val g3 = base.where(expr("size(s) >= 3")).selectExpr(
          "doc_id", "3 AS n",
          "explode(transform(sequence(1, size(s) - 2), i -> concat(element_at(s, i), ' ', element_at(s, i + 1), ' ', element_at(s, i + 2)))) AS gram")
        g2.unionByName(g3)
          .groupBy(col("doc_id"), col("n"), col("gram"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("doc_id"), col("n"))
          .agg(
            max(col("cnt")).as("top_cnt"),
            sum(col("cnt")).as("total"),
            sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup_occ"))
          .groupBy(col("doc_id"))
          .agg(
            round(max(when(col("n") === 2, col("top_cnt"))) /
              max(when(col("n") === 2, col("total"))).cast("double"), 6).as("top2_frac"),
            round(max(when(col("n") === 3, col("top_cnt"))) /
              max(when(col("n") === 3, col("total"))).cast("double"), 6).as("top3_frac"),
            round(max(when(col("n") === 2, col("dup_occ"))) /
              max(when(col("n") === 2, col("total"))).cast("double"), 6).as("dup2_frac"),
            round(max(when(col("n") === 3, col("dup_occ"))) /
              max(when(col("n") === 3, col("total"))).cast("double"), 6).as("dup3_frac"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH toks AS (SELECT doc_id, $duckToks AS s FROM documents),
        g AS (
          SELECT doc_id, 2 AS n,
                 unnest(list_transform(range(1, len(s)), i -> s[i] || ' ' || s[i + 1])) AS gram
          FROM toks WHERE len(s) >= 2
          UNION ALL
          SELECT doc_id, 3 AS n,
                 unnest(list_transform(range(1, len(s) - 1), i -> s[i] || ' ' || s[i + 1] || ' ' || s[i + 2])) AS gram
          FROM toks WHERE len(s) >= 3
        ),
        c AS (SELECT doc_id, n, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3),
        per AS (
          SELECT doc_id, n, max(cnt) AS top_cnt, sum(cnt) AS total,
                 sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_occ
          FROM c GROUP BY 1, 2
        )
        SELECT doc_id,
          round(max(CASE WHEN n = 2 THEN top_cnt END) / CAST(max(CASE WHEN n = 2 THEN total END) AS DOUBLE), 6) AS top2_frac,
          round(max(CASE WHEN n = 3 THEN top_cnt END) / CAST(max(CASE WHEN n = 3 THEN total END) AS DOUBLE), 6) AS top3_frac,
          round(max(CASE WHEN n = 2 THEN dup_occ END) / CAST(max(CASE WHEN n = 2 THEN total END) AS DOUBLE), 6) AS dup2_frac,
          round(max(CASE WHEN n = 3 THEN dup_occ END) / CAST(max(CASE WHEN n = 3 THEN total END) AS DOUBLE), 6) AS dup3_frac
        FROM per GROUP BY doc_id ORDER BY doc_id""")),

    // Skip-gram co-occurrence: (center, context) pair counts within a
    // ±2 token window — the training-pair extraction step of a
    // word2vec-style embedding pipeline. Pair generation is PURE
    // map-side (per-position transform over the token array, no
    // self-join on position); the only shuffle is the (center, context)
    // count, map-side combined. Top pairs by count with deterministic
    // tie-break.
    QueryDef(
      // SCALE SHAPE (kept deliberately, like q_text_repetition's): the
      // ±2-window pair expansion explodes to ~4 rows per token and
      // feeds a partially-aggregated groupBy — per-task state is O(one
      // batch), never O(document), so a pathological 1M-token document
      // costs streaming work, not one task's memory; a row-local
      // per-doc pair-count map (the HOF alternative) holds O(distinct
      // pairs per doc) in a single aggregate buffer and loses exactly
      // that bound. The r17 driver-window reading of 8.25 s at 32
      // cores did NOT reproduce (r18 re-measure at local[32], reps=5:
      // 1.08 s median, spread 1.068–1.077 — the window was host noise;
      // same verdict for q_events_hour_of_day / q_customer_rfm /
      // q_tx_stream_sink), so there is no regression to fix here.
      "q_text_skipgrams",
      t => {
        val pairs =
          s"""flatten(transform(sequence(1, size(s)), i ->
             |  filter(transform(sequence(greatest(1, i - 2), least(size(s), i + 2)),
             |    j -> IF(j = i, NULL, named_struct('center', element_at(s, i), 'context', element_at(s, j)))),
             |    x -> x IS NOT NULL)))""".stripMargin
        t.documents.selectExpr(s"$toks AS s")
          .where(expr("size(s) >= 2"))
          .selectExpr(s"explode($pairs) AS p")
          .groupBy(col("p.center").as("center"), col("p.context").as("context"))
          .agg(count(lit(1)).as("pair_cnt"))
          .orderBy(col("pair_cnt").desc, col("center"), col("context"))
          .limit(50)
      },
      Some(s"""
        WITH toks AS (SELECT $duckToks AS s FROM documents),
        pos AS (
          SELECT s, unnest(generate_series(1, len(s))) AS i
          FROM toks WHERE len(s) >= 2
        ),
        win AS (
          SELECT s, i,
                 unnest(generate_series(greatest(1, i - 2), least(len(s), i + 2))) AS j
          FROM pos
        )
        SELECT s[i] AS center, s[j] AS context, count(*) AS pair_cnt
        FROM win WHERE j <> i
        GROUP BY center, context
        ORDER BY pair_cnt DESC, center, context
        LIMIT 50"""))
  )
}
