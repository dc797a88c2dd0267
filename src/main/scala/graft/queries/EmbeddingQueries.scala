package graft.queries

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.VectorOps
import graft.functions.Exact
import graft.sources.Tables

/** Similarity search over the `embeddings` table (builder-prompt
  * first-class family; no reference counterpart): brute-force cosine
  * top-k as the exact baseline, IVF-style nearest-centroid assignment as
  * the ANN scale path, and blocked near-duplicate detection.
  *
  * Numeric contract: every dot product / norm routes elementwise
  * products through exact decimals ([[VectorOps]]) so results are
  * order-independent and engine-identical; cosines are rounded to 6
  * decimals before any ranking or thresshold so the comparison layer and
  * the ranking see identical values on both engines.
  *
  * Scale notes: brute-force KNN broadcasts the (small) query set and
  * scans candidates once — at 100 TB this is the standard exact-rerank
  * stage. The IVF path shrinks the candidate scan by a cluster factor:
  * centroid assignment is one broadcast join (centroids ≪ vectors) and
  * search then touches only the probed cell — the same coarse-quantizer
  * structure as FAISS IVF, in pure relational ops.
  */
object EmbeddingQueries {

  /** vectors with exact squared norms (label normalized to BIGINT). */
  private def norms(t: Tables): DataFrame =
    t.embeddings.selectExpr(
      "vec_id",
      "CAST(label AS BIGINT) AS label",
      "CAST(embedding AS array<double>) AS e")
      .selectExpr("vec_id", "label", "e", s"${VectorOps.normSq("e")} AS nsq")

  /** The label-derived coarse quantizer collapsed to ONE broadcastable
    * row: `cents = array<struct<cl, c, cnsq>>` sorted by cl — per-label
    * exact-decimal per-dim means plus exact squared norms. The per-(cl,i)
    * explode touches k×dim rows (the ONE place vectors explode); the
    * single-row array then rides a broadcast so assignment/probing is a
    * map-side fold per vector ([[VectorOps.nearestCentroid]]) — no N×k
    * amplification, no window. FAISS keeps the coarse quantizer resident
    * for the same reason: k ≪ N. */
  private def centroidArr(vecs: DataFrame): DataFrame =
    vecs.selectExpr("label", "posexplode(e) AS (i, v)")
      .groupBy(col("label").as("cl"), col("i"))
      .agg((sum(expr("CAST(v AS DECIMAL(30,15))")).cast("double") / count(lit(1))).as("m"))
      .groupBy(col("cl"))
      .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("im"))
      .selectExpr("cl", "transform(im, x -> x.m) AS c")
      .selectExpr("cl", "c", s"${VectorOps.normSq("c")} AS cnsq")
      .agg(array_sort(collect_list(struct(col("cl"), col("c"), col("cnsq")))).as("cents"))

  private def r6(c: Column): Column = round(c, 6)

  /** k-means fit size: cells × Lloyd iterations (bounded, deterministic
    * — see [[graft.operators.KMeans]]). */
  private val KmK = 8
  private val KmIters = 3

  /** DuckDB twin of one Lloyd iteration `it` (reads `c${it-1}`, emits
    * `a$it` assignments, `m$it` per-(cell,dim) exact-decimal means,
    * `c$it` reassembled centroids) — the same arithmetic KMeans.step
    * runs, so the oracle replays the identical trajectory. */
  private[queries] def duckKmeansIter(it: Int): String = {
    val cos = s"round(${VectorOps.duckDot("v.e", "c.c", 64)} / (sqrt(v.nsq) * sqrt(c.cnsq)), 6)"
    s"""a$it AS (SELECT vec_id, cl FROM (
       |    SELECT v.vec_id, c.cl, row_number() OVER (PARTITION BY v.vec_id
       |      ORDER BY $cos DESC, c.cl) rk
       |    FROM n v CROSS JOIN c${it - 1} c) y$it WHERE rk = 1),
       |m$it AS (SELECT a.cl, el.i, CAST(SUM(CAST(el.v AS DECIMAL(30,15))) AS DOUBLE) / COUNT(*) m
       |    FROM el JOIN a$it a USING (vec_id) GROUP BY a.cl, el.i),
       |c$it AS (SELECT cl, c, ${VectorOps.duckNormSq("c", 64)} AS cnsq
       |    FROM (SELECT cl, list(m ORDER BY i) c FROM m$it GROUP BY cl) x$it)""".stripMargin
  }

  // `label` is only parseable as a column alias in DuckDB with an
  // explicit AS.
  private val duckVecs =
    "(SELECT vec_id, CAST(label AS BIGINT) AS label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)"
  private def duckNorms(dim: Int) =
    s"(SELECT vec_id, label, e, ${VectorOps.duckNormSq("e", dim)} AS nsq FROM $duckVecs v)"

  val defs: Seq[QueryDef] = Seq(

    // Per-cluster vector statistics (exact decimal mean of norms).
    QueryDef(
      "q_embed_stats",
      t => norms(t)
        .withColumn("norm", sqrt(col("nsq")))
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n"),
          r6(min(col("norm"))).as("min_norm"),
          r6(max(col("norm"))).as("max_norm"),
          r6(Exact.davg(col("norm"), 9)).as("avg_norm"))
        .orderBy(col("label")),
      Some(s"""
        SELECT label, COUNT(*) AS n,
          round(MIN(sqrt(nsq)), 6) AS min_norm,
          round(MAX(sqrt(nsq)), 6) AS max_norm,
          round(${Exact.sqlAvg("sqrt(nsq)", 9)}, 6) AS avg_norm
        FROM ${duckNorms(64)} n
        GROUP BY label
        ORDER BY label""")),

    // Brute-force cosine top-k: exact ANN baseline. Query set (vec_id<5)
    // broadcasts; one scan of the candidate side; per-query top-10 via
    // window (no global sort).
    QueryDef(
      "q_embed_knn",
      t => {
        val n = norms(t)
        val q = broadcast(n.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nsq").as("qnsq")))
        val c = n.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cand_id"), col("e").as("ce"), col("nsq").as("cnsq"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("cand_id").asc)
        q.join(c)
          .selectExpr("q_id", "cand_id",
            s"round(${VectorOps.cosine(VectorOps.dot("qe", "ce"), "qnsq", "cnsq")}, 6) AS cosine")
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 10)
          .select(col("q_id"), col("rk"), col("cand_id"), col("cosine"))
          .orderBy(col("q_id"), col("rk"))
      },
      Some(s"""
        WITH n AS (SELECT * FROM ${duckNorms(64)} x),
        pairs AS (
          SELECT q.vec_id q_id, c.vec_id cand_id,
            round(${VectorOps.duckDot("q.e", "c.e", 64)} / (sqrt(q.nsq) * sqrt(c.nsq)), 6) cosine
          FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id >= 5)
        SELECT q_id, rk, cand_id, cosine FROM (
          SELECT *, CAST(row_number() OVER
            (PARTITION BY q_id ORDER BY cosine DESC, cand_id) AS BIGINT) rk
          FROM pairs)
        WHERE rk <= 10
        ORDER BY q_id, rk""")),

    // IVF coarse quantizer: per-label centroids (exact decimal per-dim
    // means), then nearest-centroid assignment by cosine — confusion
    // counts of true label vs assigned cell. The centroid set broadcasts
    // as ONE array row and assignment is a map-side argmax fold per
    // vector (VectorOps.nearestCentroid): no N×k row amplification, no
    // window, no exchange between the scan and the final count — the
    // plan shape that survives real IVF k (thousands of cells).
    QueryDef(
      "q_embed_ivf",
      t => {
        val n = norms(t)
        n.crossJoin(broadcast(centroidArr(n)))
          .selectExpr("label",
            s"${VectorOps.nearestCentroid("cents", "e", "nsq")}.cl AS assigned")
          .groupBy(col("label"), col("assigned"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("label"), col("assigned"))
      },
      Some(s"""
        WITH elems AS (
          SELECT vec_id, label, nsq,
            unnest(generate_series(1, 64)) i, unnest(e) v
          FROM ${duckNorms(64)} n),
        centroids AS (
          SELECT label cl, i,
            CAST(SUM(CAST(v AS DECIMAL(30,15))) AS DOUBLE) / COUNT(*) m
          FROM elems GROUP BY cl, i),
        cnorm AS (
          SELECT cl, CAST(SUM(CAST(m * m AS DECIMAL(30,15))) AS DOUBLE) cnsq
          FROM centroids GROUP BY cl),
        dots AS (
          SELECT vec_id, label, nsq, cl,
            CAST(SUM(CAST(v * m AS DECIMAL(30,15))) AS DOUBLE) dot
          FROM elems JOIN centroids USING (i)
          GROUP BY vec_id, label, nsq, cl),
        assign AS (
          SELECT vec_id, label, cl,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY round(dot / (sqrt(nsq) * sqrt(cnsq)), 6) DESC, cl) rk
          FROM dots JOIN cnorm USING (cl))
        SELECT label, cl AS assigned, COUNT(*) AS cnt
        FROM assign WHERE rk = 1
        GROUP BY label, assigned
        ORDER BY label, assigned""")),

    // IVF SEARCH (completes the coarse-quantizer story of q_embed_ivf):
    // each query ranks the k centroids, probes its nprobe=2 nearest
    // cells, and pays exact cosine only against vectors IN those cells —
    // the candidate scan shrinks by ~k/nprobe vs brute force, the FAISS
    // IVF query path in relational ops. Centroids broadcast (k × dim
    // doubles); the probed-cell candidate join is an equi-join on the
    // cell id, so at scale each query touches only its cells' partitions.
    // Recall is the IVF trade: a true neighbor in an unprobed cell is
    // missed (exact baseline: q_embed_knn; both top-5 lists are
    // oracle-checked, so the miss pattern is pinned, not fuzzy).
    QueryDef(
      "q_embed_ivf_search",
      t => {
        val n = norms(t)
        val q = n.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nsq").as("qnsq"))
        val probe = q.crossJoin(broadcast(centroidArr(n)))
          .select(col("q_id"), col("qe"), col("qnsq"),
            explode(expr(VectorOps.probeCells("cents", "qe", "qnsq", 2))).as("cl"))
        val cands = n.filter(col("vec_id") >= 5)
          .select(col("label").as("cl"), col("vec_id").as("cand_id"),
            col("e").as("ce"), col("nsq").as("cnsq"))
        val wTop = Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("cand_id").asc)
        probe.join(cands, Seq("cl"))
          .selectExpr("q_id", "cand_id",
            s"round(${VectorOps.cosine(VectorOps.dot("qe", "ce"), "qnsq", "cnsq")}, 6) AS cosine")
          .withColumn("rk", row_number().over(wTop).cast("long"))
          .filter(col("rk") <= 5)
          .select(col("q_id"), col("rk"), col("cand_id"), col("cosine"))
          .orderBy(col("q_id"), col("rk"))
      },
      Some(s"""
        WITH n AS (SELECT * FROM ${duckNorms(64)} z),
        elems AS (
          SELECT vec_id, label,
            unnest(generate_series(1, 64)) i, unnest(e) v
          FROM n),
        centroids AS (
          SELECT label cl, i,
            CAST(SUM(CAST(v AS DECIMAL(30,15))) AS DOUBLE) / COUNT(*) m
          FROM elems GROUP BY cl, i),
        cnorm AS (
          SELECT cl, CAST(SUM(CAST(m * m AS DECIMAL(30,15))) AS DOUBLE) cnsq
          FROM centroids GROUP BY cl),
        qdots AS (
          SELECT e.vec_id q_id, c.cl,
            CAST(SUM(CAST(e.v * c.m AS DECIMAL(30,15))) AS DOUBLE) dot
          FROM elems e JOIN centroids c USING (i)
          WHERE e.vec_id < 5
          GROUP BY q_id, c.cl),
        probe AS (
          SELECT q_id, cl FROM (
            SELECT d.q_id, d.cl,
              row_number() OVER (PARTITION BY d.q_id
                ORDER BY round(d.dot / (sqrt(q.nsq) * sqrt(cn.cnsq)), 6) DESC, d.cl) crk
            FROM qdots d JOIN cnorm cn USING (cl)
            JOIN n q ON q.vec_id = d.q_id)
          WHERE crk <= 2),
        pairs AS (
          SELECT p.q_id, c.vec_id cand_id,
            round(${VectorOps.duckDot("q.e", "c.e", 64)} / (sqrt(q.nsq) * sqrt(c.nsq)), 6) cosine
          FROM probe p
          JOIN n q ON q.vec_id = p.q_id
          JOIN n c ON c.label = p.cl AND c.vec_id >= 5)
        SELECT q_id, rk, cand_id, cosine FROM (
          SELECT *, CAST(row_number() OVER
            (PARTITION BY q_id ORDER BY cosine DESC, cand_id) AS BIGINT) rk
          FROM pairs)
        WHERE rk <= 5
        ORDER BY q_id, rk""")),

    // LEARNED IVF quantizer: bounded k-means (KmK cells, KmIters Lloyd
    // iterations, deterministic smallest-id seeding — operators/KMeans)
    // instead of the label column the two queries above lean on — a real
    // embedding corpus has no labels. Per-cell population and mean
    // assignment cosine of the FITTED clustering; the DuckDB oracle
    // replays the identical iterations, so the whole trajectory (seeds,
    // every assignment pass, exact-decimal means) is hash-checked, not
    // just the final counts. Assignment stages are map-side folds over
    // the driver-resident centroid literal — no window, no N×k shuffle.
    QueryDef(
      "q_embed_ivf_kmeans",
      t => {
        import graft.operators.KMeans
        // Persisted: feeds every Lloyd iteration plus the final
        // assignment pass (KmIters + 1 scans otherwise).
        val vecs = norms(t)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cents = KMeans.fit(vecs, KmK, KmIters)
        graft.CacheJanitor.afterTerminalAction(vecs
          .selectExpr(
            s"${VectorOps.nearestCentroid(KMeans.literal(cents), "e", "nsq")} AS best")
          .groupBy(col("best.cl").as("cell"))
          .agg(count(lit(1)).as("n"),
            round(Exact.davg(col("best.cos"), 9), 6).as("avg_cos"))
          .orderBy(col("cell")), Seq(vecs))
      },
      Some {
        val cos = s"round(${VectorOps.duckDot("v.e", "c.c", 64)} / (sqrt(v.nsq) * sqrt(c.cnsq)), 6)"
        s"""
        WITH n AS (SELECT * FROM ${duckNorms(64)} z),
        el AS (SELECT vec_id, unnest(generate_series(1, 64)) i, unnest(e) v FROM n),
        c0 AS (SELECT vec_id AS cl, e AS c, nsq AS cnsq FROM n WHERE vec_id < $KmK),
        ${(1 to KmIters).map(duckKmeansIter).mkString(",\n        ")},
        fin AS (SELECT vec_id, cl AS cell, cos FROM (
            SELECT v.vec_id, c.cl, $cos cos,
              row_number() OVER (PARTITION BY v.vec_id ORDER BY $cos DESC, c.cl) rk
            FROM n v CROSS JOIN c$KmIters c) y WHERE rk = 1)
        SELECT cell, COUNT(*) AS n, round(${Exact.sqlAvg("cos", 9)}, 6) AS avg_cos
        FROM fin GROUP BY cell ORDER BY cell"""
      }),

    // Banded LSH ANN (the scale path that needs no labels): 8 bands × 4
    // random-hyperplane bits each; a pair is a candidate iff it collides
    // in ANY band, then the two-phase prefilter + exact-decimal cosine
    // verifies. See [[VectorOps.bandBucket]] for the recall derivation
    // (1 − (1 − p^bits)^bands ≈ 0.71 at cosine 0.35, ≈ 0.998 at 0.9)
    // and the two scale knobs (bits → bucket sparsity, bands → recall).
    // The candidate self-join shuffles only (band, bucket, vec_id) —
    // vectors are fetched back by id AFTER the distinct pair set is
    // known, so the wide embedding arrays never ride the quadratic join.
    QueryDef(
      "q_embed_lsh",
      t => {
        val (bands, bits) = (8, 4)
        val n = norms(t)
          .selectExpr("vec_id", "e", "nsq",
            s"${VectorOps.bandBuckets("e", bands, bits, 64)} AS bks")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val keys = n.select(col("vec_id"),
          posexplode(col("bks")).as(Seq("band", "bucket")))
        val cand = keys.as("x").join(keys.as("y"),
            col("x.band") === col("y.band") &&
              col("x.bucket") === col("y.bucket") &&
              col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
          .distinct() // a close pair usually collides in several bands
        val va = n.select(col("vec_id").as("a"), col("e").as("ea"), col("nsq").as("na"))
        val vb = n.select(col("vec_id").as("b"), col("e").as("eb"), col("nsq").as("nb"))
        graft.CacheJanitor.afterTerminalAction(
          cand.join(va, Seq("a")).join(vb, Seq("b"))
            .withColumn("__approx",
              expr(VectorOps.cosine("graft_dot(ea, eb)", "na", "nb")))
            .filter(col("__approx") >= 0.34999)
            .selectExpr("a", "b",
              s"round(${VectorOps.cosine(VectorOps.dot("ea", "eb"), "na", "nb")}, 6) AS cosine")
            .filter(col("cosine") >= 0.35)
            .orderBy(col("a"), col("b")), Seq(n))
      },
      Some {
        val (bands, bits) = (8, 4)
        val keyUnion = (0 until bands).map { band =>
          s"SELECT vec_id, $band AS band, ${VectorOps.duckBandBucket("e", band, bits, 64)} AS bucket FROM n"
        }.mkString("\n          UNION ALL ")
        s"""
        WITH n AS (SELECT vec_id, e, nsq FROM ${duckNorms(64)} z),
        keys AS (
          $keyUnion),
        cand AS (
          SELECT DISTINCT x.vec_id a, y.vec_id b
          FROM keys x JOIN keys y
            ON x.band = y.band AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
        SELECT c.a, c.b,
          round(${VectorOps.duckDot("x.e", "y.e", 64)} / (sqrt(x.nsq) * sqrt(y.nsq)), 6) cosine
        FROM cand c JOIN n x ON x.vec_id = c.a JOIN n y ON y.vec_id = c.b
        WHERE round(${VectorOps.duckDot("x.e", "y.e", 64)} / (sqrt(x.nsq) * sqrt(y.nsq)), 6) >= 0.35
        ORDER BY a, b"""
      }),

    // Blocked near-dup, IVF-block × LSH hybrid: candidates must share
    // the coarse quantizer cell (label) AND collide in at least one LSH
    // band INSIDE the cell — so in-cell pair work drops from O(cell²) to
    // O(bands · cell²/2^bits), the fix for "blocking alone is still
    // quadratic within a hot cell". Recall inside a cell follows the
    // banding bound in [[VectorOps.bandBucket]]; across cells it is the
    // blocking trade (exact path: q_embed_knn). Candidate generation
    // shuffles only (label, band, bucket, vec_id); the two-phase
    // prefilter + exact-decimal cosine verifies survivors. round(c,6)
    // >= 0.35 ⇔ c >= 0.3499995, so 0.34999 is a conservative prefilter
    // bound (double-vs-decimal drift ≲ 1e-12).
    QueryDef(
      "q_embed_neardup",
      t => {
        val caches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        graft.CacheJanitor.afterTerminalAction(
          neardupPairs(t, caches).orderBy(col("a"), col("b")), caches.toSeq)
      },
      Some(s"""
        WITH $duckNeardupCtes
        SELECT label, a, b, cosine FROM pairs ORDER BY a, b""")),

    // Embedding near-dup pairs → semantic dedup GROUPS: the same
    // min-label connected components that turn text near-dup pairs into
    // clusters (q_dedup_components), here over the verified cosine
    // graph — the "keep one per semantic cluster" decision a
    // training-data pipeline makes after embedding-based dedup.
    // Consumes the STAGED pairs (one localCheckpoint per session ×
    // dataset, same design as DedupQueries.verifiedPairs) so clustering
    // never re-mines candidates; the pipeline cost stays measured in
    // q_embed_neardup, which remains self-contained. Oracle: recursive
    // reachability closure over the identical pair SQL.
    QueryDef(
      "q_embed_dedup_groups",
      t => graft.operators.GraphOps.connectedComponents(
          t.spark,
          stagedNeardupPairs(t).select(col("a").as("src"), col("b").as("dst")),
          maxIter = 20)
        .select(col("node").as("vec_id"), col("component"))
        .orderBy(col("vec_id")),
      Some(s"""
        WITH RECURSIVE $duckNeardupCtes,
        edges AS (SELECT a s, b d FROM pairs UNION ALL SELECT b, a FROM pairs),
        reach(node, lab) AS (
          SELECT DISTINCT s, s FROM edges
          UNION
          SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node)
        SELECT node AS vec_id, MIN(lab) AS component
        FROM reach GROUP BY node ORDER BY vec_id"""))
  )

  /** Staged verified pairs: computed once per (session, dataset) as an
    * eager lineage-cut frame that survives catalog.clearCache — the
    * in-session analogue of the staging parquet table this becomes at
    * 100 TB. [[graft.operators.Stages]] owns the lifecycle (sessionUUID
    * keys, released by `Stages.drop`); the pipeline's caches are freed
    * once the stage exists. */
  private def stagedNeardupPairs(t: Tables): DataFrame =
    graft.operators.Stages.frame(t.spark, s"embed_neardup_pairs:${t.dir}") { caches =>
      neardupPairs(t, caches)
    }

  /** Banded-LSH candidate generation + two-phase cosine verify, shared
    * by the pair report and the dedup-groups clustering. Pairs are
    * within-label (the label gate keeps the candidate space honest on
    * the synthetic fixture). */
  private def neardupPairs(
      t: Tables,
      caches: scala.collection.mutable.ArrayBuffer[DataFrame] =
        scala.collection.mutable.ArrayBuffer.empty): DataFrame = {
    val (bands, bits) = (8, 4)
    val n = norms(t)
      .selectExpr("vec_id", "label", "e", "nsq",
        s"${VectorOps.bandBuckets("e", bands, bits, 64)} AS bks")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    caches += n
    val keys = n.select(col("label"), col("vec_id"),
      posexplode(col("bks")).as(Seq("band", "bucket")))
    val cand = keys.as("x").join(keys.as("y"),
        col("x.label") === col("y.label") &&
          col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.label").as("label"),
        col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct()
    val va = n.select(col("vec_id").as("a"), col("e").as("ea"), col("nsq").as("na"))
    val vb = n.select(col("vec_id").as("b"), col("e").as("eb"), col("nsq").as("nb"))
    cand.join(va, Seq("a")).join(vb, Seq("b"))
      .withColumn("__approx",
        expr(VectorOps.cosine("graft_dot(ea, eb)", "na", "nb")))
      .filter(col("__approx") >= 0.34999)
      .selectExpr("label", "a", "b",
        s"round(${VectorOps.cosine(VectorOps.dot("ea", "eb"), "na", "nb")}, 6) AS cosine")
      .filter(col("cosine") >= 0.35)
  }

  /** The near-dup WITH blocks (through the verified `pairs` CTE),
    * shared by the pair oracle and the groups-closure oracle. */
  private lazy val duckNeardupCtes: String = {
    val (bands, bits) = (8, 4)
    val keyUnion = (0 until bands).map { band =>
      s"SELECT vec_id, label, $band AS band, ${VectorOps.duckBandBucket("e", band, bits, 64)} AS bucket FROM n"
    }.mkString("\n          UNION ALL ")
    s"""n AS (SELECT vec_id, label, e, nsq FROM ${duckNorms(64)} z),
        keys AS (
          $keyUnion),
        cand AS (
          SELECT DISTINCT x.label, x.vec_id a, y.vec_id b
          FROM keys x JOIN keys y
            ON x.label = y.label AND x.band = y.band AND x.bucket = y.bucket
              AND x.vec_id < y.vec_id),
        pairs AS (
          SELECT c.label, c.a, c.b,
            round(${VectorOps.duckDot("x.e", "y.e", 64)} / (sqrt(x.nsq) * sqrt(y.nsq)), 6) cosine
          FROM cand c JOIN n x ON x.vec_id = c.a JOIN n y ON y.vec_id = c.b
          WHERE round(${VectorOps.duckDot("x.e", "y.e", 64)} / (sqrt(x.nsq) * sqrt(y.nsq)), 6) >= 0.35)"""
  }
}
