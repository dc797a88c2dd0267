package graft.api

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Thin typed façade mirroring the reference's HTTP query surface
  * (SURVEY.md §3.1): dynamic conjunctive predicates (P9), user-selected
  * sort keys (O2, an enum — never string-interpolated into the plan),
  * and LIMIT/OFFSET pagination with a total count (O3) wrapped in a
  * [[Page]] envelope.
  *
  * Pagination runs two actions on one cached plan (count + page fetch),
  * like the reference's two queries (webapp/mysql_routes.py:106-115) but
  * without re-running the filters.
  */
final case class Page[T](items: Seq[T], page: Int, limit: Int, total: Long, pages: Long)

object QueryService {

  /** O2: allowed sort keys — a closed enum, matching
    * webapp/mysql_routes.py:480-494's whitelist. */
  sealed abstract class DocSort(val column: Column)
  object DocSort {
    case object CharsDesc extends DocSort(col("n_chars").desc)
    case object CharsAsc extends DocSort(col("n_chars").asc)
    case object IdAsc extends DocSort(col("doc_id").asc)
  }

  /** P9: optional filters AND-folded; absent params add no predicate
    * (and no join) — the query-builder concern Catalyst cannot elide
    * itself (SURVEY.md §4). */
  def searchDocuments(t: Tables,
                      textContains: Option[String] = None,
                      lang: Option[String] = None,
                      source: Option[String] = None,
                      minChars: Option[Int] = None,
                      sort: DocSort = DocSort.IdAsc,
                      page: Int = 1, limit: Int = 10): Page[Row] = {
    val preds: Seq[Column] = Seq(
      textContains.map(q => lower(col("text")).contains(q.toLowerCase)),
      lang.map(col("lang") === _),
      source.map(col("source") === _),
      minChars.map(col("n_chars") >= _)).flatten
    val filtered = preds.foldLeft(t.documents)((df, p) => df.filter(p))
    paginate(filtered.select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
      // doc_id tiebreak keeps pages disjoint and stable (total order).
      Seq(sort.column, col("doc_id").asc), page, limit)
  }

  /** O3: stable offset/limit pagination + total count on one plan. */
  def paginate(df: DataFrame, order: Seq[Column], page: Int, limit: Int): Page[Row] = {
    val cached = df.persist()
    try {
      val total = cached.count()
      val items = cached.orderBy(order: _*)
        .offset((page - 1) * limit).limit(limit).collect().toSeq
      Page(items, page, limit, total, (total + limit - 1) / limit)
    } finally cached.unpersist()
  }
}
