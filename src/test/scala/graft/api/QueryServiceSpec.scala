package graft.api

import graft.{SparkSpec, SparkSpec => S}
import graft.sources.Tables

class QueryServiceSpec extends SparkSpec {

  private def t = Tables(spark, S.Sf0001)

  test("pagination partitions the ordered result exactly") {
    val limit = 7
    val p1 = QueryService.searchDocuments(t, sort = QueryService.DocSort.CharsDesc, page = 1, limit = limit)
    val total = p1.total
    val pages = (1L to p1.pages).map(p =>
      QueryService.searchDocuments(t, sort = QueryService.DocSort.CharsDesc, page = p.toInt, limit = limit))
    val allIds = pages.flatMap(_.items.map(_.getAs[Long]("doc_id")))
    assert(allIds.length == total)
    assert(allIds.distinct.length == total, "pages overlap or skip rows")
    // Ordered by n_chars desc overall.
    val chars = pages.flatMap(_.items.map(_.getAs[Long]("n_chars")))
    assert(chars == chars.sortBy(-_))
  }

  test("dynamic conjunction narrows results; absent filters add nothing") {
    val all = QueryService.searchDocuments(t, limit = 10000)
    val en = QueryService.searchDocuments(t, lang = Some("en"), limit = 10000)
    assert(en.total <= all.total)
    assert(en.items.forall(_.getAs[String]("lang") == "en"))
    val enLong = QueryService.searchDocuments(t, lang = Some("en"), minChars = Some(200), limit = 10000)
    assert(enLong.total <= en.total)
    assert(enLong.items.forall(_.getAs[Long]("n_chars") >= 200))
  }

  test("sort key selection changes order, not membership") {
    val byChars = QueryService.searchDocuments(t, sort = QueryService.DocSort.CharsAsc, limit = 10000)
    val byId = QueryService.searchDocuments(t, sort = QueryService.DocSort.IdAsc, limit = 10000)
    assert(byChars.items.map(_.getAs[Long]("doc_id")).sorted ==
      byId.items.map(_.getAs[Long]("doc_id")).sorted)
    val chars = byChars.items.map(_.getAs[Long]("n_chars"))
    assert(chars == chars.sorted)
  }
}
