package graft.api

/** Deterministic port of the reference's synthetic hour-distribution
  * templates (SURVEY.md §2.10; reference webapp/mysql_routes.py:236-280):
  * the endpoint has no per-hour data, so it picks a 24-slot template by
  * category keyword and scales it so the template's peak equals the
  * observed peak day count. Pure function — the `random`-based fallbacks
  * around it in the reference are presentation noise and intentionally
  * NOT ported (SURVEY.md §7.4.7).
  */
object HourPatterns {

  val Restaurant: Vector[Int] = Vector(0, 0, 0, 0, 0, 0, 1, 3, 8, 12, 15, 20,
    25, 18, 10, 5, 8, 15, 25, 20, 12, 8, 3, 1)
  val Bar: Vector[Int] = Vector(5, 2, 1, 0, 0, 0, 0, 0, 1, 2, 5, 8,
    10, 12, 15, 18, 20, 25, 30, 35, 40, 35, 25, 15)
  val Retail: Vector[Int] = Vector(0, 0, 0, 0, 0, 0, 0, 2, 5, 10, 15, 20,
    25, 30, 25, 20, 15, 10, 8, 5, 2, 0, 0, 0)
  val Default: Vector[Int] = Vector(0, 0, 0, 0, 0, 1, 2, 5, 10, 15, 20, 25,
    30, 25, 20, 15, 10, 8, 5, 3, 2, 1, 0, 0)

  private val restaurantKeys = Set("restaurant", "food", "cafe", "coffee")
  private val barKeys = Set("bar", "nightlife", "pub")
  private val retailKeys = Set("shop", "store", "retail")

  /** Template selection by category keywords (first match wins, in the
    * reference's precedence order). Membership is EXACT equality on the
    * lowercased category — the reference's Python `cat in [...]` is a
    * list-membership test, so "restaurants" (plural) falls through to
    * Default there too; faithfully preserved. */
  def templateFor(categories: Seq[String]): Vector[Int] = {
    val lower = categories.map(_.toLowerCase)
    if (lower.exists(restaurantKeys)) Restaurant
    else if (lower.exists(barKeys)) Bar
    else if (lower.exists(retailKeys)) Retail
    else Default
  }

  /** Scale a template so its peak equals the observed peak day count
    * (reference's integer-truncating arithmetic preserved). */
  def scaled(template: Vector[Int], dayDistribution: Seq[Long]): Vector[Long] = {
    val maxDay: Double =
      if (dayDistribution.nonEmpty && dayDistribution.max > 0) dayDistribution.max.toDouble
      else 100.0
    val maxTpl = template.max
    val factor = if (maxTpl > 0) maxDay / maxTpl else 1.0
    template.map(v => (v * factor).toLong)
  }

  def hourDistribution(categories: Seq[String], dayDistribution: Seq[Long]): Vector[Long] =
    scaled(templateFor(categories), dayDistribution)
}
