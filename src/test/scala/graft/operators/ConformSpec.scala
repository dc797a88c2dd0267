package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The coercion tolerance the reference hand-rolls per request
  * (webapp/mongodb_routes.py:151-274): JSON-native and Python-repr
  * value formats must conform to the same typed values.
  */
class ConformSpec extends SparkSpec {
  import Conform._

  private def conform(jsons: String*) = {
    val spark0 = spark
    import spark0.implicits._
    jsons.toSeq.toDF("props")
      .withColumn("conf", Conform.conformed(col("props"), Seq(
        KeySpec("flag", BoolKey),
        KeySpec("price", IntKey),
        KeySpec("tier", StrKey),
        KeySpec("lot", "parking.lot", BoolKey))))
      .select(col("conf.flag"), col("conf.price"), col("conf.tier"), col("conf.lot"))
      .collect().toSeq.map(_.toSeq)
  }

  test("bool: JSON true/false and Python 'True'/'False' strings conform") {
    assert(conform(
      """{"flag": true}""",
      """{"flag": "True"}""",
      """{"flag": "false"}""",
      """{"flag": "u'True'"}""",
      """{"flag": "None"}""",
      """{}""").map(_.head) ==
      Seq(true, true, false, true, null, null))
  }

  test("int: JSON number and digit-string conform; junk is null not throw") {
    assert(conform(
      """{"price": 3}""",
      """{"price": "2"}""",
      """{"price": "-7"}""",
      """{"price": "cheap"}""",
      """{}""").map(_(1)) ==
      Seq(3L, 2L, -7L, null, null))
  }

  test("str: u''-wrapped and quoted values strip to the clean string") {
    assert(conform(
      """{"tier": "u'casual'"}""",
      """{"tier": "'quiet'"}""",
      """{"tier": "plain"}""",
      """{}""").map(_(2)) ==
      Seq("casual", "quiet", "plain", null))
  }

  test("nested object attribute probes via dotted path (BusinessParking shape)") {
    assert(conform(
      """{"parking": {"lot": true}}""",
      """{"parking": {"lot": "True"}}""",
      """{"parking": {"garage": true}}""",
      """{}""").map(_(3)) ==
      Seq(true, true, null, null))
  }

  test("spark and duckdb coercions agree symbolically on the wrapper regex") {
    // The duck twin must strip the SAME wrappers; spot-check the SQL text
    // carries the shared pattern (full cross-engine equality is enforced
    // by the q_events_props_conformed oracle in the driver gate).
    val sql = Conform.duckCoerce("props", KeySpec("tier", StrKey))
    assert(sql.contains("""'^u?''(.*)''$|^"(.*)"$'"""))
  }
}
