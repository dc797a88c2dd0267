package graft.etl

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.types._

class RawReaderSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("stars", DoubleType),
    StructField("loaded_at", LongType)))

  test("JSONL ingest: corrupt lines captured, required-field rejects split, keyed dedup deterministic") {
    val dir = Files.createTempDirectory("graft_raw")
    val file = dir.resolve("data.jsonl")
    Files.writeString(file,
      """{"id": 1, "name": "a", "stars": 4.0, "loaded_at": 1}
        |{"id": 2, "stars": 3.0, "loaded_at": 2}
        |not json at all
        |{"id": 1, "name": "dup-later", "stars": 1.0, "loaded_at": 5}
        |{"id": 1, "name": "dup-earliest", "stars": 2.0, "loaded_at": 0}
        |{"id": 3, "name": "c", "stars": 5.0, "loaded_at": 3}
        |""".stripMargin)
    val out = RawReader.readJsonl(spark, file.toString, schema,
      required = Seq("id", "name"), key = "id", orderCol = "loaded_at")

    val valid = out.valid.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("name")).toMap
    assert(valid == Map(1L -> "dup-earliest", 3L -> "c"))

    val reasons = out.rejected.collect().map(_.getAs[String]("reason")).sorted.toSeq
    assert(reasons == Seq("corrupt_record", "missing_required"))
  }

  test("CSV ingest follows the same split + dedup pipeline") {
    val dir = Files.createTempDirectory("graft_csv")
    val file = dir.resolve("data.csv")
    Files.writeString(file,
      """id,name,stars,loaded_at
        |1,a,4.0,1
        |2,,3.0,2
        |1,dup,1.0,5
        |3,c,notanumber,3
        |4,d,5.0,4
        |""".stripMargin)
    val out = RawReader.readCsv(spark, file.toString, schema,
      required = Seq("id", "name"), key = "id", orderCol = "loaded_at")
    val valid = out.valid.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("name")).toMap
    assert(valid == Map(1L -> "a", 4L -> "d"))
    val reasons = out.rejected.collect().map(_.getAs[String]("reason")).sorted.toSeq
    assert(reasons == Seq("corrupt_record", "missing_required"))
  }
}
