package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Exact
import graft.operators.{AsOfJoin, TextOps}

/** Property tests (SURVEY.md §5 test plan): the invariants that make the
  * engine's numbers trustworthy across engines, partitionings and
  * input orders. Generators are ScalaCheck `Gen`s driven with fixed
  * seeds (scalatest-scalacheck bridge isn't in the offline cache), so
  * failures reproduce exactly.
  */
class PropertiesSpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private def forAllSeeded[A](gen: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    samples(gen, n).foreach(body)

  private def forAllSeeded2[A, B](ga: Gen[A], gb: Gen[B], n: Int)(body: (A, B) => Unit): Unit =
    samples(ga, n).zip(samples(gb.map(identity), n)).foreach { case (a, b) => body(a, b) }

  test("exact decimal sum is independent of row order and partitioning") {
    val s = spark
    import s.implicits._
    forAllSeeded(Gen.listOfN(60, Gen.chooseNum(-1e6, 1e6).map(v => math.rint(v * 100) / 100)), 5) { xs =>
      def total(seq: Seq[Double], parts: Int): Double =
        seq.toDF("v").repartition(parts).agg(Exact.dsum(col("v"))).collect()(0).getDouble(0)
      val t1 = total(xs, 1)
      val t2 = total(new scala.util.Random(7).shuffle(xs), 7)
      assert(t1 == t2, s"order/partitioning changed the sum: $t1 vs $t2")
    }
  }

  test("as-of join agrees with a brute-force per-row lookup") {
    val s = spark
    import s.implicits._
    val evGen = Gen.listOfN(25, for {
      k <- Gen.chooseNum(1L, 4L); t <- Gen.chooseNum(0L, 1000L)
    } yield (k, t))
    val refGen = Gen.listOfN(15, for {
      k <- Gen.chooseNum(1L, 4L); t <- Gen.chooseNum(0L, 1000L); v <- Gen.chooseNum(0L, 99L)
    } yield (k, t, v))
    forAllSeeded2(evGen, refGen, 5) { (evs, refs) =>
      val left = evs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, new java.sql.Timestamp(t * 1000)) }
        .toDF("id", "k", "t")
      val right = refs.map { case (k, t, v) => (k, new java.sql.Timestamp(t * 1000), v.toString) }
        .toDF("k", "t", "v")
      val out = AsOfJoin.lastValueAsOf(left, col("k"), col("t"),
        right, col("k"), col("t"), col("v"), "vv")
        .select("id", "vv").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      evs.zipWithIndex.foreach { case ((k, t), i) =>
        val candidates = refs.filter(r => r._1 == k && r._2 <= t)
        val expected =
          if (candidates.isEmpty) None
          // max time; ties broken by max value (the operator's contract)
          else Some(candidates.maxBy(r => (r._2, r._3.toString))._3.toString)
        assert(out(i.toLong) == expected, s"key=$k t=$t")
      }
    }
  }

  test("native minhash/simhash equal the SQL formulation on random text") {
    val s = spark
    import s.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val doc = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    forAllSeeded(Gen.listOfN(8, doc), 5) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val shs = TextOps.shingles(TextOps.tokens("text"))
      val native = df.selectExpr("doc_id", s"graft_minhash($shs, 6) AS mh", s"graft_simhash32($shs) AS sh")
      val sql = df.selectExpr("doc_id",
        s"${TextOps.minhashSignature(shs, 6)} AS mh", s"${TextOps.simhash32(shs)} AS sh")
      assert(rows(native.orderBy("doc_id")) == rows(sql.orderBy("doc_id")))
    }
  }

  test("zero-filled distributions: fixed domain length, counts sum to table total") {
    val t = graft.sources.Tables(spark, SparkSpec.Sf0001)
    val dow = SparkEntry.queries("q_events_dow_distribution")(spark, SparkSpec.Sf0001)
    assert(dow.count() == 7)
    val hod = SparkEntry.queries("q_events_hour_of_day")(spark, SparkSpec.Sf0001)
    assert(hod.count() == 24)
    val total = t.events.count()
    assert(dow.agg(sum("event_cnt")).collect()(0).getLong(0) == total)
    assert(hod.agg(sum("event_cnt")).collect()(0).getLong(0) == total)
  }

  test("ingest idempotence: replaying the same batch changes nothing") {
    val root = java.nio.file.Files.createTempDirectory("graft_idem").toString
    val store = new graft.streaming.EventStore(root)
    val batch = graft.streaming.EventGenerator.batch(spark, 100)
    graft.streaming.StreamIngest.applyBatch(batch, store)
    val facts1 = rows(store.facts(spark).orderBy("event_id"))
    val summary1 = rows(store.table(spark, "summary_user").orderBy("user_id"))
    graft.streaming.StreamIngest.applyBatch(batch, store) // replay
    assert(rows(store.facts(spark).orderBy("event_id")) == facts1)
    assert(rows(store.table(spark, "summary_user").orderBy("user_id")) == summary1)
  }
}
