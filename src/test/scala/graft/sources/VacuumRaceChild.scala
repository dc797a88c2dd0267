package graft.sources

/** Child-process WRITER+READER for the cross-process maintenance race
  * spec: its own SparkSession (local[2]) appends one keyed row per
  * iteration, tombstones every 5th key, and re-reads the table after
  * every commit asserting its own history — while the PARENT process
  * trims the log, vacuums, and compacts concurrently. Exercises, at
  * the OS level, the paths an in-JVM race cannot: the vanished-manifest
  * retry in `snapshot`/`resolveAt` (a trimLog in another process
  * retires tail manifests mid-replay), `versions`' list-then-stat
  * tolerance, and readers planning against dirs another process's
  * vacuum is reclaiming.
  *
  * args: <tableDir> <count> */
object VacuumRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(dir, countStr) = args
    val n = countStr.toInt
    val spark = graft.GraftSession.builder(master = "local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      (1 to n).foreach { i =>
        TxTable.append(spark, dir, Seq((i.toLong, i.toLong)).toDF("k", "v"))
        if (i % 5 == 0) { TxTable.deleteKeysDeferred(dir, "k", Seq(i.toLong)); () }
        // Read-after-write through whatever retention state the parent
        // left: every key this child ever appended (minus its own
        // tombstones) must be present exactly once — no loss, no
        // resurrection, no resolution error.
        val ks = TxTable.read(spark, dir).select("k").collect()
          .map(_.getLong(0)).toSeq
        val want = (1 to i).map(_.toLong).filterNot(_ % 5 == 0)
        require(ks.sorted == want.sorted,
          s"iteration $i read ${ks.size} keys; " +
            s"missing=${want.diff(ks).take(5)} extra=${ks.diff(want).take(5)}")
      }
      println(s"child-done ${TxTable.snapshot(dir).version}")
    } finally spark.stop()
  }
}
