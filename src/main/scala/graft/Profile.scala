package graft

/** Ad-hoc timing harness: `runMain graft.Profile <sfDir> <reps> [query...]`
  * times each query `reps` times with a noop-format write (a real action
  * that materializes every row — `count()` lets Catalyst drop sorts and
  * projections) and prints per-rep seconds + the median.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.get()
    val useCount = sys.env.get("GRAFT_PROFILE_ACTION").contains("count")
    def act(df: org.apache.spark.sql.DataFrame): Unit =
      if (useCount) df.count()
      else df.write.format("noop").mode("overwrite").save()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // one untimed pass for codegen/JIT
      try act(fn(spark, sfDir))
      catch { case e: Throwable => println(s"$n warmup failed: $e") }
      spark.catalog.clearCache()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try act(fn(spark, sfDir))
        catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      val med = ts.sorted.apply(ts.size / 2)
      println(f"PROFILE $n%-40s median=$med%8.3f  reps=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
