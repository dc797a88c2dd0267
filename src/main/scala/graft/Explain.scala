package graft

/** Plan inspection harness: `runMain graft.Explain [sfDir] [query...]`
  * prints the formatted physical plan per query — the loop used to audit
  * pushdown/pruning/broadcast choices (see README "plan audit").
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.get()
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
