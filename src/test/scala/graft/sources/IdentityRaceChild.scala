package graft.sources

import java.nio.file.{Files, Path, Paths}

/** Child-process half of the CROSS-PROCESS identity-guard race
  * (VacuumRaceSpec's second test): while the PARENT holds lifetime A's
  * deferred periodic checkpoint in flight (gated, enqueued at version
  * `interval`), this process DELETES the table and re-creates a fresh
  * lifetime B at the same path, replaying it to the SAME version
  * number — the exact name-collision bet the in-JVM spec
  * (TxTableSpec "identity guard") stages with a latch, here across an
  * OS process boundary: the parent's queued write must verify the
  * init-stamped identity against the NEW lifetime's `_identity` file
  * and refuse to land A's state in B's log. This child suppresses its
  * OWN checkpoint cadence so any checkpoint at v`interval` afterwards
  * can only be the dead lifetime's.
  *
  * args: <tableDir> <interval> */
object IdentityRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(dir, intervalStr) = args
    val interval = intervalStr.toInt
    val spark = graft.GraftSession.builder(master = "local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      TxTable.CheckpointInterval = Int.MaxValue // B enqueues nothing
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p)) {
          val s = Files.list(p)
          try s.iterator().forEachRemaining(rm) finally s.close()
        }
        Files.deleteIfExists(p); ()
      }
      rm(Paths.get(dir))
      val schema = Seq((0L, 0L)).toDF("k", "v").schema
      TxTable.init(spark, dir, schema)
      (1 to interval).foreach(i =>
        TxTable.append(spark, dir,
          Seq((100L + i, 0L)).toDF("k", "v").coalesce(1)))
      println(s"reinit-done ${TxTable.snapshot(dir).version}")
    } finally spark.stop()
  }
}
