package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stage lifecycle: memoize per session, release EVERYTHING on drop —
  * checkpoint blocks and built directories both. Repeated build/drop
  * cycles must not grow driver state, executor blocks, or /tmp. */
class StagesSpec extends SparkSpec {
  import spark.implicits._

  test("frame memoizes, survives clearCache, and drop releases its blocks") {
    var builds = 0
    def stage() = Stages.frame(spark, "stages_spec_frame") { caches =>
      builds += 1
      val base = (1 to 100).toDF("x").persist()
      caches += base
      base.groupBy((col("x") % 10).as("g")).agg(sum(col("x")).as("s"))
    }
    val before = spark.sparkContext.getPersistentRDDs.size
    val a = stage()
    assert(builds == 1)
    // Intermediate caches are unpersisted once the stage materializes;
    // only the checkpointed stage RDD remains.
    assert(spark.sparkContext.getPersistentRDDs.size == before + 1)
    // Memoized: the second call returns the same frame, no rebuild —
    // and catalog.clearCache (the harness's between-queries sweep) must
    // not evict the stage.
    spark.catalog.clearCache()
    val b = stage()
    assert(builds == 1 && (a eq b))
    assert(b.count() == 10)
    Stages.drop(spark)
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "drop must release the checkpoint blocks")
    // After drop a new build starts clean.
    val c = stage()
    assert(builds == 2 && !(a eq c) && c.count() == 10)
    Stages.drop(spark)
  }

  test("tempDir memoizes; freshDir never does; drop deletes both") {
    var builds = 0
    def dir() = Stages.tempDir(spark, "stages_spec_dir") { d =>
      builds += 1
      Files.writeString(Paths.get(d, "marker"), "x")
    }
    val d1 = dir()
    val d2 = dir()
    assert(builds == 1 && d1 == d2 && Files.exists(Paths.get(d1, "marker")))
    val f1 = Stages.freshDir(spark, "stages_spec_fresh")
    val f2 = Stages.freshDir(spark, "stages_spec_fresh")
    assert(f1 != f2 && Files.isDirectory(Paths.get(f1)))
    val (frames, dirs) = Stages.liveCounts(spark)
    assert(frames == 0 && dirs == 3)
    Stages.drop(spark)
    assert(!Files.exists(Paths.get(d1)) && !Files.exists(Paths.get(f1)) &&
      !Files.exists(Paths.get(f2)), "drop must delete stage directories")
    assert(Stages.liveCounts(spark) == ((0, 0)))
    // No growth across repeated cycles: rebuild and drop again.
    assert(dir() != d1 && builds == 2)
    Stages.drop(spark)
    assert(Stages.liveCounts(spark) == ((0, 0)))
  }
}
