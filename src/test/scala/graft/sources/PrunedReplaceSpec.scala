package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The generalized stats-pruned keyed replace: result semantics
  * (remove ∪ upsert), file-level pruning from manifest stats, and
  * byte-identical carry of untouched files.
  */
class PrunedReplaceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_prep").toString

  /** A table of k → v, range-clustered into `files` files. */
  private def seed(dir: String, n: Int, files: Int): Unit = {
    val df = (1 to n).map(i => (i.toLong, i.toLong * 10)).toDF("k", "v")
      .repartitionByRange(files, col("k")).sortWithinPartitions(col("k"))
    TxTable.init(spark, dir, df.schema)
    TxTable.overwrite(spark, dir, df)
    ()
  }

  private def rows(dir: String): Seq[(Long, Long)] =
    TxTable.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("replaceKeys = (table minus keys) union upserts, pruned to hit files") {
    val dir = tmp()
    seed(dir, 400, 8) // 8 files of 50 contiguous keys each
    // Replace keys 3 and 7 (both in file 1) with new values, insert 901.
    val up = Seq((3L, 333L), (901L, 901L)).toDF("k", "v")
    val (rewritten, total) = PrunedReplace.replaceKeys(
      spark, dir, "k", Array(3L, 7L), up)
    assert(total == 8L, s"expected 8 files, saw $total")
    assert(rewritten == 1L, s"keys 3,7 live in ONE range file, rewrote $rewritten")
    val got = rows(dir)
    val expect = ((1 to 400).filterNot(i => i == 3 || i == 7)
      .map(i => (i.toLong, i.toLong * 10)) ++ Seq((3L, 333L), (901L, 901L)))
      .sorted
    assert(got == expect)
  }

  test("untouched files carry byte-identical; empty keys touch nothing") {
    val dir = tmp()
    seed(dir, 400, 8)
    def fileHashes() = TxTable.snapshot(dir).dirs.flatMap { d =>
      val p = java.nio.file.Paths.get(TxTable.stagedPath(dir, d))
      val s = Files.walk(p)
      try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.toString.endsWith(".parquet"))
        .map(f => java.util.Arrays.hashCode(Files.readAllBytes(f)))
      finally s.close()
    }.sorted
    val before = fileHashes()
    PrunedReplace.replaceKeys(spark, dir, "k", Array(1L), Seq((1L, -1L)).toDF("k", "v"))
    val after = fileHashes()
    // 7 of 8 old files must survive byte-identical (as carries).
    assert(before.intersect(after).size >= 7,
      s"carried files not byte-identical: ${before.size} -> ${after.size}")
    // Pure insert (no keys): zero rewrites, one appended... via upserts
    // landing in the staged dir; all 8 current files carry.
    val (rw, _) = PrunedReplace.replaceKeys(
      spark, dir, "k", Array.empty, Seq((902L, 2L)).toDF("k", "v"))
    assert(rw == 0L, s"pure insert rewrote $rw files")
    assert(rows(dir).contains((902L, 2L)))
  }
}
