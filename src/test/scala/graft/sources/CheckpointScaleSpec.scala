package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** MEASURE the O(live files) residuals of the checkpoint/Snapshot
  * design at the 100 TB north star's metadata scale, so the cost curve
  * is pinned by numbers instead of argued. 100 TB at the engine's
  * ~128 MB replace-clustered files is ~8×10⁵ live files; this spec
  * synthesizes a 10⁵-file state (1/8 of that — CI-sized, linear
  * extrapolation is printed) and measures the three costs that are
  * O(table) by design:
  *   1. checkpoint WRITE (every [[TxTable.CheckpointInterval]]-th
  *      commit serializes the full state),
  *   2. checkpoint PARSE (the base of every cold resolution),
  *   3. resolved-Snapshot DRIVER FOOTPRINT (per-file stats/sstats/
  *      nonulls maps held inline).
  * The asserted bounds are deliberately loose (a shared host runs
  * this); the PRINTED numbers feed the round note and the
  * "Design rules" ADR block in README.md, which records the
  * accept/split decision they justify. */
class CheckpointScaleSpec extends SparkSpec {

  private def syntheticSnapshot(dirs: Int, filesPerDir: Int): TxTable.Snapshot = {
    val schemaDdl = "k BIGINT,ts BIGINT,v BIGINT,q BIGINT,s STRING"
    val dirNames = (0 until dirs).map(d => f"d$d%08d-0000-4000-8000-000000000000")
    val fileKeys = dirNames.flatMap { d =>
      (0 until filesPerDir).map(f => s"$d/part-$f%05d.c000.snappy.parquet")
    }
    TxTable.Snapshot(
      version = 1000L,
      schemaDdl = schemaDdl,
      dirs = dirNames,
      stats = fileKeys.zipWithIndex.map { case (k, i) =>
        k -> Map("k" -> (i * 1000L, i * 1000L + 999L),
          "ts" -> (1700000000000000L + i, 1700000000000000L + i + 86400L),
          "v" -> (0L, 10000L), "q" -> (i.toLong, i + 50L))
      }.toMap,
      sstats = fileKeys.zipWithIndex.map { case (k, i) =>
        k -> Map("s" -> (f"key$i%012d", f"key${i + 999}%012d"))
      }.toMap,
      bloomCols = Seq("k"),
      blooms = dirNames.map(d => d -> Seq("k")).toMap,
      excludes = Map.empty,
      txns = (0 until 8).map(i => s"writer-$i" -> i * 1000L).toMap,
      nonulls = fileKeys.map(k => k -> Seq("k", "ts")).toMap,
      dkeys = Map("k" -> (0 until 1000).map(_.toString)))
  }

  test("10^5-file checkpoint: write, parse, and driver footprint are measured") {
    val dir = Files.createTempDirectory("graft_ckpt_scale").toString
    Files.createDirectories(java.nio.file.Paths.get(dir, "_log"))
    val files = 100 * 1000
    val snap = syntheticSnapshot(dirs = 1000, filesPerDir = files / 1000)

    val t0 = System.nanoTime()
    TxTable.writeCheckpoint(dir, snap)
    val writeSec = (System.nanoTime() - t0) / 1e9
    val bytes = Files.size(
      java.nio.file.Paths.get(dir, "_log", f"v${snap.version}%016d.checkpoint"))

    // Parse twice: first pays JIT, second is the steady-state cost a
    // long-lived driver sees on a cold resolution. Report the second.
    TxTable.tryReadCheckpoint(dir, snap.version)
    val t1 = System.nanoTime()
    val parsed = TxTable.tryReadCheckpoint(dir, snap.version)
    val parseSec = (System.nanoTime() - t1) / 1e9
    assert(parsed.exists(_.stats.size == files), "checkpoint round-trip lost state")
    assert(parsed.get == snap, "checkpoint round-trip changed state")

    // Driver footprint proxy: java serialization of the resolved
    // Snapshot (counts every string/tuple the maps retain; cheaper than
    // heap-walking and within ~2x of retained size for map-of-strings
    // shapes).
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(parsed.get); oos.close()
    val serBytes = bos.size()

    val mb = 1024.0 * 1024.0
    info(f"files=$files%,d checkpoint=${bytes / mb}%.1f MB " +
      f"write=$writeSec%.2f s parse=$parseSec%.2f s " +
      f"snapshotSer=${serBytes / mb}%.1f MB")
    info(f"extrapolated to 8x10^5 files (100 TB at 128 MB/file): " +
      f"checkpoint~${8 * bytes / mb}%.0f MB write~${8 * writeSec}%.1f s " +
      f"parse~${8 * parseSec}%.1f s snapshot~${8 * serBytes / mb}%.0f MB")
    // Loose sanity bounds — an order-of-magnitude regression (a
    // quadratic serializer, per-entry reflection) should fail here; a
    // noisy host should not.
    assert(writeSec < 30.0, f"checkpoint write took $writeSec%.1f s at 10^5 files")
    assert(parseSec < 30.0, f"checkpoint parse took $parseSec%.1f s at 10^5 files")
    assert(bytes < 200L * 1024 * 1024, s"checkpoint is $bytes bytes at 10^5 files")
  }
}
