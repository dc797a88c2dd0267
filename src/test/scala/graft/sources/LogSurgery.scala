package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Test-only manifest surgery: strip the long-stats blocks from EVERY
  * log file of a table — full-form commits ("stats"), delta commits
  * ("statsAdd"/"statsRemove"), and checkpoints — reproducing the
  * on-disk shape of a log written before commit-time stats existed.
  * Returns true iff at least one file changed (setup sanity for the
  * callers: a strip that found nothing would make the fallback test
  * vacuous). */
object LogSurgery {
  def stripStats(dir: String): Boolean = {
    val log = Paths.get(dir, "_log")
    val files = {
      val st = Files.list(log)
      try st.iterator().asScala.toVector finally st.close()
    }
    // In-place manifest rewrites violate the immutability the head
    // cache bets on — drop it so the next resolution re-reads disk.
    TxTable.clearSnapshotCache()
    var changed = false
    files.filter { p =>
      val n = p.getFileName.toString
      n.endsWith(".commit") || n.endsWith(".checkpoint")
    }.foreach { p =>
      val json = Files.readString(p)
      if (json.nonEmpty) {
        val stripped = org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.parse(json).removeField(f =>
            f._1 == "stats" || f._1 == "statsAdd" || f._1 == "statsRemove"))
        if (stripped != json) {
          changed = true
          Files.delete(p)
          Files.writeString(p, stripped)
        }
      }
    }
    changed
  }
}
