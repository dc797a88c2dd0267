package graft.sources

/** Child-process writer for the CROSS-PROCESS contention spec: issues
  * `count` metadata-only tombstone commits (distinct keys under its
  * `writerId` prefix) against an existing TxTable, through the default
  * [[TxTable.LocalFsCommitOwner]] — so the mutual-exclusion claim is
  * exercised at the OS level (link(2) between two JVMs), not just
  * between threads sharing one JVM's memory model. Tombstone commits
  * need no SparkSession, which keeps the child a sub-second fork.
  *
  * args: <tableDir> <writerId> <count> */
object CommitRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(dir, writerId, countStr) = args
    val count = countStr.toInt
    val base = writerId.toLong * 1000000L
    (1 to count).foreach { i =>
      TxTable.deleteKeysDeferred(dir, "k", Seq(base + i))
    }
    println(s"child-done ${TxTable.snapshot(dir).version}")
  }
}
