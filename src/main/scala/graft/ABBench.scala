package graft

import java.net.{URL, URLClassLoader}

import scala.collection.mutable

/** INTERLEAVED A/B benchmark — the only statistic this host's 79–129 s
  * same-code suite swing cannot fake. Round 13's driver artifact showed
  * nine phantom 2–3.4× "regressions" on untouched queries purely from
  * the host window; sequential cross-round totals are therefore
  * meaningless here (BENCH history + SKILL.md both say so). This main
  * loads TWO builds of the engine into ONE JVM (child-first
  * classloaders over two `sbt package` jars, sharing the parent's
  * Spark/Scala), and alternates every timed rep A,B,A,B per query —
  * so whatever the host is doing during a query's window, it does to
  * BOTH builds, and the per-pair ratio isolates the code delta.
  *
  *   java -cp "<spark-jars-glob>:<runner-classes>" graft.ABBench A.jar B.jar [reps]
  *
  * Emits one JSON line (and AB_BENCH.json): per query the paired
  * ratios' median, both medians, and the raw pairs; suite-level the
  * total ratio and the queries whose ratio clears a noise band.
  *
  * Scope caveat (documented, inherent to one-session A/B): the shared
  * SparkSession is built by the RUNNER's build — session-registered
  * SQL extensions come from it; each side's query/operator/table code
  * comes from its own jar (child-first). Queries present in only one
  * build are reported as such and skipped. A query whose plan NODES
  * are session-extension classes (the native as-of join: the strategy
  * registered at session build pattern-matches the runner loader's
  * AsOfJoinPlan, never a child loader's) fails on BOTH sides — that is
  * an A/B-scope exclusion, not a regression, so it is reported under
  * `skipped_extension_scope` and does not fail the run — but ONLY for
  * the [[ExtensionScope]] allowlist: any other both-side failure is a
  * common-cause break and exits 1 with the exception recorded. A query
  * that fails on exactly ONE side is a real break and still exits 1.
  */
object ABBench {

  /** The known A/B-scope exclusions: queries whose plan nodes are
    * session-extension classes (the extension is registered by the
    * RUNNER's session build, so it pattern-matches the runner loader's
    * plan class — never a child jar's) and therefore fail on BOTH
    * sides by construction. Only these may be silently skipped. */
  private val ExtensionScope = Set("q_events_asof_native")

  /** Movers (paired ratio outside [1/band, band]) present ON THE SAME
    * SIDE in two independent A/B runs: a single run's mover is
    * one-window noise by protocol (documented since r14's
    * q_sample_customers), but one that REPRODUCES in a second
    * independent interleaved run is a real code delta — the
    * regression side must FAIL the run, not pass as a warning
    * (r15 verdict queue #2). Pure so the spec can pin it. */
  private[graft] def reproducedMovers(prev: Map[String, Double],
                                      cur: Map[String, Double],
                                      band: Double): Map[String, (Double, Double)] =
    cur.flatMap { case (q, r) =>
      prev.get(q).collect {
        case p if p > band && r > band => q -> (p, r)         // reproduced regression
        case p if p < 1 / band && r < 1 / band => q -> (p, r) // reproduced improvement
      }
    }

  /** Child-first loader: classes found in the jar shadow the runner's
    * app classpath (both graft.* and the org.apache.spark.sql bridge
    * classes shipped in the jar); everything else — Spark, Scala,
    * JDK — resolves from the shared parent, so DataFrames and
    * functions cross the boundary as ordinary shared types. */
  private final class ChildFirst(jar: URL, parent: ClassLoader)
      extends URLClassLoader(Array(jar), parent) {
    override def loadClass(name: String, resolve: Boolean): Class[_] =
      getClassLoadingLock(name).synchronized {
        val loaded = findLoadedClass(name)
        val c =
          if (loaded != null) loaded
          else try findClass(name)
          catch { case _: ClassNotFoundException => super.loadClass(name, false) }
        if (resolve) resolveClass(c)
        c
      }
  }

  private def queriesOf(loader: ClassLoader)
      : Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = {
    val module = loader.loadClass("graft.SparkEntry$")
    val instance = module.getField("MODULE$").get(null)
    module.getMethod("queries").invoke(instance)
      .asInstanceOf[Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame]]
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ABBench <jarA> <jarB> [reps]")
    val (jarA, jarB) = (args(0), args(1))
    // Default 5: at 3 a single scheduler hiccup owns the median pair
    // (the r14/r15 round protocol kept under-running the ≥5 the round
    // queue asked for — make the default carry it).
    val reps = if (args.length > 2) args(2).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)

    // CONTENT identity of the two builds, for the reproduction gate:
    // the round protocol rebuilds the B jar in place at a fixed path,
    // so "same jar path" does not mean "same code" — a prior artifact
    // from different bytes at the same paths must not arbitrate
    // reproduction. Checksums decide; paths are display metadata.
    def jarSum(p: String): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(p))
      try {
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
      } finally in.close()
      md.digest().map("%02x".format(_)).mkString
    }
    val (sumA, sumB) = (jarSum(jarA), jarSum(jarB))

    val parent = getClass.getClassLoader
    val ldA = new ChildFirst(new java.io.File(jarA).toURI.toURL, parent)
    val ldB = new ChildFirst(new java.io.File(jarB).toURI.toURL, parent)
    val qA = queriesOf(ldA)
    val qB = queriesOf(ldB)
    val names0 = qA.keys.toSeq.filter(qB.contains).sorted
    val names = only.map(sel => names0.filter(sel)).getOrElse(names0)
    val onlyIn = (qA.keySet diff qB.keySet, qB.keySet diff qA.keySet)

    val spark = GraftSession.builder(master = s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def act(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def runE(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Either[Throwable, Double] =
      try {
        val t0 = System.nanoTime()
        act(fn(spark, sfDir))
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        Right(s)
      } catch { case scala.util.control.NonFatal(e) =>
        spark.catalog.clearCache(); Left(e)
      }
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] =
      runE(fn).toOption

    val errors = mutable.LinkedHashMap.empty[String, String]
    val skipped = mutable.ArrayBuffer.empty[String]
    val out = mutable.LinkedHashMap.empty[String, (Double, Double, Double, Seq[(Double, Double)])]
    names.foreach { name =>
      val (fa, fb) = (qA(name), qB(name))
      // One untimed warmup per SIDE (codegen + page cache), then the
      // interleaved pairs. A side that fails is recorded and skipped —
      // a dead query must not read as an infinite speedup. Both sides
      // failing the warmup is extension scope ONLY for the known
      // allowlist (session-extension plan classes — see scaladoc); any
      // OTHER both-side failure is a common-cause break (bad SF dir,
      // OOM, a shared-setup bug present in both jars) and must fail
      // the run, not pass silently as scope.
      val (wa, wb) = (runE(fa), runE(fb))
      if (wa.isLeft && wb.isLeft) {
        if (ExtensionScope(name)) skipped += name
        else {
          val e = wb.swap.getOrElse(wa.swap.toOption.get)
          errors(name) = "both sides failed warmup: " +
            s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("").take(300)}"
        }
      }
      else {
        val pairs = (1 to reps).flatMap { _ =>
          for (a <- run(fa); b <- run(fb)) yield (a, b)
        }
        if (pairs.size < reps) errors(name) = s"only ${pairs.size}/$reps pairs completed"
        if (pairs.nonEmpty) {
        def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
        out(name) = (med(pairs.map(_._1)), med(pairs.map(_._2)),
          med(pairs.map(p => p._2 / p._1)), pairs)
        }
      }
    }
    graft.operators.Stages.drop(spark)
    graft.sources.TxTable.flushCheckpoints() // drain queued checkpoints
    spark.stop()

    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val totalA = out.values.map(_._1).sum
    val totalB = out.values.map(_._2).sum
    val qjson = out.map { case (n, (a, b, r, pairs)) =>
      s""""${esc(n)}":{"a":$a,"b":$b,"paired_ratio":${math.round(r * 1000) / 1000.0},""" +
        s""""pairs":${pairs.map(p => s"[${p._1},${p._2}]").mkString("[", ",", "]")}}"""
    }.mkString("{", ",", "}")
    // Movers: paired ratio outside [1/band, band] — the only per-query
    // claims the host swing cannot explain away.
    val band = 1.3
    val curMovers: Map[String, Double] = out.collect {
      case (n, (_, _, r, _)) if r > band || r < 1.0 / band => n -> r
    }.toMap
    // Reproduction gate: read the PRIOR artifact before overwriting it.
    // Only a prior run of the SAME comparison counts — decided by jar
    // CONTENT checksums (a_jarsum/b_jarsum), since the protocol
    // rebuilds jars in place at fixed paths; a pre-checksum legacy
    // artifact falls back to path equality. A prior artifact that
    // EXISTS but cannot be parsed silently disabling the gate would
    // turn the fail-on-reproduced-regression guarantee off with no
    // signal — warn on stderr instead.
    val prevMovers: Map[String, Double] = {
      val f = java.nio.file.Paths.get("AB_BENCH.json")
      if (!java.nio.file.Files.exists(f)) Map.empty
      else try {
        val txt = new String(java.nio.file.Files.readAllBytes(f))
        val m = org.json4s.jackson.JsonMethods.parse(txt)
        val samePair = ((m \ "a_jarsum", m \ "b_jarsum") match {
          case (org.json4s.JString(a), org.json4s.JString(b)) => Some((a, b))
          case _ => None
        }) match {
          case Some((a, b)) => a == sumA && b == sumB
          case None => (m \ "a_jar", m \ "b_jar") match { // legacy artifact
            case (org.json4s.JString(a), org.json4s.JString(b)) =>
              a == jarA && b == jarB
            case _ => false
          }
        }
        if (!samePair) Map.empty
        else (m \ "movers_beyond_1.3x") match {
          case org.json4s.JObject(fields) => fields.collect {
            case (k, org.json4s.JDouble(v)) => k -> v
            case (k, org.json4s.JInt(v)) => k -> v.toDouble
          }.toMap
          case _ => Map.empty
        }
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println("ab-bench: AB_BENCH.json exists but could not " +
          s"be read (${e.getClass.getSimpleName}: " +
          s"${Option(e.getMessage).getOrElse("").take(120)}) — the " +
          "reproduction gate is DISABLED for this run")
        Map.empty
      }
    }
    val reproduced = reproducedMovers(prevMovers, curMovers, band)
    val movers = curMovers.map { case (n, r) =>
      s""""${esc(n)}":${math.round(r * 1000) / 1000.0}"""
    }.mkString("{", ",", "}")
    val reproducedJson = reproduced.map { case (n, (p, r)) =>
      s""""${esc(n)}":[${math.round(p * 1000) / 1000.0},${math.round(r * 1000) / 1000.0}]"""
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    val skipJson = skipped.map(s => s""""${esc(s)}"""").mkString("[", ",", "]")
    val json =
      s"""{"metric":"ab_paired","a_jar":"${esc(jarA)}","b_jar":"${esc(jarB)}",""" +
        s""""a_jarsum":"$sumA","b_jarsum":"$sumB",""" +
        s""""sf":"${esc(sfDir)}","reps":$reps,"queries_compared":${out.size},""" +
        s""""skipped_extension_scope":$skipJson,""" +
        s""""only_in_a":${onlyIn._1.size},"only_in_b":${onlyIn._2.size},""" +
        s""""total_a":$totalA,"total_b":$totalB,""" +
        s""""total_ratio":${math.round(totalB / totalA * 1000) / 1000.0},""" +
        s""""movers_beyond_1.3x":$movers,"reproduced_movers":$reproducedJson,""" +
        s""""errors":$errJson,"queries":$qjson}"""
    try {
      val w = new java.io.PrintWriter(new java.io.File("AB_BENCH.json"))
      try w.println(json) finally w.close()
    } catch { case scala.util.control.NonFatal(_) => () }
    println(json.take(2000)) // compact head; the full artifact is on disk
    if (errors.nonEmpty) {
      System.err.println(s"ab-bench: ${errors.size} queries incomplete: ${errors.keys.mkString(", ")}")
      sys.exit(1)
    }
    // A REGRESSION that reproduces across two independent interleaved
    // runs is a real code delta, not the host window — fail, don't
    // warn (r15 queue #2). Reproduced IMPROVEMENTS are recorded in the
    // artifact but don't gate.
    val reproducedRegressions = reproduced.filter(_._2._2 > 1.0)
    if (reproducedRegressions.nonEmpty) {
      System.err.println("ab-bench: REPRODUCED regressions beyond the " +
        s"band across independent runs: " +
        reproducedRegressions.map { case (n, (p, r)) => s"$n ($p then $r)" }
          .mkString(", "))
      sys.exit(1)
    }
  }
}
