package graft

import org.apache.spark.sql.SparkSession
import graft.cep.spark.{BatchEvaluator, Rip}
import graft.io.Transcripts

/**
 * Benchmark main. Two parts:
 *  1. the driver-contract query set on SPARK_GRAFT_SF_DIR (timed via count());
 *  2. the CEP transcript workload (flagship + negation + Kleene patterns over the seeded
 *     generator with a 30%-hot conversation) at TWO parallelism levels — local[8] vs
 *     local[32] — as the sandbox stand-in for the north rule's N vs 4N executor scaling,
 *     reporting throughput at both plus scaling efficiency (T32/T8)/4, for plain groupByKey
 *     and for the RIP-salted skew path.
 * Prints ONE JSON line.
 */
object Bench {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "30000").toInt

    // --- part 1: driver queries ---------------------------------------------------------
    val spark = session(cpus)
    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, dt) = time {
        try fn(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); -1L }
      }
      name -> dt
    }
    spark.stop()

    // --- part 2: CEP scaling ------------------------------------------------------------
    // Each measurement runs in a FRESH forked JVM (same-JVM session sequences distort
    // local[n] timings by up to 20x via accumulated heap/GC state), repetitions of the two
    // levels are INTERLEAVED in time, and the min per level is kept — this VM suffers
    // bursty host CPU-steal, so co-scheduling the levels keeps the comparison fair.
    final case class LevelResult(n: Long, matches: Long, plain: Double, salted: Double)
    val resultRe = """RESULT cores=(\d+) n=(\d+) matches=(\d+) plain=([0-9.]+) salted=([0-9.]+)""".r

    def stealJiffies(): (Long, Long) = {
      val f = scala.io.Source.fromFile("/proc/stat")
      try {
        val cols = f.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        (cols(7), cols.sum) // (steal, total)
      } finally f.close()
    }

    def forkLevel(cores: Int): LevelResult = {
      val java = s"${System.getProperty("java.home")}/bin/java"
      val opens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
        "java.base/java.io", "java.base/java.net", "java.base/java.nio", "java.base/java.util",
        "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs", "java.base/sun.security.action",
        "java.base/sun.util.calendar").flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cmd = Seq(java) ++ opens ++ Seq(
        "-Xmx24g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", System.getProperty("java.class.path"),
        "graft.BenchLevel", cores.toString, benchConvs.toString)
      val out = new StringBuilder
      val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val src = scala.io.Source.fromInputStream(proc.getInputStream)
      src.getLines().foreach(l => if (l.startsWith("RESULT")) out.append(l))
      proc.waitFor()
      out.toString match {
        case resultRe(_, n, m, p, sl) => LevelResult(n.toLong, m.toLong, p.toDouble, sl.toDouble)
        case other => throw new IllegalStateException(s"bench child failed: $other")
      }
    }

    val (steal0, total0) = stealJiffies()
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val runs8 = scala.collection.mutable.ArrayBuffer.empty[LevelResult]
    val runs32 = scala.collection.mutable.ArrayBuffer.empty[LevelResult]
    (1 to reps).foreach { _ => runs8 += forkLevel(8); runs32 += forkLevel(32) }
    val (steal1, total1) = stealJiffies()
    val stealPct = 100.0 * (steal1 - steal0) / math.max(1, total1 - total0)

    val n8 = runs8.head.n; val n32 = runs32.head.n
    val t8 = runs8.map(_.plain).min; val t8s = runs8.map(_.salted).min
    val t32 = runs32.map(_.plain).min; val t32s = runs32.map(_.salted).min
    val m32 = runs32.head.matches; val m32s = m32 // child asserts equal counts per mode

    val thr8 = n8 / t8; val thr32 = n32 / t32
    val thr8s = n8 / t8s; val thr32s = n32 / t32s
    val eff = (thr32 / thr8) / 4.0
    val effSalted = (thr32s / thr8s) / 4.0

    val total = queryTimes.map(_._2).sum + t32 + t32s
    val qs = (queryTimes ++ Seq(
      "cep_transcripts_plain_32" -> t32, "cep_transcripts_salted_32" -> t32s,
      "cep_transcripts_plain_8" -> t8, "cep_transcripts_salted_8" -> t8s))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")

    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
        s""""cep_turns":$n32,"cep_matches_plain":$m32,"cep_matches_salted":$m32s,""" +
        s""""cep_throughput_8":${thr8.toLong},"cep_throughput_32":${thr32.toLong},""" +
        s""""cep_salted_throughput_8":${thr8s.toLong},"cep_salted_throughput_32":${thr32s.toLong},""" +
        f""""scaling_efficiency":$eff%.3f,"scaling_efficiency_salted":$effSalted%.3f,""" +
        f""""host_cpu_steal_pct":$stealPct%.1f}""")
  }
}
