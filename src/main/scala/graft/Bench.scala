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
    val patterns = Seq(
      graft.cep.spark.SparkPatterns.flagship.copy(id = 0),
      graft.cep.spark.SparkPatterns.negation.copy(id = 1),
      graft.cep.spark.SparkPatterns.kleene.copy(id = 2))

    /** One session per parallelism level: JIT warmup run first, then min-of-2 per mode —
      * this VM shows heavy host CPU-steal, so single measurements are unreliable. */
    def cepLevel(cores: Int): (Long, Long, Long, Double, Double) = {
      val s = session(cores)
      val turns = Transcripts.generateDs(s, benchConvs).cache()
      val nTurns = turns.count() // materialize input outside the timed section
      val evs = Transcripts.toEv(turns)
      def plain() = time(BatchEvaluator.evaluate(evs, patterns).count())
      def salted() = time(Rip.evaluateSalted(evs, patterns, paneMicros = 20L * 60 * 1000000).count())
      plain() // warmup (JIT both the relational prefix and the engine)
      val (mPlain, tPlain) = Seq(plain(), plain()).minBy(_._2)
      val (mSalted, tSalted) = Seq(salted(), salted()).minBy(_._2)
      turns.unpersist()
      s.stop()
      (nTurns, mPlain, mSalted, tPlain, tSalted)
    }

    val (n8, _, _, t8, t8s) = cepLevel(8)
    val (n32, m32, m32s, t32, t32s) = cepLevel(32)

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
        f""""scaling_efficiency":$eff%.3f,"scaling_efficiency_salted":$effSalted%.3f}""")
  }
}
