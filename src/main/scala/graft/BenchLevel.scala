package graft

import org.apache.spark.sql.SparkSession
import graft.cep.spark.{BatchEvaluator, Rip, SparkPatterns}
import graft.io.Transcripts

/** One CEP benchmark measurement in a FRESH JVM (forked by Bench): accumulated heap/GC
  * state from earlier SparkSessions in the same JVM distorts local[n] timings badly
  * (observed 20x). Prints one RESULT line parsed by the parent. */
object BenchLevel {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val convs = args(1).toInt
    val hotShare = if (args.length > 2) args(2).toDouble else 0.3
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-level-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // tmpfs shuffle dirs: the CEP run's only shuffle is ~1 GB at bench scale; keeping it
      // off the VM's virtual disk removes an I/O floor from the scaling measurement
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-shuffle"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val patterns = Seq(
      SparkPatterns.flagship.copy(id = 0),
      SparkPatterns.negation.copy(id = 1),
      SparkPatterns.kleene.copy(id = 2))
    val turns = Transcripts.generateDs(spark, convs, hotShare = hotShare).cache()
    val n = turns.count()
    val evs = Transcripts.toEv(turns)
    val pane = 20L * 60 * 1000000
    def run(mode: String): (Long, Double) = {
      val t0 = System.nanoTime()
      val m = mode match {
        case "salted" => Rip.evaluateSalted(evs, patterns, pane).count()
        case "auto"   => Rip.evaluateAuto(evs, patterns, pane, hotThreshold = 100000L).count()
        case _        => BatchEvaluator.evaluate(evs, patterns).count()
      }
      (m, (System.nanoTime() - t0) / 1e9)
    }
    run("plain") // JIT warmup
    val reps = sys.env.getOrElse("SPARK_GRAFT_LEVEL_REPS", "2").toInt
    // interleave modes within each rep (not mode-blocked): host-steal bursts and in-JVM
    // heap drift then hit all modes evenly instead of whichever mode runs last
    val rs = (1 to reps).map(_ => (run("plain"), run("salted"), run("auto")))
    val (m, tPlain) = rs.map(_._1).minBy(_._2)
    val (_, tSalted) = rs.map(_._2).minBy(_._2)
    val (mAuto, tAuto) = rs.map(_._3).minBy(_._2)
    require(mAuto == m, s"auto-routed match count $mAuto != plain $m")
    println(f"RESULT cores=$cores n=$n matches=$m plain=$tPlain%.3f salted=$tSalted%.3f auto=$tAuto%.3f hot=$hotShare%.2f")
    spark.stop()
  }
}
