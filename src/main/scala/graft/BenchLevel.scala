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
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-level-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val patterns = Seq(
      SparkPatterns.flagship.copy(id = 0),
      SparkPatterns.negation.copy(id = 1),
      SparkPatterns.kleene.copy(id = 2))
    val turns = Transcripts.generateDs(spark, convs).cache()
    val n = turns.count()
    val evs = Transcripts.toEv(turns)
    def run(salted: Boolean): (Long, Double) = {
      val t0 = System.nanoTime()
      val m =
        if (salted) Rip.evaluateSalted(evs, patterns, paneMicros = 20L * 60 * 1000000).count()
        else BatchEvaluator.evaluate(evs, patterns).count()
      (m, (System.nanoTime() - t0) / 1e9)
    }
    run(salted = false) // JIT warmup
    val (m, tPlain) = Seq(run(false), run(false)).minBy(_._2)
    val (_, tSalted) = Seq(run(true), run(true)).minBy(_._2)
    println(f"RESULT cores=$cores n=$n matches=$m plain=$tPlain%.3f salted=$tSalted%.3f")
    spark.stop()
  }
}
