package graft

import org.apache.spark.sql.SparkSession

/** Catalog-only bench (guide §1): the same session shape + warmup + timed methodology as
  * Bench part 1, without the fork blocks — the fast before/after instrument for query
  * optimization work. args: [sfDir [passes]]. Runs a full warmup pass at sf0.001, then
  * `passes` timed passes at sfDir keeping the per-query MIN (min-over-windows: host
  * bursts only ever inflate wall time). Prints one JSON line with per-query mins and the
  * catalog total. Optionally SPARK_GRAFT_NOOP=1 times a noop-sink write (guide §1.4)
  * instead of count() — isolates computation from the count-specific plan pruning. */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val noop = sys.env.get("SPARK_GRAFT_NOOP").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-shuffle"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val warmDir = {
      val small = sfDir.replaceAll("sf[0-9.]+$", "sf0.001")
      if (new java.io.File(small).isDirectory) small else sfDir
    }
    def action(df: org.apache.spark.sql.DataFrame): Unit =
      if (noop) df.write.format("noop").mode("overwrite").save() else { df.count(); () }
    def runAll(dir: String): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        spark.sparkContext.setJobDescription(s"bench-extra: $name")
        val t0 = System.nanoTime()
        try action(fn(spark, dir))
        catch { case e: Throwable => System.err.println(s"[bench-extra] $name failed: $e") }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        name -> dt
      }
    runAll(warmDir) // warmup pass: JVM/codegen/scan setup, same as Bench
    System.err.println("[bench-extra] warmup done")
    val mins = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    (1 to passes).foreach { p =>
      runAll(sfDir).foreach { case (n, t) =>
        mins(n) = math.min(mins.getOrElse(n, Double.MaxValue), t)
      }
      System.err.println(f"[bench-extra] pass $p done, running total ${mins.values.sum}%.2f s")
    }
    val total = mins.values.sum
    val qs = mins.toSeq.sortBy(-_._2)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    println(f"""{"metric":"catalog","value":$total%.2f,"unit":"sec","queries":$qs,"sf":"$sfDir","passes":$passes,"noop":$noop}""")
    spark.stop()
  }
}
