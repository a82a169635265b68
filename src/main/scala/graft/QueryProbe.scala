package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual catalog queries in a fresh JVM.
  * args: sfDir reps query [query...]. Each query gets one warmup run at sf0.001 (plan +
  * codegen warm) then `reps` timed runs at sfDir; prints min/median per query. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // tmpfs shuffle, matching Bench: probes should measure the same I/O path
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-shuffle"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val warmDir = {
      val small = sfDir.replaceAll("sf[0-9.]+$", "sf0.001")
      if (new java.io.File(small).isDirectory) small else sfDir
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, warmDir).count()
      spark.catalog.clearCache() // match Bench: no leaked per-query caches across probes
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name rep: $dt%.3f s ($n rows)")
        dt
      }.sorted
      println(f"PROBE $name min=${ts.head}%.3f median=${ts(ts.length / 2)}%.3f")
    }
    spark.stop()
  }
}
