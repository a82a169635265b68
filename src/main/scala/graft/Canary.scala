package graft

import org.apache.spark.sql.SparkSession

/** Weather canary: times a tiny fixed Spark job 3x. Clean host: well under 1 s per rep
  * after the first; the sick phase of this sandbox (kernel anon-memory stalls) turns the
  * same job into ~10 s. Used to gate measurement windows during optimization. */
object Canary {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      spark.range(0, 2000000, 1, 32).selectExpr("sum(id * 3 + 1)").collect()
      println(f"[canary] rep $i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
