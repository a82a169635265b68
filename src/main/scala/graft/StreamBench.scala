package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.cep.Ev
import graft.cep.spark.{CepQueryListener, SparkPatterns, StreamEvaluator}
import graft.io.Transcripts

/**
 * Streaming benchmark: replay the generated transcript corpus through the Structured
 * Streaming evaluator (file source, maxFilesPerTrigger-paced micro-batches) and report
 * matches/sec plus micro-batch processing-latency percentiles — the detect-latency proxy
 * for a replayed historical stream (arrival time == processing time here, so event-time
 * "freshness" is not measurable; batch duration is the engine-side component of it).
 * Prints ONE JSON line.
 */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val convs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "20000").toInt
    val nBatches = 16
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-shuffle"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graftstream")
    val srcDir = s"$dir/src"; val ckpt = s"$dir/ckpt"
    val evs = Transcripts.toEv(Transcripts.generateDs(spark, convs)).cache()
    val n = evs.count()
    // slice by time into nBatches files so watermarks advance monotonically batch to batch
    // one file per slice, zero-padded names: the file source reads paths in lexicographic
    // order, so unpadded/multi-file slices arrive out of event-time order and the watermark
    // drops the stragglers as late
    val bounds = evs.stat.approxQuantile("ts", (1 to nBatches).map(_.toDouble / nBatches).toArray, 0.001)
    val maxTs = evs.agg(org.apache.spark.sql.functions.max("ts")).head().getLong(0)
    var lo = Long.MinValue
    bounds.zipWithIndex.foreach { case (hi, i) =>
      val upper = if (i == bounds.length - 1) Long.MaxValue else hi.toLong
      evs.filter(e => e.ts > lo && e.ts <= upper).coalesce(1)
        .write.parquet(f"$srcDir/b$i%03d")
      lo = upper
    }
    // far-future sentinel on an isolated key pushes the final watermark past every real
    // event so held events and parked negation matches flush (a live stream never "ends")
    spark.createDataset(Seq(
      Ev("zz-sentinel", 0, "USER", maxTs + 7200L * 1000000L, 0, "", null))).coalesce(1)
      .write.parquet(f"$srcDir/b$nBatches%03d")
    spark.createDataset(Seq(
      Ev("zz-sentinel", 1, "USER", maxTs + 7300L * 1000000L, 0, "", null))).coalesce(1)
      .write.parquet(f"$srcDir/b${nBatches + 1}%03d")
    val patterns = Seq(SparkPatterns.flagship.copy(id = 0),
      SparkPatterns.negation.copy(id = 1), SparkPatterns.kleene.copy(id = 2))
    val listener = new CepQueryListener
    spark.streams.addListener(listener)
    val src = spark.readStream.schema(evs.schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$srcDir/b*").as[Ev]
    import org.apache.spark.sql.functions.{count, lit, col}
    val t0 = System.nanoTime()
    val q = StreamEvaluator.evaluate(src, patterns, delay = "1 minute")
      .filter(col("key") =!= "zz-sentinel")
      .observe("cep", count(lit(1)).as("n_matches")) // count via metrics, not a driver sink
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt).trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    q.stop()
    val matches = listener.batches.flatMap(_.observed.get("cep.n_matches")).sum
    // sanity: the streaming result must equal the batch result on the same input
    val batchMatches = graft.cep.spark.BatchEvaluator.evaluate(evs, patterns).count()

    val durs = listener.batches.filter(_.inputRows > 0).map(b => b.inputRows / math.max(1e-9, b.processedRowsPerSec))
    val sorted = durs.sorted
    def pct(p: Double): Double = if (sorted.isEmpty) 0 else sorted(math.min(sorted.size - 1, (p * sorted.size).toInt))
    val stateRows = listener.batches.lastOption.map(_.stateRows).getOrElse(0L)
    println(
      f"""{"metric":"stream_throughput","value":${(n / wall).toLong},"unit":"turns/sec","turns":$n,"matches":$matches,""" +
        f""""batch_matches":$batchMatches,"wall_sec":$wall%.2f,"batches":${sorted.size},""" +
        f""""batch_p50_sec":${pct(0.5)}%.3f,"batch_p95_sec":${pct(0.95)}%.3f,""" +
        f""""state_rows":$stateRows,"cores":$cores}""")
    spark.stop()
  }
}
