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
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_SLICES", "16").toInt
    val filesPerTrigger = sys.env.getOrElse("SPARK_GRAFT_STREAM_FPT", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      // state partitions: the stateful op pays a per-partition-per-batch commit cost
      // (~150-200 ms in the HDFS-backed store even on tmpfs) that dwarfs per-row work at
      // this batch size; 8 partitions keeps commit overhead at ~1/4 of the 32-partition
      // default while the per-key engine work still spreads over the pool
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-shuffle"))
      // RawLocalFileSystem: skip Hadoop ChecksumFileSystem's .crc bookkeeping for the
      // tmpfs checkpoint (a real deployment checkpoints to HDFS/object storage whose
      // client handles integrity; double-checksumming local tmpfs only adds latency)
      // (RocksDB's checkpoint file manager casts to LocalFileSystem, so the raw-FS
      // shortcut only applies to the HDFS-backed store)
      .config("spark.hadoop.fs.file.impl",
        if (sys.env.get("SPARK_GRAFT_STREAM_STORE").contains("rocksdb"))
          "org.apache.hadoop.fs.LocalFileSystem"
        else "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.sql.streaming.stateStore.formatValidation.enabled", "false")
      // SPARK_GRAFT_STREAM_STORE=rocksdb swaps in the RocksDB provider (with changelog
      // checkpointing, so per-batch commits upload deltas instead of full snapshots) —
      // the frontier comparison row for BASELINE.md's state-store analysis
      .config("spark.sql.streaming.stateStore.providerClass",
        if (sys.env.get("SPARK_GRAFT_STREAM_STORE").contains("rocksdb"))
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        else "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // source + checkpoint on tmpfs: /tmp is ext4 on the VM's virtual disk, and the
    // checkpoint WAL + per-partition state-store deltas are fsync'd every micro-batch —
    // that disk floor dominated batch latency (the cluster analogue is an HDFS/object-store
    // checkpoint with its own async commit path, not a slow local disk)
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_STREAM_TMP", "/dev/shm")), "graftstream")
    val srcDir = s"$dir/src"; val ckpt = s"$dir/ckpt"
    // Detect-then-enrich: the stream carries only the columns the patterns read (etype,
    // ts, idx, num) — text payloads are nulled before the stateful op and re-joinable by
    // (key, idx) after detection. At 10^12-turn scale shipping full text through the
    // shuffle + state store is the dominant row cost (UnsafeRow -> object conversion of
    // the text field alone measured ~2x the whole engine feed); pruning is the streaming
    // analogue of relational column pruning, which Catalyst cannot do through a typed
    // stateful operator.
    // SPARK_GRAFT_HOT_SHARE > default 0.3 builds a cliff-style corpus (conv-00000 holds
    // that share of all turns) for the streaming skew comparison below
    val hotShare = sys.env.getOrElse("SPARK_GRAFT_HOT_SHARE", "0.3").toDouble
    val evs = Transcripts.toEv(Transcripts.generateDs(spark, convs, hotShare = hotShare))
      .map(e => e.copy(s1 = null, s2 = null)).cache()
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
    import org.apache.spark.sql.functions.{count, lit, col}
    // the time-sliced replay delivers every key's events in event-time order across
    // batches, so the bench runs the reference's arrival model (assumeOrdered) — the
    // watermark-complete reorder mode is property-tested separately in StreamSpec
    val ordered = sys.env.getOrElse("SPARK_GRAFT_STREAM_ORDERED", "true").toBoolean

    final case class RepResult(wall: Double, matches: Long, batches: Int,
                               p50: Double, p95: Double, stateRows: Long, stateRowsMax: Long)
    def runOnce(rep: Int, orderedRun: Boolean = ordered): RepResult = {
      val listener = new CepQueryListener
      spark.streams.addListener(listener)
      val ckptRep = s"$ckpt-$rep"
      val src = spark.readStream.schema(evs.schema)
        .option("maxFilesPerTrigger", filesPerTrigger.toString)
        .parquet(s"$srcDir/b*").as[Ev]
      val t0 = System.nanoTime()
      val useTws = sys.env.get("SPARK_GRAFT_STREAM_API").contains("tws")
      // SPARK_GRAFT_STREAM_MODE: plain (default) | salted (every key pane-fans-out) |
      // hotset (only conv-00000 fans out, the streaming analogue of batch auto-routing
      // with a pre-supplied hot set). Pane = 6x window, the batch bench's replication
      // sweet spot (factor 1.17).
      val mode = sys.env.getOrElse("SPARK_GRAFT_STREAM_MODE", "plain")
      val paneMicros = 6L * patterns.map(_.windowMicros).max
      val q = (mode match {
        case "salted" =>
          StreamEvaluator.evaluateSalted(src, patterns, paneMicros, delay = "1 minute",
            hotKeys = None, assumeOrdered = orderedRun)
        case "hotset" =>
          StreamEvaluator.evaluateSalted(src, patterns, paneMicros, delay = "1 minute",
            hotKeys = Some(Seq("conv-00000")), assumeOrdered = orderedRun)
        case _ if useTws =>
          StreamEvaluator.evaluateTws(src, patterns, delay = "1 minute", assumeOrdered = orderedRun)
        case _ =>
          StreamEvaluator.evaluate(src, patterns, delay = "1 minute", assumeOrdered = orderedRun)
      })
        .filter(col("key") =!= "zz-sentinel")
        .observe("cep", count(lit(1)).as("n_matches")) // count via metrics, not a driver sink
        .writeStream.format("noop")
        .option("checkpointLocation", ckptRep).trigger(Trigger.ProcessingTime(0)).start()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      q.stop()
      spark.streams.removeListener(listener)
      val phaseTotals = listener.batches.flatMap(_.durationMs.toSeq)
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      System.err.println(s"[streambench] rep=$rep wall=$wall phase totals ms: " +
        phaseTotals.toSeq.sortBy(-_._2).mkString(", "))
      System.err.println(s"[streambench] rep=$rep processKey: ${StreamEvaluator.Prof.summary}")
      if (sys.env.contains("SPARK_GRAFT_STREAM_DEBUG"))
        listener.batches.foreach(b => System.err.println(s"[streambench-debug] batch=${b.batchId} " +
          s"rows=${b.inputRows} wm=${b.watermark} dropped=${b.durationMs.getOrElse("droppedByWatermark", 0L)} " +
          s"state=${b.stateRows} matches=${b.observed.getOrElse("cep.n_matches", 0L)}"))
      StreamEvaluator.Prof.reset()
      val durs = listener.batches.filter(_.inputRows > 0)
        .map(b => b.inputRows / math.max(1e-9, b.processedRowsPerSec)).sorted
      def pct(p: Double): Double =
        if (durs.isEmpty) 0 else durs(math.min(durs.size - 1, (p * durs.size).toInt))
      RepResult(wall, listener.batches.flatMap(_.observed.get("cep.n_matches")).sum,
        durs.size, pct(0.5), pct(0.95),
        listener.batches.lastOption.map(_.stateRows).getOrElse(0L),
        // peak LIVE state — the "huge state" measure for the fmgws/tws frontier (end-of-
        // run rows only show what the watermark reaped)
        if (listener.batches.isEmpty) 0L else listener.batches.map(_.stateRows).max)
    }

    // bursty host CPU-steal inflates any single run up to severalfold; run reps and keep
    // the best (same discipline as the batch bench), reporting the steal seen
    def stealJiffies(): (Long, Long) = {
      val f = scala.io.Source.fromFile("/proc/stat")
      try { val c = f.getLines().next().trim.split("\\s+").drop(1).map(_.toLong); (c(7), c.sum) }
      finally f.close()
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_STREAM_REPS", "3").toInt
    val (st0, tt0) = stealJiffies()
    val results = (1 to reps).map(runOnce(_))
    // when the headline mode is the lighter ordered replay, also measure the DEFAULT
    // watermark-complete reorder mode so the two are never conflated (the ordered number
    // is the reference's arrival model; the watermark number is the production default)
    val wmResult = if (ordered) Some(runOnce(reps + 1, orderedRun = false)) else None
    val (st1, tt1) = stealJiffies()
    val best = results.minBy(_.wall)
    // sanity: the streaming result must equal the batch result on the same input —
    // HARD assert (a silent 13-match shortfall from epoch-0 events hitting the initial
    // watermark survived three rounds as a print-only check)
    val batchMatches = graft.cep.spark.BatchEvaluator.evaluate(evs, patterns).count()
    require(results.forall(_.matches == best.matches), s"rep match counts differ: $results")
    require(best.matches == batchMatches,
      s"stream matches ${best.matches} != batch matches $batchMatches")
    wmResult.foreach(r => require(r.matches == best.matches,
      s"watermark-mode matches ${r.matches} != ordered-mode ${best.matches}"))
    val stealPct = 100.0 * (st1 - st0) / math.max(1, tt1 - tt0)
    val wmJson = wmResult.map(r =>
      f""","wm_throughput":${(n / r.wall).toLong},"wm_wall_sec":${r.wall}%.2f""").getOrElse("")
    println(
      f"""{"metric":"stream_throughput","value":${(n / best.wall).toLong},"unit":"turns/sec","turns":$n,"matches":${best.matches},""" +
        f""""mode":"${if (ordered) "ordered" else "watermark"}","text_pruned":true,""" +
        f""""store":"${sys.env.getOrElse("SPARK_GRAFT_STREAM_STORE", "hdfs")}",""" +
        f""""api":"${sys.env.getOrElse("SPARK_GRAFT_STREAM_API", "fmgws")}",""" +
        f""""exec":"${sys.env.getOrElse("SPARK_GRAFT_STREAM_MODE", "plain")}","hot_share":$hotShare%.2f,""" +
        f""""raw_local_fs":true,"state_format_validation":false$wmJson,""" +
        f""""batch_matches":$batchMatches,"wall_sec":${best.wall}%.2f,"batches":${best.batches},""" +
        f""""batch_p50_sec":${best.p50}%.3f,"batch_p95_sec":${best.p95}%.3f,""" +
        f""""state_rows":${best.stateRows},"state_rows_max":${best.stateRowsMax},"reps":$reps,"host_cpu_steal_pct":$stealPct%.1f,"cores":$cores}""")
    spark.stop()
  }
}
