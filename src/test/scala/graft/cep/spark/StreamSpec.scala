package graft.cep.spark

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.cep._
import graft.io.Transcripts
import java.nio.file.Files

class StreamSpec extends AnyFunSuite {
  import SparkT._

  private val patterns = Seq(flagship.copy(id = 0), negPattern.copy(id = 1), kcPattern.copy(id = 2))

  /** A far-future sentinel of a relevant type on an isolated key pushes the watermark past
    * every real event so held events and parked negation matches flush. */
  private def sentinel(maxTs: Long): Ev =
    Ev("zz-sentinel", 0, "USER", maxTs + 3600L * 1000000L, 0, "", null)

  private def dropSentinel(ms: Seq[CepMatch]): Seq[CepMatch] = ms.filterNot(_.key == "zz-sentinel")

  test("streaming evaluator equals batch evaluator under micro-batch slicing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val turns = Transcripts.generate(nConvs = 12)
    val evs = Transcripts.toEv(Transcripts.toDs(spark, turns)).collect().toSeq.sortBy(e => (e.ts, e.idx))
    val maxTs = evs.map(_.ts).max

    val input = MemoryStream[Ev]
    val out = StreamEvaluator.evaluate(input.toDS(), patterns, delay = "5 seconds")
    val query = out.writeStream
      .format("memory").queryName("cepstream").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    // slice into uneven micro-batches
    val slices = evs.grouped(37).toSeq
    slices.foreach { s => input.addData(s); query.processAllAvailable() }
    input.addData(sentinel(maxTs)); query.processAllAvailable()
    // one extra empty-ish batch so EventTimeTimeout wakeups fire after the watermark advance
    input.addData(sentinel(maxTs + 1)); query.processAllAvailable()
    val got = canon(dropSentinel(spark.table("cepstream").as[CepMatch].collect().toSeq))
    query.stop()

    val want = canon(dropSentinel(
      BatchEvaluator.evaluate(Transcripts.toEv(Transcripts.toDs(spark, turns)), patterns).collect().toSeq))
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("transformWithState evaluator (RocksDB store) equals batch under slicing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val turns = Transcripts.generate(nConvs = 12)
    val evs = Transcripts.toEv(Transcripts.toDs(spark, turns)).collect().toSeq.sortBy(e => (e.ts, e.idx))
    val maxTs = evs.map(_.ts).max
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Ev]
      val out = StreamEvaluator.evaluateTws(input.toDS(), patterns, delay = "5 seconds")
      val query = out.writeStream
        .format("memory").queryName("ceptws").outputMode("append")
        .trigger(Trigger.ProcessingTime(0))
        .start()
      evs.grouped(41).foreach { s => input.addData(s); query.processAllAvailable() }
      input.addData(sentinel(maxTs)); query.processAllAvailable()
      input.addData(sentinel(maxTs + 1)); query.processAllAvailable()
      val got = canon(dropSentinel(spark.table("ceptws").as[CepMatch].collect().toSeq))
      query.stop()
      val want = canon(dropSentinel(
        BatchEvaluator.evaluate(Transcripts.toEv(Transcripts.toDs(spark, turns)), patterns).collect().toSeq))
      assert(want.nonEmpty)
      assert(got == want)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("assumeOrdered mode equals batch when slices respect (ts, idx) order") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val turns = Transcripts.generate(nConvs = 12)
    val evs = Transcripts.toEv(Transcripts.toDs(spark, turns)).collect().toSeq.sortBy(e => (e.ts, e.idx))
    val maxTs = evs.map(_.ts).max

    val input = MemoryStream[Ev]
    val out = StreamEvaluator.evaluate(input.toDS(), patterns, delay = "5 seconds",
      assumeOrdered = true)
    val query = out.writeStream
      .format("memory").queryName("cepordered").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    // slices cut the globally (ts, idx)-sorted stream — the ordered-arrival contract
    evs.grouped(53).foreach { s => input.addData(s); query.processAllAvailable() }
    input.addData(sentinel(maxTs)); query.processAllAvailable()
    input.addData(sentinel(maxTs + 1)); query.processAllAvailable()
    val got = canon(dropSentinel(spark.table("cepordered").as[CepMatch].collect().toSeq))
    query.stop()

    val want = canon(dropSentinel(
      BatchEvaluator.evaluate(Transcripts.toEv(Transcripts.toDs(spark, turns)), patterns).collect().toSeq))
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("adaptive replan across restart: resume under a DIFFERENT join order still equals batch") {
    import spark.implicits._
    val turns = Transcripts.generate(nConvs = 10)
    val evs = Transcripts.toEv(Transcripts.toDs(spark, turns)).collect().toSeq.sortBy(e => (e.ts, e.idx))
    val maxTs = evs.map(_.ts).max
    val dir = Files.createTempDirectory("cepadaptive")
    val srcDir = s"$dir/src"; val ckpt = s"$dir/ckpt"; val outDir = s"$dir/out"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val schema = spark.emptyDataset[Ev].schema
    def writeSlice(slice: Seq[Ev], n: Int): Unit =
      spark.createDataset(slice).repartition(1).write.parquet(s"$srcDir/batch$n")
    val half = evs.length / 2
    writeSlice(evs.take(half), 0)

    def startQuery(order: Orders.Strategy) = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$srcDir/batch*").as[Ev]
      StreamEvaluator.evaluate(src, patterns, delay = "5 seconds", order = order)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.ProcessingTime(0))
        .start()
    }

    val q1 = startQuery(Orders.Trivial)
    q1.processAllAvailable()
    q1.stop()
    // "statistics drifted": the restarted query compiles a different join order; per-key
    // state written under the trivial plan is fingerprint-detected and migrated by
    // leaf-event replay (the reference's trivial tree swap)
    writeSlice(evs.drop(half), 1)
    writeSlice(Seq(sentinel(maxTs)), 2)
    writeSlice(Seq(sentinel(maxTs + 1)), 3)
    val q2 = startQuery(Orders.AscendingRate(
      Map("USER" -> 5.0, "TOOL" -> 1.0, "ASSISTANT" -> 10.0)))
    q2.processAllAvailable()
    q2.stop()

    val got = canon(dropSentinel(spark.read.parquet(outDir).as[CepMatch].collect().toSeq))
    val want = canon(dropSentinel(
      BatchEvaluator.evaluate(Transcripts.toEv(Transcripts.toDs(spark, turns)), patterns).collect().toSeq))
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("SIMULTANEOUS swap across restart (previousOrder): multiset-equal to batch") {
    import spark.implicits._
    val turns = Transcripts.generate(nConvs = 10)
    val evs = Transcripts.toEv(Transcripts.toDs(spark, turns)).collect().toSeq.sortBy(e => (e.ts, e.idx))
    val maxTs = evs.map(_.ts).max
    val dir = Files.createTempDirectory("cepsimul")
    val srcDir = s"$dir/src"; val ckpt = s"$dir/ckpt"; val outDir = s"$dir/out"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val schema = spark.emptyDataset[Ev].schema
    def writeSlice(slice: Seq[Ev], n: Int): Unit =
      spark.createDataset(slice).repartition(1).write.parquet(s"$srcDir/batch$n")
    val half = evs.length / 2
    writeSlice(evs.take(half), 0)

    def startQuery(order: Orders.Strategy, previous: Option[Orders.Strategy]) = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$srcDir/batch*").as[Ev]
      StreamEvaluator.evaluate(src, patterns, delay = "5 seconds", order = order,
          previousOrder = previous)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.ProcessingTime(0))
        .start()
    }
    val q1 = startQuery(Orders.Trivial, None)
    q1.processAllAvailable(); q1.stop()
    writeSlice(evs.drop(half), 1)
    writeSlice(Seq(sentinel(maxTs)), 2)
    writeSlice(Seq(sentinel(maxTs + 1)), 3)
    // restart under a different order, declaring the old one: each key runs both engines
    // for one window (old = sole emitter), then retires it — no replay, no loss, no dups
    val q2 = startQuery(
      Orders.AscendingRate(Map("USER" -> 5.0, "TOOL" -> 1.0, "ASSISTANT" -> 10.0)),
      Some(Orders.Trivial))
    q2.processAllAvailable(); q2.stop()

    def multiset(ms: Seq[CepMatch]) =
      ms.map(m => (m.key, m.patternId, m.binds.toList.sortBy(_.slot).map(b => (b.slot, b.evs.map(_.idx)))))
        .sortBy(_.toString)
    val got = multiset(dropSentinel(spark.read.parquet(outDir).as[CepMatch].collect().toSeq))
    val want = multiset(dropSentinel(
      BatchEvaluator.evaluate(Transcripts.toEv(Transcripts.toDs(spark, turns)), patterns).collect().toSeq))
    assert(want.nonEmpty)
    assert(got == want, "simultaneous swap must emit each match exactly once")
  }

  test("TWS checkpoint resume: kill and restart equals batch (RocksDB store)") {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val turns = Transcripts.generate(nConvs = 10)
      val evs = Transcripts.toEv(Transcripts.toDs(spark, turns)).collect().toSeq.sortBy(e => (e.ts, e.idx))
      val maxTs = evs.map(_.ts).max
      val dir = Files.createTempDirectory("ceptwsresume")
      val srcDir = s"$dir/src"; val ckpt = s"$dir/ckpt"; val outDir = s"$dir/out"
      Files.createDirectories(java.nio.file.Paths.get(srcDir))
      val schema = spark.emptyDataset[Ev].schema
      def writeSlice(slice: Seq[Ev], n: Int): Unit =
        spark.createDataset(slice).repartition(1).write.parquet(s"$srcDir/batch$n")
      val half = evs.length / 2
      writeSlice(evs.take(half), 0)
      def startQuery() = {
        val src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$srcDir/batch*").as[Ev]
        StreamEvaluator.evaluateTws(src, patterns, delay = "5 seconds")
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.ProcessingTime(0))
          .start()
      }
      val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
      writeSlice(evs.drop(half), 1)
      writeSlice(Seq(sentinel(maxTs)), 2)
      writeSlice(Seq(sentinel(maxTs + 1)), 3)
      val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
      val got = canon(dropSentinel(spark.read.parquet(outDir).as[CepMatch].collect().toSeq))
      val want = canon(dropSentinel(
        BatchEvaluator.evaluate(Transcripts.toEv(Transcripts.toDs(spark, turns)), patterns).collect().toSeq))
      assert(want.nonEmpty)
      assert(got == want)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming salted (pane fan-out) equals batch under slicing, incl. back-pane negation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.cep.PStruct._
    val MIN = SparkT.MIN
    // AND(a, NOT(b), c) admits a negative up to `window` BEFORE the match's first
    // positive — the shape that needs back-pane replication; the crafted trio straddles
    // a pane boundary exactly (b at 3p-1, a at 3p, c at 3p+1) so the kill only happens
    // if b's back-replica reaches pane 3.
    val andNot = Pattern(
      AND(P("USER", "a"), NOT(P("TOOL", "b")), P("ASSISTANT", "c")),
      CTrue, windowMicros = 5 * MIN, id = 3)
    val pane = 10 * MIN
    val allPatterns = patterns :+ andNot
    val turns = Transcripts.generate(nConvs = 12)
    val trio = Seq(
      Ev("k-boundary", 0, "TOOL", 3 * pane - 1, 0, null, null),
      Ev("k-boundary", 1, "USER", 3 * pane, 0, null, null),
      Ev("k-boundary", 2, "ASSISTANT", 3 * pane + 1, 0, null, null))
    val evs = (Transcripts.toEv(Transcripts.toDs(spark, turns)).collect().toSeq ++ trio)
      .sortBy(e => (e.ts, e.idx))
    val maxTs = evs.map(_.ts).max

    val input = MemoryStream[Ev]
    val out = StreamEvaluator.evaluateSalted(input.toDS(), allPatterns, paneMicros = pane,
      delay = "5 seconds")
    val query = out.writeStream
      .format("memory").queryName("cepsalted").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    evs.grouped(43).foreach { s => input.addData(s); query.processAllAvailable() }
    input.addData(sentinel(maxTs)); query.processAllAvailable()
    input.addData(sentinel(maxTs + 1)); query.processAllAvailable()
    val got = canon(dropSentinel(spark.table("cepsalted").as[CepMatch].collect().toSeq))
    query.stop()

    val want = canon(dropSentinel(
      BatchEvaluator.evaluate(spark.createDataset(evs), allPatterns).collect().toSeq))
    assert(want.nonEmpty)
    // negPattern (id 1) legitimately matches on k-boundary (its NOT sits between u and a;
    // the TOOL event precedes u) — only the AND-NOT pattern must be killed by the
    // back-replicated b.
    assert(got.forall(m => !(m._1 == "k-boundary" && m._2 == 3)),
      "the boundary-straddling b must kill the AND-NOT match")
    assert(got == want)
  }

  test("streaming hot-set routing: only listed keys fan out, output equals batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val turns = Transcripts.generate(nConvs = 12)
    val evs = Transcripts.toEv(Transcripts.toDs(spark, turns)).collect().toSeq.sortBy(e => (e.ts, e.idx))
    val maxTs = evs.map(_.ts).max

    val input = MemoryStream[Ev]
    val out = StreamEvaluator.evaluateSalted(input.toDS(), patterns,
      paneMicros = 10 * SparkT.MIN, delay = "5 seconds", hotKeys = Some(Seq("conv-00000")))
    val query = out.writeStream
      .format("memory").queryName("cephotset").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    evs.grouped(47).foreach { s => input.addData(s); query.processAllAvailable() }
    input.addData(sentinel(maxTs)); query.processAllAvailable()
    input.addData(sentinel(maxTs + 1)); query.processAllAvailable()
    val got = canon(dropSentinel(spark.table("cephotset").as[CepMatch].collect().toSeq))
    query.stop()

    val want = canon(dropSentinel(
      BatchEvaluator.evaluate(Transcripts.toEv(Transcripts.toDs(spark, turns)), patterns).collect().toSeq))
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("streaming salted checkpoint resume: kill and restart equals batch") {
    import spark.implicits._
    val turns = Transcripts.generate(nConvs = 10)
    val evs = Transcripts.toEv(Transcripts.toDs(spark, turns)).collect().toSeq.sortBy(e => (e.ts, e.idx))
    val maxTs = evs.map(_.ts).max
    val dir = Files.createTempDirectory("cepsaltedresume")
    val srcDir = s"$dir/src"; val ckpt = s"$dir/ckpt"; val outDir = s"$dir/out"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val schema = spark.emptyDataset[Ev].schema
    def writeSlice(slice: Seq[Ev], n: Int): Unit =
      spark.createDataset(slice).repartition(1).write.parquet(s"$srcDir/batch$n")
    val half = evs.length / 2
    writeSlice(evs.take(half), 0)
    def startQuery() = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$srcDir/batch*").as[Ev]
      StreamEvaluator.evaluateSalted(src, patterns, paneMicros = 10 * SparkT.MIN,
          delay = "5 seconds")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.ProcessingTime(0))
        .start()
    }
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    writeSlice(evs.drop(half), 1)
    writeSlice(Seq(sentinel(maxTs)), 2)
    writeSlice(Seq(sentinel(maxTs + 1)), 3)
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
    val got = canon(dropSentinel(spark.read.parquet(outDir).as[CepMatch].collect().toSeq))
    val want = canon(dropSentinel(
      BatchEvaluator.evaluate(Transcripts.toEv(Transcripts.toDs(spark, turns)), patterns).collect().toSeq))
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("streaming salted rejects consumption-policy patterns") {
    import spark.implicits._
    val p = flagship.copy(policy = Policy(single = Set("TOOL")))
    val e = intercept[IllegalArgumentException] {
      StreamEvaluator.evaluateSalted(spark.emptyDataset[Ev], Seq(p), paneMicros = 10 * SparkT.MIN)
    }
    assert(e.getMessage.contains("MATCH_ANY"))
  }

  test("checkpoint resume: kill and restart yields exactly the batch result (exactly-once sink)") {
    import spark.implicits._
    val turns = Transcripts.generate(nConvs = 10)
    val evs = Transcripts.toEv(Transcripts.toDs(spark, turns)).collect().toSeq.sortBy(e => (e.ts, e.idx))
    val maxTs = evs.map(_.ts).max
    val dir = Files.createTempDirectory("cepresume")
    val srcDir = s"$dir/src"; val ckpt = s"$dir/ckpt"; val outDir = s"$dir/out"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))

    val schema = spark.emptyDataset[Ev].schema
    def writeSlice(slice: Seq[Ev], n: Int): Unit =
      spark.createDataset(slice).repartition(1).write.parquet(s"$srcDir/batch$n")

    val half = evs.length / 2
    writeSlice(evs.take(half), 0)

    def startQuery() = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$srcDir/batch*").as[Ev]
      StreamEvaluator.evaluate(src, patterns, delay = "5 seconds")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.ProcessingTime(0))
        .start()
    }

    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // hard stop: simulates failure; checkpoint holds state + offsets

    writeSlice(evs.drop(half), 1)
    writeSlice(Seq(sentinel(maxTs)), 2)
    writeSlice(Seq(sentinel(maxTs + 1)), 3)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val got = canon(dropSentinel(spark.read.parquet(outDir).as[CepMatch].collect().toSeq))
    val want = canon(dropSentinel(
      BatchEvaluator.evaluate(Transcripts.toEv(Transcripts.toDs(spark, turns)), patterns).collect().toSeq))
    assert(want.nonEmpty)
    assert(got == want)
  }
}
