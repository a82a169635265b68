package graft.io

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.cep._
import graft.cep.PStruct._
import graft.cep.spark.{SparkT, StreamEvaluator}

/** The live (rate-source) feed drives the streaming evaluator end to end: an unbounded
  * query over [[Transcripts.liveStream]] must produce matches within a bounded wall-clock
  * wait. Covers the plumbing the file-replay suites cannot: a source with no end, real
  * processing-time event times, and continuous watermark advance. */
class LiveSourceSpec extends AnyFunSuite {
  import SparkT._

  test("rate-source live stream feeds the CEP evaluator and produces matches") {
    import spark.implicits._
    // Keep the workload in a bounded regime: MATCH_ANY SEQ(u,t,a) under CTrue emits
    // O(n^3) matches per conversation for n turns inside the window. At 400 rows/s with
    // a 10-minute window the very first micro-batches balloon past the deadline (at
    // 40 rows/s this pattern already emits >100k matches in 20 s); 40 rows/s over a
    // 1-minute window bounds per-batch state AND output while still exercising the
    // unbounded-source plumbing this spec exists for.
    val p = Pattern(
      SEQ(P("USER", "u"), P("TOOL", "t"), P("ASSISTANT", "a")),
      CTrue, windowMicros = 1 * MIN)
    val evs = Transcripts.toEv(Transcripts.liveStream(spark, rowsPerSecond = 40, convs = 4))
    // per-key arrival order == event-time order on the rate source (monotonic value ->
    // monotonic timestamp), so the ordered fast path applies and matches emit immediately
    val out = StreamEvaluator.evaluate(evs, Seq(p), delay = "1 second", assumeOrdered = true)
    val query = out.writeStream
      .format("memory").queryName("ceplive").outputMode("append")
      .trigger(Trigger.ProcessingTime(200))
      .start()
    val deadline = System.nanoTime() + 60L * 1000000000L
    var n = 0L
    while (n == 0 && System.nanoTime() < deadline) {
      Thread.sleep(500)
      n = spark.table("ceplive").count()
    }
    query.stop()
    assert(n > 0, "expected live matches within 60s")
    val one = spark.table("ceplive").as[CepMatch].head()
    assert(one.key.startsWith("live-"))
    assert(one.binds.map(_.name).toSet == Set("u", "t", "a"))
  }
}
