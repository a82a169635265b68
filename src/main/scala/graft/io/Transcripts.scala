package graft.io

import org.apache.spark.sql.{Dataset, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cep.Ev
import scala.util.Random

/**
 * The primary input table per BASELINE.json `input_hint`:
 * transcripts(conv_id, turn_idx, role, text, tool, ts). Includes the deterministic seeded
 * generator used for parity fixtures and benchmarks (FIXTURES.md) — at production scale this
 * is an Iceberg table; in this sandbox a parquet-backed Dataset with the same schema.
 */
object Transcripts {

  final case class Turn(
      conv_id: String,
      turn_idx: Int,
      role: String,
      text: String,
      tool: String,
      ts: java.sql.Timestamp)

  /** EventTypeClassifier analogue (/root/reference/base/DataFormatter.py:4-15;
    * rule from FIXTURES.md §1). */
  def classify(role: String, tool: String): String =
    if (role == "user") "USER"
    else if (tool != null) "TOOL"
    else if (role == "assistant") "ASSISTANT"
    else "SYSTEM"

  /** Generator content version — BUMP whenever generated output changes in any way
    * (Bench reuses on-disk corpora whose marker carries this tag; a stale tag would
    * silently benchmark old data). v2 = the +1 day epoch offset. */
  val GenVersion = "gen-v2"

  /** Deterministic seeded generator (seed fixed per conversation so generation is
    * order-independent and parallelizable). ~30% of turns land in one hot conversation to
    * exercise skew handling; duplicate-timestamp pairs are injected to exercise the SEQ
    * tie rule. */
  def generate(nConvs: Int, seed: Long = 42L, hotShare: Double = 0.3): Seq[Turn] =
    (0 until nConvs).flatMap(c => genConv(c, seed, nConvs, hotShare))

  /** Distributed generation: per-conversation determinism lets executors generate
    * independently — no driver-side materialization at bench scale. */
  def generateDs(spark: SparkSession, nConvs: Int, seed: Long = 42L,
                 hotShare: Double = 0.3): Dataset[Turn] = {
    import spark.implicits._
    spark.range(0, nConvs, 1, math.min(nConvs, 256))
      .flatMap(c => genConv(c.toInt, seed, nConvs, hotShare))
  }

  def genConv(c: Int, seed: Long, nConvs: Int, hotShare: Double): Seq[Turn] = {
    val r = new Random(seed * 1000003L + c)
    val convId = f"conv-$c%05d"
    val baseTurns = 3 + r.nextInt(58)
    // conversation 0 is the hot key: scale its turn count so it holds ~hotShare of turns
    val nTurns =
      if (c == 0 && nConvs > 1) math.max(baseTurns,
        (hotShare / (1 - hotShare) * 31.5 * (nConvs - 1)).toInt)
      else baseTurns
    // +1 day epoch offset: a conversation whose hash lands at slot 0 would otherwise
    // start at EXACTLY epoch 0, and Structured Streaming's INITIAL watermark (also 0)
    // drops epoch-0 events as late before the first batch ever runs — 2 rows / 13 matches
    // silently short at 100k convs until the per-batch droppedByWatermark metric caught
    // it. Real streams never carry 1970-01-01T00:00:00.000000; keep the corpus off that
    // degenerate boundary instead of fighting Spark's watermark semantics.
    val startMicros = ((math.abs(convId.hashCode) % 100000).toLong + 1440L) * 60L * 1000000L
    var ts = startMicros
    val tools = Array("search", "code", "fetch", "calc")
    (0 until nTurns).map { i =>
      // 0-120s per-turn increment; every ~7th pair shares a timestamp (tie coverage)
      if (i > 0 && i % 7 != 0) ts += r.nextInt(120) * 1000000L + r.nextInt(1000000)
      val role = (i % 3, r.nextInt(10)) match {
        case (0, _)          => "user"
        case (1, d) if d < 8 => "assistant"
        case (2, d) if d < 8 => "assistant"
        case _               => "system"
      }
      val tool = if (role == "assistant" && r.nextInt(100) < 25) tools(r.nextInt(4)) else null
      val words = (0 until 3 + r.nextInt(12)).map(_ => WORDS(r.nextInt(WORDS.length))).mkString(" ")
      Turn(convId, i, role, s"[$convId/$i] $words", tool, new java.sql.Timestamp(ts / 1000L))
    }
  }

  private val WORDS = Array("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "spark", "stream", "pattern", "match", "window", "state", "shuffle", "partition")

  def toDs(spark: SparkSession, turns: Seq[Turn]): Dataset[Turn] = {
    import spark.implicits._
    spark.createDataset(turns)
  }

  /** Live-source analogue of the reference's TwitterInputStream
    * (/root/reference/plugin/twitter/TwitterInputStream.py — an unbounded external feed
    * pumped through the same evaluation mechanisms; the real service needs credentials
    * and egress, out of scope in this sandbox). Spark's built-in `rate` source provides
    * the same shape — an unbounded, rate-controlled live stream with real processing-time
    * event times — so every streaming evaluator (plain / salted / tws) can be driven
    * against a LIVE feed, not just file replays. Turns are synthesized deterministically
    * from the rate source's monotonic `value`: `convs` interleaved conversations, each
    * cycling user → assistant+tool → assistant (so SEQ(USER, TOOL, ASSISTANT) patterns
    * fire continuously), event time = the source's timestamp. Per-key turn order follows
    * arrival order, satisfying the `assumeOrdered` contract. */
  def liveStream(spark: SparkSession, rowsPerSecond: Int, convs: Int = 64): Dataset[Turn] = {
    import spark.implicits._
    val cyc = expr(s"(value div $convs) % 3")
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()
      .select(
        format_string("live-%05d", pmod(col("value"), lit(convs.toLong)).cast("int")).as("conv_id"),
        expr(s"value div $convs").cast("int").as("turn_idx"),
        when(cyc === 0, "user").otherwise("assistant").as("role"),
        format_string("[live] turn %d", col("value")).as("text"),
        when(cyc === 1, "search").otherwise(lit(null).cast("string")).as("tool"),
        col("timestamp").as("ts"))
      .as[Turn]
  }

  /** Map transcripts to engine events: key=conv_id, idx=turn_idx, etype=classify(role,tool),
    * ts in micros, num=text length (the default numeric payload), s1=text, s2=tool. */
  def toEv(ds: Dataset[Turn]): Dataset[Ev] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.select(
      col("conv_id").as("key"),
      col("turn_idx").cast("long").as("idx"),
      when(col("role") === "user", "USER")
        .when(col("tool").isNotNull, "TOOL")
        .when(col("role") === "assistant", "ASSISTANT")
        .otherwise("SYSTEM").as("etype"),
      unix_micros(col("ts")).as("ts"),
      length(col("text")).cast("double").as("num"),
      col("text").as("s1"),
      col("tool").as("s2"),
      lit(-1.0).as("prob")
    ).as[Ev]
  }
}

/** Schema-on-read CSV source for transcripts — the analogue of the reference's
  * CSV DataFormatters (/root/reference/plugin/stocks/Stocks.py:34-61,
  * /root/reference/plugin/citibike/CitiBikeFormatter.py:26-124): explicit StructType,
  * header SNIFFING with legacy/modern dual-schema support (the CitiBike formatter's
  * defining trick), timestamp parsing, nullable tool column, malformed-row dropping. */
object TranscriptsCsv {
  import org.apache.spark.sql.types._

  /** Canonical (modern) layout. */
  val schema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = false)))

  /** Legacy export layout: renamed columns, epoch-millis timestamps, a trailing column we
    * discard — the reference's CitiBike "old format" situation
    * (/root/reference/plugin/citibike/CitiBikeFormatter.py:26-75). */
  val legacySchema: StructType = StructType(Seq(
    StructField("conversation", StringType, nullable = false),
    StructField("idx", IntegerType, nullable = false),
    StructField("speaker", StringType, nullable = false),
    StructField("content", StringType, nullable = true),
    StructField("tool_name", StringType, nullable = true),
    StructField("ts_millis", LongType, nullable = false),
    StructField("export_tag", StringType, nullable = true)))

  /** Sniff the header line to pick the layout (reference `CitiBikeFormatter.__init__`
    * peeks the first row the same way). One tiny driver-side read of one line. */
  private def sniffLegacy(spark: SparkSession, path: String): Boolean = {
    val first = spark.read.text(path).head(1).headOption.map(_.getString(0)).getOrElse("")
    first.split(",").headOption.map(_.trim.toLowerCase).contains("conversation")
  }

  def read(spark: SparkSession, path: String, header: Boolean = true): Dataset[Transcripts.Turn] = {
    import spark.implicits._
    if (header && sniffLegacy(spark, path)) {
      spark.read
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .schema(legacySchema)
        .csv(path)
        .select(
          col("conversation").as("conv_id"),
          col("idx").as("turn_idx"),
          col("speaker").as("role"),
          col("content").as("text"),
          col("tool_name").as("tool"),
          timestamp_millis(col("ts_millis")).as("ts"))
        .as[Transcripts.Turn]
    } else {
      spark.read
        .option("header", header.toString)
        .option("mode", "DROPMALFORMED")
        .schema(schema)
        .csv(path)
        .as[Transcripts.Turn]
    }
  }

  def write(ds: Dataset[Transcripts.Turn], path: String): Unit =
    ds.write.option("header", "true").mode("overwrite").csv(path)

  /** Write the legacy layout (test fixture + migration tooling). */
  def writeLegacy(ds: Dataset[Transcripts.Turn], path: String): Unit =
    ds.select(
      col("conv_id").as("conversation"),
      col("turn_idx").as("idx"),
      col("role").as("speaker"),
      col("text").as("content"),
      col("tool").as("tool_name"),
      unix_millis(col("ts")).as("ts_millis"),
      lit("v1").as("export_tag"))
      .write.option("header", "true").mode("overwrite").csv(path)
}

/** Adapter for the driver's events table (events.parquet under /root/testdata/sf&#42;):
  * key=user_id, idx=event_id, etype=event_type, num=value, s1=props.
  *
  * IDX CONTIGUITY CAVEAT: `Bind.aggId = idx + 1` reproduces the reference's
  * aggregate-identity quirk EXACTLY only when `idx` is a contiguous per-key arrival
  * serial (the reference's global Event.counter restricted to one key — true for
  * transcripts' turn_idx). This table uses raw `event_id`, which is globally assigned and
  * has per-user gaps, so Kleene-closure aggregate identities here are "event_id of the
  * newest member + 1" rather than "next per-user serial". That is a well-defined,
  * deterministic semantic of THIS adapter — the driver's cep_kleene oracle mirrors it
  * verbatim (`k_last + 1 <> b_id`) — but a reference run fed the same per-user stream
  * with renumbered serials would differ. To get reference-exact KC identity on arbitrary
  * tables, derive idx as row_number() over (key ORDER BY ts, event_id) at load time. */
object EventsTable {
  import org.apache.spark.sql.functions._

  def load(spark: SparkSession, sfDir: String): Dataset[Ev] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(
        col("user_id").cast("string").as("key"),
        col("event_id").as("idx"),
        col("event_type").as("etype"),
        // driver parquet carries TIMESTAMP_NTZ; cast is exact under the UTC session timezone
        unix_micros(col("ts").cast("timestamp")).as("ts"),
        col("value").as("num"),
        col("props").as("s1"),
        lit(null).cast("string").as("s2"),
        lit(-1.0).as("prob"))
      .as[Ev]
  }
}
