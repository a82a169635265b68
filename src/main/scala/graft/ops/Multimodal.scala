package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing for a training-data pipeline: media payloads ride as opaque
 * `binary` columns with typed metadata; decode / feature-extract / frame-sample run as
 * batched partition-local transforms (the Scala analogue of `mapInPandas`: one JVM call per
 * batch, arrays in, arrays out — the shape a vectorized codec wants).
 *
 * The DECODE STEP IS A STUB: this container has no image/audio codecs, so [[decodeStub]]
 * produces deterministic fake features from the raw bytes. The Spark-side contract —
 * schema, binary transport, partition batching, feature vector shape — is real and tested;
 * swapping in an actual codec (ffmpeg/javacv/JPEG decoder) only replaces [[decodeStub]].
 */
object Multimodal {

  final case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      sha: String,
      features: Array[Float], // FEATURE_DIM-length embedding from the (stub) decoder
      frames: Int)

  val FEATURE_DIM = 16
  val BATCH_SIZE = 64

  /** Synthesize a deterministic media table from `documents` (text bytes stand in for the
    * media payload; kind derived from doc_id). At production scale this is the Iceberg
    * table with real blobs — the pipeline below is agnostic to where the bytes came from. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          lit("application/x-fake").as("mime"),
          (col("n_chars") % 640).cast("int").as("width"),
          (col("n_chars") % 480).cast("int").as("height"),
          (col("n_chars") * 10).cast("long").as("durationMs")).as("meta"))
      .as[MediaRow]
  }

  /**
   * STUB DECODER — stands in for a real codec. Deterministic pseudo-features: a rolling
   * FNV-1a over byte windows folded into FEATURE_DIM floats; `frames` models frame count
   * for video (1 per 256 payload bytes, min 1). Replace this single function with a real
   * decoder to productionize; everything around it (batching, schema, shuffle) stays.
   */
  private[ops] def decodeStub(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      val acc = new Array[Float](FEATURE_DIM)
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < m.payload.length) {
        h ^= m.payload(i); h *= 0x100000001b3L
        acc(i % FEATURE_DIM) += ((h >>> 40).toInt % 1000) / 1000.0f
        i += 1
      }
      val sha = java.security.MessageDigest.getInstance("MD5")
        .digest(m.payload).map("%02x".format(_)).mkString
      MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, sha, acc,
        frames = math.max(1, m.payload.length / 256))
    }

  /** Batched feature extraction: partition-local, no shuffle; batches of BATCH_SIZE rows
    * feed the (stub) decoder exactly like arrow batches would feed mapInPandas. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(BATCH_SIZE).flatMap(decodeStub))
  }

  /** Frame sampling for "video" rows: emit one row per sampled frame (every `stride`-th),
    * with a per-frame fingerprint — the explode-shaped half of a video pipeline.
    * The fingerprint is md5(payload)-derived (not JVM hashCode) so an external engine can
    * replicate it — this is what makes the driver's DuckDB oracle possible.
    *
    * Pure Catalyst since round 6: sha, frame count and fingerprints are all metadata
    * derivable from the raw payload bytes (md5 + octet_length), so the row never leaves
    * Tungsten format and the decoder is not invoked for data the query discards
    * (guide §1.2: don't compute things you throw away). `OpsSpec` pins the
    * projection bit-equal to [[decodeStub]]'s sha/frames on the same rows. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): DataFrame = {
    val frames = greatest(lit(1), (octet_length(col("payload")) / lit(256)).cast("int"))
    media.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"), md5(col("payload")).as("sha"),
        explode(sequence(lit(0L), (frames - 1).cast("long"), lit(stride.toLong))).as("frame_no"))
      .select(col("media_id"), col("frame_no"),
        concat(col("sha"), lit(":"), col("frame_no")).as("frame_fp"))
  }

  /** Metadata summary as a pure Catalyst projection: media_id, kind, n_bytes, sha,
    * frames. Every column is payload METADATA (md5 / octet_length / arithmetic), so no
    * decode and no typed-object round trip — the old route through [[extractFeatures]]
    * deserialized each row to a case class, ran the stub feature loop and discarded the
    * features. Bit-equality with the stub's sha/frames is pinned by `OpsSpec`. */
  def mediaSummary(media: Dataset[MediaRow]): DataFrame =
    media.toDF().select(
      col("media_id"), col("kind"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("sha"),
      greatest(lit(1), (octet_length(col("payload")) / lit(256)).cast("int")).as("frames"))

  /** Oracle-friendly projection (metadata only — no decode needed). */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    mediaSummary(mediaTable(spark, sfDir))
      .select(col("media_id"), col("kind"), col("n_bytes"), col("sha"))

  /** Full feature rows (embedding included) — the decode path. Callers that only need
    * metadata should use [[mediaSummary]]/[[mediaMeta]], which skip the decoder. */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaTable(spark, sfDir)).toDF()
}
