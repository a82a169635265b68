package graft.cep.spark

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.cep.Ev

/**
 * Statistics side-pipeline — the Spark equivalent of the reference's adaptive statistics
 * collector (/root/reference/adaptive/statistics/Statistics.py:43-182). The reference feeds
 * these into its adaptive plan optimizer; we expose them as plain aggregations a cost-based
 * order selector (or a dashboard) can consume. Arrival rates are a windowed groupBy —
 * map-side partial aggregation, one small shuffle.
 */
object Stats {

  /** Sliding arrival rate per event type: events per `windowDur` bucket
    * (/root/reference/adaptive/statistics/Statistics.py:43-100). Works on both batch and
    * streaming Datasets (add a watermark upstream for streaming). */
  def arrivalRates(events: Dataset[Ev], windowDur: String): DataFrame =
    events
      .withColumn("eventTime", timestamp_micros(col("ts")))
      .groupBy(col("etype"), window(col("eventTime"), windowDur).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("etype"), unix_micros(col("w.start")).as("window_start"), col("n_events"))

  /** Per-type selectivity of a unary predicate: fraction of events passing
    * (/root/reference/adaptive/statistics/Statistics.py:103-182, condition-selectivity
    * matrix — here the per-leaf diagonal, which is what leaf ordering needs). */
  def selectivity(events: Dataset[Ev], pred: Ev => Boolean): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.map(e => (e.etype, if (pred(e)) 1L else 0L, 1L))
      .toDF("etype", "passed", "total")
      .groupBy("etype")
      .agg(sum("passed").as("n_passed"), sum("total").as("n_total"))
      .withColumn("selectivity", col("n_passed").cast("double") / col("n_total").cast("double"))
  }
}
