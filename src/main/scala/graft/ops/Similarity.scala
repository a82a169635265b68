package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Approximate-nearest-neighbor search over the `embeddings` table (embedding:
 * array<float>, 64-dim).
 *
 * Two paths:
 *  - [[bruteTop1]]: exact brute-force cosine top-1 — the correctness baseline. O(n^2) pairs
 *    but fully distributed (self-join keyed nothing -> Spark plans BroadcastNestedLoopJoin
 *    with the smaller side broadcast; at 100 TB you'd chunk the probe side).
 *  - [[lshTop1]]: random-hyperplane LSH buckets (sign sketch) — candidates only within a
 *    bucket, linear shuffle volume, the scale path. Recall traded via number of planes.
 *
 * Dot products are computed with `zip_with`/`aggregate` over doubles — codegen'd Catalyst
 * expressions, no Python/JVM UDF in the hot loop.
 */
object Similarity {

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("norm", sqrt(dot(col("v"), col("v"))))

  /** Exact cosine top-1 neighbor per vector. Ties broken by neighbor id (deterministic). */
  def bruteTop1(spark: SparkSession, sfDir: String): DataFrame = {
    val e = withNorm(emb(spark, sfDir))
    val sims = e.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_id"),
        col("b.vec_id").as("nn_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm"))).as("sim"))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("nn_id"))
    sims.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("nn_id"))
  }

  /** Deterministic pseudo-random hyperplanes: plane p component d from a hash mix. */
  private def planeComponent(p: Int, d: Int): Double = {
    var h = p.toLong * 0x9e3779b97f4a7c15L + d.toLong * 0xc2b2ae3d27d4eb4fL
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    (h.toDouble / Long.MaxValue.toDouble) // in [-1, 1]
  }

  /** LSH (random hyperplane sign sketch) top-1: bucket by `nPlanes` sign bits, search only
    * within buckets. Approximate — vectors alone in their bucket get no neighbor. */
  def lshTop1(spark: SparkSession, sfDir: String, nPlanes: Int = 8): DataFrame = {
    val e = withNorm(emb(spark, sfDir))
    val planes = (0 until nPlanes).map { p =>
      val comps = (0 until 64).map(d => lit(planeComponent(p, d)))
      val proj = (0 until 64).map(d => element_at(col("v"), d + 1) * comps(d)).reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val bucketed = e.withColumn("bucket", planes)
    val sims = bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_id"),
        col("b.vec_id").as("nn_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm"))).as("sim"))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("nn_id"))
    sims.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("nn_id"))
  }
}
