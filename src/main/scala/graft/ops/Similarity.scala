package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions

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
 * Dot products use [[graft.functions.DotProduct]] — a native Catalyst expression with
 * doGenCode, so the pair loop stays inside whole-stage codegen (the built-in
 * aggregate/zip_with higher-order functions are interpreted per element).
 */
object Similarity {

  private def emb(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  }

  private def dot(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("norm", sqrt(dot(col("v"), col("v"))))

  def bruteTop1(spark: SparkSession, sfDir: String): DataFrame =
    bruteTop1(emb(spark, sfDir))

  /** Exact cosine top-1 neighbor per vector (input: vec_id, v: array<double>).
    * Ties broken by neighbor id (deterministic). */
  def bruteTop1(vectors: DataFrame): DataFrame = {
    VectorFunctions.register(vectors.sparkSession)
    val e = withNorm(vectors)
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

  /** LSH (random hyperplane sign sketch) top-1: `nTables` independent hash tables of
    * `planesPerTable` sign bits each; candidate pairs share a bucket in ANY table (multi-
    * table banding, same trick as MinHash LSH — a single table's all-bits-agree event is
    * too rare for useful recall). Shuffle volume stays linear: (table, bucket, vec_id). */
  def lshTop1(spark: SparkSession, sfDir: String, nTables: Int = 4, planesPerTable: Int = 4): DataFrame =
    lshTop1(emb(spark, sfDir), nTables, planesPerTable)

  /** Explode each vector into its (table, bucket) LSH rows — shared by [[lshTop1]] and
    * [[embedDupPairs]]. Plane projection via the codegen'd dot_product against a literal
    * plane vector — inlining 64 element_at terms per plane overflows janino's
    * method-size limit. */
  private def lshTables(vectors: DataFrame, nTables: Int, planesPerTable: Int): DataFrame = {
    val e = withNorm(vectors)
    def bucketCol(table: Int) = (0 until planesPerTable).map { j =>
      val p = table * planesPerTable + j
      val plane = typedLit((0 until 64).map(d => planeComponent(p, d)))
      when(dot(col("v"), plane) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    e.select(col("vec_id"), col("v"), col("norm"),
      explode(array((0 until nTables).map(t => struct(lit(t).as("t"), bucketCol(t).as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("v"), col("norm"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
  }

  def lshTop1(vectors: DataFrame, nTables: Int, planesPerTable: Int): DataFrame = {
    VectorFunctions.register(vectors.sparkSession)
    val tables = lshTables(vectors, nTables, planesPerTable)
    val cands = tables.as("a").join(tables.as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_id"), col("b.vec_id").as("nn_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm"))).as("sim"))
      .dropDuplicates("vec_id", "nn_id")
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("nn_id"))
    cands.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("nn_id"))
  }

  def embedDup(spark: SparkSession, sfDir: String, nTables: Int = 4, planesPerTable: Int = 4,
               threshold: Double = 0.35): DataFrame =
    embedDupPairs(emb(spark, sfDir), nTables, planesPerTable, threshold)

  /** Embedding-cosine NEAR-DUPLICATE pairs — the dedup-flavored variant of [[lshTop1]]:
    * unordered (a < b) pairs that share a bucket in ANY LSH table and whose exact cosine
    * clears `threshold`. Candidate generation is the linear-shuffle bucket join; the
    * verify step computes cosine only on survivors — the same candidates-then-verify
    * shape as MinHash LSH dedup, over embeddings instead of shingles. Recall is traded
    * via table count; precision is exact (every emitted pair passed the real cosine). */
  def embedDupPairs(vectors: DataFrame, nTables: Int, planesPerTable: Int,
                    threshold: Double): DataFrame = {
    VectorFunctions.register(vectors.sparkSession)
    val tables = lshTables(vectors, nTables, planesPerTable)
    tables.as("a").join(tables.as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_id_a"), col("b.vec_id").as("vec_id_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm"))).as("sim"))
      .filter(col("sim") >= threshold)
      .dropDuplicates("vec_id_a", "vec_id_b")
      .select(col("vec_id_a"), col("vec_id_b"))
  }
}
