package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  /** Top-1 per vec_id from a (vec_id, nn_id, sim) candidate frame, ties to the lower
    * nn_id — as a HASH AGGREGATE, not a window: the native `nn_top1` argmax
    * ([[org.apache.spark.sql.graftfn.NnTop1Agg]]) picks exactly what the old
    * `row_number over (order by sim desc, nn_id)` picked. The win is partial
    * aggregation: a window sort must SHUFFLE every candidate pair (O(n²) rows for the
    * brute path) to sort each vec_id's partition, while the map-side combine here
    * reduces each producing task to one 17-byte buffer per vec_id before anything hits
    * the wire — the pair stream is consumed inside the stage that generates it, and the
    * exchange carries ≤ n rows per task. (A `min(struct(-sim, nn_id))` spelling has the
    * same semantics but a struct buffer forces the SortAggregate fallback, whose partial
    * pass sorts — i.e. materializes — each task's pair block; the imperative aggregate
    * keeps the partial side hash-based under ObjectHashAggregateExec.) */
  private def top1(sims: DataFrame): DataFrame =
    sims.groupBy("vec_id")
      .agg(call_function("nn_top1", col("sim"), col("nn_id")).as("nn_id"))

  def bruteTop1(spark: SparkSession, sfDir: String): DataFrame =
    bruteTop1(emb(spark, sfDir))

  /** Exact cosine top-1 neighbor per vector (input: vec_id, v: array<double>).
    * Ties broken by neighbor id (deterministic). The O(n²) pair stream is generated and
    * consumed inside one codegen stage ([[top1]]'s map-side combine) — nothing quadratic
    * is ever shuffled; at 100 TB the remaining cost is the broadcast of the probe side,
    * which you chunk into query blocks (B sequential corpus scans, each linear). */
  def bruteTop1(vectors: DataFrame): DataFrame = {
    VectorFunctions.register(vectors.sparkSession)
    val e = withNorm(vectors)
    val sims = e.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_id"),
        col("b.vec_id").as("nn_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm"))).as("sim"))
    top1(sims)
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
      // both consumers self-join this frame: cache so the norm + nTables*planesPerTable
      // plane projections run once, not once per join side
      .cache()
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
    // no dropDuplicates: a pair found in several tables recomputes the SAME sim from the
    // same operands, and duplicate candidates are absorbed by top1's min aggregate — the
    // dedup exchange the old window path needed is a shuffle this plan never pays
    top1(cands)
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path alongside [[lshTop1]]:
    * k-MEDIANS training (per-dimension exact medians — order-free, so the centroids are
    * bit-deterministic and DuckDB-replicable, unlike float sums whose value depends on
    * accumulation order), then each query probes only its `nProbe` nearest clusters and
    * ranks candidates by exact cosine. Centroid init = the first `k` vectors by vec_id
    * (the classic train-on-a-deterministic-sample shape).
    *
    * 100 TB notes: training runs on a bounded sample in production (the per-(cluster,dim)
    * EXACT median here keeps the oracle bit-exact; `approx_percentile` is the scale knob);
    * the search is a linear-shuffle equi-join on cluster id — candidates ≈ nProbe/k of the
    * corpus per query vs the full n of [[bruteTop1]] — with the same
    * candidates-then-exact-verify shape as the LSH paths. Assignment and probe selection
    * are one codegen'd projection (distances via the native dot_product against literal
    * centroid vectors; argmin = array_sort over (dist, k) structs, ties to the lower k). */
  def ivfTop1(spark: SparkSession, sfDir: String, k: Int = 8, iters: Int = 2,
              nProbe: Int = 2): DataFrame =
    ivfTop1(emb(spark, sfDir), k, iters, nProbe)

  def ivfTop1(vectors: DataFrame, k: Int, iters: Int, nProbe: Int): DataFrame = {
    val spark = vectors.sparkSession
    VectorFunctions.register(spark)
    import spark.implicits._
    // One materialization instead of 2+2*iters scans: the seed collect, each training
    // round's assignment pass, the inverted file and the probe projection all re-read
    // this frame (at production scale training runs on a bounded sample — see scaladoc —
    // so the cached frame is the sample, not the corpus).
    val e = vectors.select(col("vec_id"), col("v")).cache()

    /** Add `srt`: (dist, k) structs sorted ascending. dist = |c|^2 - 2<v,c> (the common
      * |v|^2 term cannot change the per-row ranking and is dropped on both engines). */
    def withDists(df: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
      val structs = centroids.zipWithIndex.map { case (c, ki) =>
        var c2 = 0.0
        var i = 0
        while (i < c.length) { c2 += c(i) * c(i); i += 1 } // left-to-right, = list_dot_product
        struct((lit(c2) - lit(2.0) * dot(col("v"), typedLit(c.toSeq))).as("dist"),
          lit(ki).as("k"))
      }
      df.withColumn("srt", array_sort(array(structs.toSeq: _*)))
    }
    def assigned(centroids: Array[Array[Double]]): DataFrame =
      withDists(e, centroids)
        .withColumn("cl", element_at(col("srt"), 1).getField("k"))
        .drop("srt")

    // Seed = the k lowest vec_ids, ORDER FIXED ON THE DRIVER: collecting (vec_id, v) and
    // sorting here (instead of trusting orderBy.limit.collect's row order) removes the
    // implicit dependency on TakeOrderedAndProject preserving sort order in its collect —
    // centroid index k must match the oracle's row_number ranking bit-for-bit.
    var centroids: Array[Array[Double]] = e.orderBy("vec_id").limit(k)
      .select(col("vec_id"), col("v")).as[(Long, Seq[Double])].collect()
      .sortBy(_._1).map(_._2.toArray)
    (1 to iters).foreach { _ =>
      // per-(cluster, dimension) exact median, spelled out as (s[(n+1) div 2] +
      // s[n div 2 + 1]) / 2 over the sorted values — the one formula both engines
      // compute bit-identically (built-in percentile/median interpolation internals
      // differ across engines); empty clusters keep their previous centroid
      val med = assigned(centroids)
        .select(col("cl"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("cl", "d")
        .agg(sort_array(collect_list(col("x"))).as("s"), count(lit(1)).as("n"))
        .selectExpr("cl", "d",
          "(element_at(s, cast((n + 1) div 2 as int)) + element_at(s, cast(n div 2 + 1 as int))) / 2.0 as m")
        .collect()
      val next = centroids.map(_.clone)
      med.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      centroids = next
    }

    // ONE distance projection for the search stage: the inverted file (argmin cluster)
    // and the probe list (top-nProbe clusters) both read the same sorted (dist, k)
    // array, so deriving them from one cached frame halves the 8x64-literal centroid
    // expression tree (the plan's dominant analysis/codegen cost at small SF) and runs
    // the per-row distance arithmetic once instead of once per join side — the join's
    // broadcast build side cannot reuse the probe side's exchange (same reason the
    // dedup signature frames are cached).
    val searched = withDists(withNorm(e), centroids)
      .select(col("vec_id"), col("v"), col("norm"),
        element_at(col("srt"), 1).getField("k").as("cl"),
        transform(slice(col("srt"), 1, nProbe), s => s.getField("k")).as("pks"))
      .cache()
    val inv = searched.select(col("vec_id"), col("v"), col("norm"), col("cl"))
    val probes = searched.select(col("vec_id"), col("v"), col("norm"),
      explode(col("pks")).as("pk"))
    val sims = probes.as("a").join(inv.as("b"),
        col("a.pk") === col("b.cl") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nn_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm"))).as("sim"))
    top1(sims)
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
