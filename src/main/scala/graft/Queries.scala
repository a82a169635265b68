package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cep._
import graft.cep.PStruct._
import graft.cep.spark.{BatchEvaluator, HyperCube, Rip}
import graft.io.EventsTable
import graft.ops.{Dedup, Multimodal, Similarity, TextOps}

/**
 * Driver-facing query catalog over the /root/testdata tables. Each query has a stable
 * column set (names AND types matched to its DuckDB oracle in SparkEntry.oracleSql):
 * counts as BIGINT, micros as BIGINT, exact-decimal sums cast to DOUBLE (deterministic
 * across engines because the summation is exact and only rounded once).
 */
object Queries {

  private val H = 3600L * 1000000L // one hour in micros

  // ---- CEP over the events table -----------------------------------------------------

  /** SEQ(view v, purchase b) within 6h where b.value > v.value. The condition is a typed
    * relop (not an opaque lambda) so the engine can serve it from sorted storage. */
  val seq2Pattern: Pattern = Pattern(
    SEQ(P("view", "v"), P("purchase", "b")),
    CRel.num("v", "b", RelOp.LT), 6 * H)

  /** SEQ(view, click, purchase) within 24h. */
  val seq3Pattern: Pattern = Pattern(
    SEQ(P("view", "v"), P("click", "c"), P("purchase", "b")), CTrue, 24 * H)

  /** SEQ(signup, NOT(error), purchase) within 72h. */
  val seqNotPattern: Pattern = Pattern(
    SEQ(P("signup", "s"), NOT(P("error", "e")), P("purchase", "b")), CTrue, 72 * H)

  /** AND(error, purchase) within 1h (any order). */
  val and2Pattern: Pattern = Pattern(
    AND(P("error", "e"), P("purchase", "b")), CTrue, 1 * H)

  /** SEQ(KC(click)[2..3], purchase) within 2h — powerset semantics, no SQL oracle. */
  val kleenePattern: Pattern = Pattern(
    SEQ(KC(P("click", "k"), min = 2, max = 3), P("purchase", "b")), CTrue, 2 * H)

  /** SEQ(OR(view, click) x, purchase b) within 6h — OR via pattern split
    * (/root/reference/transformation/PatternTransformer.py:64-115): one compiled pattern
    * per alternative, same id, outputs unioned. */
  val orPattern: Pattern = Pattern(
    SEQ(OR(P("view", "x"), P("click", "x")), P("purchase", "b")), CTrue, 6 * H)

  /** SEQ(view v, purchase b) with a CONTIGUOUS(v, b) consumption policy: b must be the
    * very next event after v in per-key arrival order (compiled to idx(b) == idx(v)+1,
    * /root/reference/misc/ConsumptionPolicy.py:28-44). On the events table idx is the raw
    * event_id, so contiguity means consecutive GLOBAL event ids within one user. */
  val contigPattern: Pattern = Pattern(
    SEQ(P("view", "v"), P("purchase", "b")), CTrue, 6 * H,
    policy = Policy(contiguous = List(List("v", "b"))))

  private def cepFlat(s: SparkSession, dir: String, p: Pattern, sorted: Boolean,
                      cols: (String, String)*): DataFrame = {
    val ms = BatchEvaluator.evaluate(EventsTable.load(s, dir), Seq(p), sortedStorage = sorted)
    val flat = BatchEvaluator.flat(ms, p)
    flat.select(col("key").cast("long").as("user_id") +: cols.map { case (f, t) => col(f).as(t) }: _*)
  }

  def cepSeq2(s: SparkSession, dir: String): DataFrame =
    cepFlat(s, dir, seq2Pattern, sorted = false, "v_idx" -> "v_id", "b_idx" -> "b_id")

  /** Same result as cepSeq2 but probing through the sorted-storage access path — shares
    * seq2's oracle, so the driver independently validates the sorted probes
    * (output-invariance is the contract, /root/reference/tree/PatternMatchStorage.py:144-283). */
  def cepSortedSeq2(s: SparkSession, dir: String): DataFrame =
    cepFlat(s, dir, seq2Pattern, sorted = true, "v_idx" -> "v_id", "b_idx" -> "b_id")

  def cepSeq3(s: SparkSession, dir: String): DataFrame =
    cepFlat(s, dir, seq3Pattern, sorted = false, "v_idx" -> "v_id", "c_idx" -> "c_id", "b_idx" -> "b_id")

  def cepSeqNot(s: SparkSession, dir: String): DataFrame =
    cepFlat(s, dir, seqNotPattern, sorted = false, "s_idx" -> "s_id", "b_idx" -> "b_id")

  def cepAnd2(s: SparkSession, dir: String): DataFrame =
    cepFlat(s, dir, and2Pattern, sorted = false, "e_idx" -> "e_id", "b_idx" -> "b_id")

  def cepOr(s: SparkSession, dir: String): DataFrame =
    cepFlat(s, dir, orPattern, sorted = false, "x_idx" -> "x_id", "b_idx" -> "b_id")

  def cepContig(s: SparkSession, dir: String): DataFrame =
    cepFlat(s, dir, contigPattern, sorted = false, "v_idx" -> "v_id", "b_idx" -> "b_id")

  /** SEQ(signup s, purchase b) WITHIN 72h under MATCH_SINGLE on signup
    * (/root/reference/misc/ConsumptionPolicy.py:76-88, registered at the tree root,
    * /root/reference/tree/Tree.py:35-37): each signup participates in at most ONE emitted
    * match, consumed greedily in feed order — so a signup pairs with exactly its FIRST
    * purchase within the window (when that purchase arrives, every stored unused signup
    * emits with it and is marked used; purchases are NOT single-listed and stay
    * reusable). Per-key (user_id, ts) pairs are unique in the events table at every SF,
    * so feed order is strict ts order and the greedy assignment is SQL-replayable: a
    * row_number over each signup's qualifying purchases ordered by ts, keeping rank 1. */
  val singlePattern: Pattern = Pattern(
    SEQ(P("signup", "s"), P("purchase", "b")), CTrue, 72 * H,
    policy = Policy(single = Set("signup")))

  def cepSingle(s: SparkSession, dir: String): DataFrame =
    cepFlat(s, dir, singlePattern, sorted = false, "s_idx" -> "s_id", "b_idx" -> "b_id")

  /** SEQ(KC(click)[2..3], purchase) WITHIN 6h with a KC INDEX condition: adjacent clicks
    * of the closure (feed order) must have strictly ascending value — CKCIndex with
    * useOffset=true, offset=1 (/root/reference/condition/KCCondition.py:52-152). The
    * oracle extends cep_kleene's subset enumeration with the adjacent-value conditions
    * (6h window: at 2h the ascending-value cut leaves zero rows at sf0.01 — a vacuous
    * green; 6h yields rows at every SF while the subset space stays small). */
  val kcCondPattern: Pattern = Pattern(
    SEQ(KC(P("click", "k"), min = 2, max = 3), P("purchase", "b")),
    CKCIndex("k", _.num, _ < _, useOffset = true, offset = 1), 6 * H)

  def cepKcCond(s: SparkSession, dir: String): DataFrame = {
    val ms = BatchEvaluator.evaluate(EventsTable.load(s, dir), Seq(kcCondPattern))
    BatchEvaluator.flat(ms, kcCondPattern)
      .select(col("key").cast("long").as("user_id"),
        array_join(col("k_idxs").cast("array<string>"), ",").as("k_ids"),
        col("b_idx").as("b_id"))
  }

  def cepKleene(s: SparkSession, dir: String): DataFrame = {
    val ms = BatchEvaluator.evaluate(EventsTable.load(s, dir), Seq(kleenePattern))
    // k_ids is scalar-encoded (comma-joined, feed order) so the driver's row hasher can
    // sort it; the DuckDB oracle enumerates size-2/3 subsets with the same encoding.
    BatchEvaluator.flat(ms, kleenePattern)
      .select(col("key").cast("long").as("user_id"),
        array_join(col("k_idxs").cast("array<string>"), ",").as("k_ids"),
        col("b_idx").as("b_id"))
  }

  /** Same result as cepSeq3 but through the RIP-salted path — shares seq3's oracle, so the
    * driver independently validates the skew path. */
  def cepSaltedSeq3(s: SparkSession, dir: String): DataFrame = {
    val ms = Rip.evaluateSalted(EventsTable.load(s, dir), Seq(seq3Pattern), paneMicros = 24 * H)
    BatchEvaluator.flat(ms, seq3Pattern)
      .select(col("key").cast("long").as("user_id"),
        col("v_idx").as("v_id"), col("c_idx").as("c_id"), col("b_idx").as("b_id"))
  }

  /** Same result through the auto hot-key router — shares seq3's oracle. Threshold 80
    * sits inside the per-key event-count distribution at every test SF (events max ~86-99
    * per key, median ~66), so the router genuinely SPLITS: a handful of keys go salted,
    * the majority cold (sf0.001: 1/15 hot, sf0.01: 9/150, sf0.1: 83/1500). The round-4
    * threshold of 50 flagged ~99% of keys "hot" — a 1478-literal per-row isin that cost
    * 2.9x salted's wall while exercising no split at all. */
  def cepAutoSeq3(s: SparkSession, dir: String): DataFrame = {
    val ms = Rip.evaluateAuto(EventsTable.load(s, dir), Seq(seq3Pattern),
      paneMicros = 24 * H, hotThreshold = 80L)
    BatchEvaluator.flat(ms, seq3Pattern)
      .select(col("key").cast("long").as("user_id"),
        col("v_idx").as("v_id"), col("c_idx").as("c_id"), col("b_idx").as("b_id"))
  }

  /** Same result as cepAnd2 but through the HYPERCUBE partitioner — the execution path
    * for patterns with no usable partition key: here the user id's hash doubles as the
    * cube attribute for both mapped types and a key-equality condition scopes matches
    * back to one user, so the query shares and2's oracle and the driver independently
    * validates face-union routing + min-cell owner dedup
    * (/root/reference/parallel/data_parallel/HyperCubeParallelExecutionAlgorithm.py:54-113). */
  def cepHyperAnd2(s: SparkSession, dir: String): DataFrame = {
    val keyed = and2Pattern.copy(condition = CBinary("e", "b", (x, y) => x.key == y.key))
    val keyHash: Ev => Long = e => e.key.hashCode.toLong & 0x7fffffffL
    val ms = HyperCube.evaluate(EventsTable.load(s, dir), Seq(keyed),
      attributes = Map("error" -> Seq(keyHash), "purchase" -> Seq(keyHash)), units = 32)
    BatchEvaluator.flat(ms, keyed)
      .select(col("key").cast("long").as("user_id"),
        col("e_idx").as("e_id"), col("b_idx").as("b_id"))
  }

  /** seq3 with an N-ARY lambda condition (CSimple over three names: v.value + c.value <
    * b.value) — the reference's n-ary SimpleCondition surface
    * (/root/reference/condition/Condition.py:189-226), driver-oracled: the sum and
    * comparison are single double ops, bit-identical in SQL. */
  val naryPattern: Pattern = Pattern(
    SEQ(P("view", "v"), P("click", "c"), P("purchase", "b")),
    CSimple(List("v", "c", "b"),
      m => m("v").head.num + m("c").head.num < m("b").head.num), 24 * H)

  def cepNary(s: SparkSession, dir: String): DataFrame =
    cepFlat(s, dir, naryPattern, sorted = false,
      "v_idx" -> "v_id", "c_idx" -> "c_id", "b_idx" -> "b_id")

  /** SEQ(signup, NOT(error), NOT(click), purchase) WITHIN 12h — TWO bounded negatives, so
    * the negative-stack ORDER is non-trivial: compiled under [[Orders.NegStatistic]] with
    * rates that REVERSE pattern order (click declared frequent, error rare -> click checked
    * first), the driver's oracle independently proves the statistic stack output-invariant
    * (/root/reference/plan/negation/StatisticNegationAlgorithm.py:10-25). */
  val statNotPattern: Pattern = Pattern(
    SEQ(P("signup", "s"), NOT(P("error", "e")), NOT(P("click", "k")), P("purchase", "b")),
    CTrue, 12 * H)

  def cepStatNot(s: SparkSession, dir: String): DataFrame = {
    val compiled = Compiler.compile(statNotPattern, Orders.Trivial,
      Orders.NegStatistic(Map("click" -> 100.0, "error" -> 1.0)))
    val ms = BatchEvaluator.evaluateCompiled(EventsTable.load(s, dir), compiled)
    BatchEvaluator.flat(ms, statNotPattern)
      .select(col("key").cast("long").as("user_id"),
        col("s_idx").as("s_id"), col("b_idx").as("b_id"))
  }

  private val seq3Pw = Map("view" -> 40.0, "click" -> 40.0, "purchase" -> 5.0)

  /** cep_seq3 under a ZStreamOrd BUSHY plan (interval DP over the greedy leaf order) —
    * shares seq3's oracle, so the driver independently validates tree-shaped
    * (non-left-deep) plans on real data. */
  def cepZstreamSeq3(s: SparkSession, dir: String): DataFrame = {
    val compiled = Compiler.compile(seq3Pattern, Orders.ZStream(seq3Pw, greedyOrder = true))
    val ms = BatchEvaluator.evaluateCompiled(EventsTable.load(s, dir), compiled)
    BatchEvaluator.flat(ms, seq3Pattern)
      .select(col("key").cast("long").as("user_id"),
        col("v_idx").as("v_id"), col("c_idx").as("c_id"), col("b_idx").as("b_id"))
  }

  /** cep_seq3 under an ITERATIVE-IMPROVEMENT order (seeded swap hill-climb from the
    * greedy order) — shares seq3's oracle. */
  def cepIiSeq3(s: SparkSession, dir: String): DataFrame = {
    val compiled = Compiler.compile(seq3Pattern,
      Orders.IterativeImprovement(seq3Pw, stepLimit = 100, seed = 3L))
    val ms = BatchEvaluator.evaluateCompiled(EventsTable.load(s, dir), compiled)
    BatchEvaluator.flat(ms, seq3Pattern)
      .select(col("key").cast("long").as("user_id"),
        col("v_idx").as("v_id"), col("c_idx").as("c_id"), col("b_idx").as("b_id"))
  }

  /** SEQ(view v, click c) WITHIN 24h evaluated JOINTLY with seq3 under local-search
    * MERGED plans ([[graft.cep.MultiPlan.localSearch]]): purchase is rare, so each
    * pattern's individual optimum starts from it and never brackets (view, click) — only
    * the sharing-aware search does, and the merged (v, c) subtree then buffers once for
    * both patterns. Output = the 2-step pattern's matches (plans are output-invariant, so
    * the simple SQL join oracles the whole merged-evaluation machinery). */
  def cepMergedVc2(s: SparkSession, dir: String): DataFrame = {
    val vc2 = Pattern(SEQ(P("view", "v"), P("click", "c")), CTrue, 24 * H, id = 1)
    val pats = Seq(seq3Pattern.copy(id = 0), vc2)
    val pw = Map("view" -> 40.0, "click" -> 40.0, "purchase" -> 5.0)
    val strategies = MultiPlan.localSearch(pats, pw)
    val compiled = pats.zip(strategies)
      .flatMap { case (p, st) => Compiler.compile(p, st) }.toIndexedSeq
    val ms = BatchEvaluator.evaluateCompiled(EventsTable.load(s, dir), compiled)
      .filter(col("patternId") === 1)
    BatchEvaluator.flat(ms, vc2)
      .select(col("key").cast("long").as("user_id"),
        col("v_idx").as("v_id"), col("c_idx").as("c_id"))
  }

  // ---- relational / window engine smoke ----------------------------------------------

  def q1Agg(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)"))
          .cast("double").as("sum_disc"),
        count(lit(1)).as("n"))

  /** Orders x customer x nation with broadcast dimensions (the 100 TB shape: fact-side
    * shuffle avoided entirely; dims broadcast). */
  def qJoinNation(s: SparkSession, dir: String): DataFrame = {
    val orders = s.read.parquet(s"$dir/orders.parquet")
    val customer = broadcast(s.read.parquet(s"$dir/customer.parquet"))
    val nation = broadcast(s.read.parquet(s"$dir/nation.parquet"))
    orders.join(customer, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  def qTopkParts(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_partkey")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)"))
        .cast("double").as("revenue"), count(lit(1)).as("n"))
      .orderBy(col("revenue").desc, col("l_partkey"))
      .limit(5)

  def qWindowDay(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")
      .groupBy(col("event_type"), window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("event_type"), unix_micros(col("w.start").cast("timestamp")).as("day_start"),
        col("n_events"), col("sum_value"))

  def qSession(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("w.start").cast("timestamp")).as("session_start"),
        col("n_events"))

  // ---- training-data pipeline ops ------------------------------------------------------

  def dedupExact(s: SparkSession, dir: String): DataFrame = Dedup.exact(s, dir)
  // dfMax opted-in explicitly: the cap bounds recall (pairs overlapping only in
  // corpus-frequent grams are dropped) and the DuckDB oracle mirrors exactly this value
  def ngramPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(s, dir, dfMax = 50)
  def minhashPairs(s: SparkSession, dir: String): DataFrame = Dedup.minhashLshPairs(s, dir)
  // connected components over the verified minhash pairs: (doc_id, cluster_id = min
  // reachable doc_id) — the dedup pipeline's final grouping step
  def dupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicateClusters(Dedup.minhashLshPairs(s, dir))
  def simhashPairs(s: SparkSession, dir: String): DataFrame = Dedup.simhashPairs(s, dir)
  def tokenCount(s: SparkSession, dir: String): DataFrame = TextOps.tokenCount(s, dir)
  def quality(s: SparkSession, dir: String): DataFrame = TextOps.qualityScore(s, dir)
  def langId(s: SparkSession, dir: String): DataFrame = TextOps.langId(s, dir)
  def fingerprint(s: SparkSession, dir: String): DataFrame = TextOps.fingerprint(s, dir)
  def cosineTop1(s: SparkSession, dir: String): DataFrame = Similarity.bruteTop1(s, dir)
  def cosineLsh(s: SparkSession, dir: String): DataFrame = Similarity.lshTop1(s, dir)
  // IVF coarse-quantizer ANN (k-medians training, probe-2 search) — the second named
  // scale path beside LSH; k-medians keeps the centroids order-free-deterministic so the
  // DuckDB oracle replicates training bit-for-bit
  def cosineIvf(s: SparkSession, dir: String): DataFrame = Similarity.ivfTop1(s, dir)
  // threshold 0.35 = the top ~0.1% of pairwise cosines on the synthetic embeddings
  // (which contain no true near-dups — max pairwise cosine ~0.51); the oracle
  // replicates the sketch bit-for-bit so the cut is exact, not recall-bounded
  def embedDup(s: SparkSession, dir: String): DataFrame = Similarity.embedDup(s, dir)
  def mediaMeta(s: SparkSession, dir: String): DataFrame = Multimodal.mediaMeta(s, dir)
  // metadata summary (features are dropped from this query's contract anyway, so the
  // decode path is never invoked — see Multimodal.mediaSummary)
  def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaSummary(Multimodal.mediaTable(s, dir))
      .withColumn("frames", org.apache.spark.sql.functions.col("frames").cast("long"))
  def frameSample(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.mediaTable(s, dir))
}
