package graft.cep.spark

import org.apache.spark.sql.{Dataset, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cep._

/**
 * Batch CEP evaluation: the Spark-native replacement for the reference's single-threaded
 * event loop (/root/reference/tree/evaluation/TreeBasedEvaluationMechanism.py:68-106) +
 * GroupByKey thread parallelism
 * (/root/reference/parallel/data_parallel/GroupByKeyParallelExecutionAlgorithm.py:10-48).
 *
 * Plan shape: parquet scan -> Catalyst type/leaf-predicate filter (pushed to the scan) ->
 * shuffle on `key` (the ONLY shuffle) -> per-key sorted NFA advance -> matches. Scales by
 * key cardinality; hot keys go through [[Rip.evaluateSalted]] instead.
 */
object BatchEvaluator {

  /** Column order [[rowToEv]] expects; callers shuffling rows must select exactly this. */
  private[spark] val EvCols = Seq("key", "idx", "etype", "ts", "num", "s1", "s2", "prob")

  private[spark] def rowToEv(r: org.apache.spark.sql.Row): Ev =
    Ev(r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4),
      r.getString(5), r.getString(6), r.getDouble(7))

  /** Event-type column as a small int DISPATCH CODE over the pattern set's relevant types
    * (guide §2.3, narrower types): an UnsafeRow string field costs 8 B offset/len plus the
    * padded bytes (16-24 B for typical type names) on every shuffled + sorted row, where
    * the int code costs its fixed 8 B slot. Decoding maps the code back to ONE canonical
    * String instance per type ([[rowToEvCoded]]), so the engine's per-event dispatch
    * lookup hits identity-equal keys with cached hashCodes instead of allocating a fresh
    * String per row. The relevant-type filter runs before this projection, so every row
    * matches exactly one code. */
  private[spark] def etypeCode(types: Array[String]): org.apache.spark.sql.Column =
    types.zipWithIndex.foldLeft(lit(-1)) { case (acc, (t, i)) =>
      when(col("etype") === t, lit(i)).otherwise(acc)
    }

  private[spark] def rowToEvCoded(r: org.apache.spark.sql.Row, types: Array[String]): Ev =
    Ev(r.getString(0), r.getLong(1), types(r.getInt(2)), r.getLong(3), r.getDouble(4),
      r.getString(5), r.getString(6), r.getDouble(7))

  /** Evaluate patterns over a typed event dataset. The relevant-type filter is applied as a
    * Catalyst predicate BEFORE the shuffle so it reaches the parquet scan (pushdown).
    *
    * The shuffle + ordering stay ROW-based end to end: `repartition(key)` hash-co-locates
    * each conversation without the map-side object materialization `groupByKey(_.key)`
    * pays (AppendColumns deserializes every Ev — text payload included — just to read one
    * field), and `sortWithinPartitions(key, ts, idx)` hands the work to Tungsten's
    * UnsafeRow sort instead of a per-group `Arrays.sort` over freshly allocated objects.
    * Events materialize exactly once, on the reduce side, streaming straight into the
    * engine at key boundaries — no per-group array.
    *
    * `sortedStorage` enables binary-searched relop probes (output-invariant; off = the
    * reference's default full-scan probe, /root/reference/misc/DefaultConfig.py:34). */
  def evaluate(events: Dataset[Ev], patterns: Seq[Pattern],
               sortedStorage: Boolean = false): Dataset[CepMatch] =
    evaluateCompiled(events, patterns.flatMap(Compiler.compile).toIndexedSeq, sortedStorage)

  /** Same plan over pre-compiled patterns — the entry point for per-pattern join-order
    * strategies (e.g. [[graft.cep.MultiPlan.localSearch]]'s merged plans). */
  def evaluateCompiled(events: Dataset[Ev], compiled: IndexedSeq[CompiledPattern],
                       sortedStorage: Boolean = false): Dataset[CepMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    val types = compiled.flatMap(_.relevantTypes).distinct
    val typeArr = types.toArray
    events
      .filter(col("etype").isin(types: _*))
      .toDF()
      .select(col("key"), col("idx"), etypeCode(typeArr).as("etype"), col("ts"),
        col("num"), col("s1"), col("s2"), col("prob"), xxhash64(col("key")).as("khash"))
      .repartition(col("key"))
      // Leading with the key's 64-bit hash makes the sort's 8-byte prefix comparison
      // decisive for (almost) every cross-key pair — the raw conv-id strings share long
      // literal prefixes, which would force full UTF8String compares. `key` stays in the
      // order to break hash collisions deterministically; grouping only needs key
      // contiguity, not lexicographic key order.
      .sortWithinPartitions("khash", "key", "ts", "idx")
      .mapPartitions { rows =>
        new Iterator[CepMatch] {
          private var curKey: String = null
          private var engine: MatchEngine = null
          private val buf = scala.collection.mutable.Queue.empty[CepMatch]
          private val sink = (m: CepMatch) => { buf += m; () }
          private def refill(): Unit = {
            while (buf.isEmpty && rows.hasNext) {
              val r = rows.next()
              val k = r.getString(0)
              if (k != curKey) {
                if (engine != null) buf ++= engine.finish()
                curKey = k
                engine = new MatchEngine(compiled, sortedStorage = sortedStorage)
              }
              engine.feedEach(rowToEvCoded(r, typeArr))(sink)
            }
            if (buf.isEmpty && engine != null) { buf ++= engine.finish(); engine = null }
          }
          def hasNext: Boolean = { refill(); buf.nonEmpty }
          def next(): CepMatch = { refill(); buf.dequeue() }
        }
      }
  }

  /** The original typed-Dataset formulation (`groupByKey(_.key).flatMapGroups`), kept as
    * the semantic specification the row-based plan above is tested against. */
  private[spark] def evaluateTyped(events: Dataset[Ev], patterns: Seq[Pattern],
                                   sortedStorage: Boolean = false): Dataset[CepMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    val compiled = patterns.flatMap(Compiler.compile).toIndexedSeq
    val types = compiled.flatMap(_.relevantTypes).distinct
    events
      .filter(col("etype").isin(types: _*))
      .groupByKey(_.key)
      .flatMapGroups { (_, it) =>
        val evs = it.toArray
        java.util.Arrays.sort(evs, Ordering.by((e: Ev) => (e.ts, e.idx)))
        val engine = new MatchEngine(compiled, sortedStorage = sortedStorage)
        val out = Vector.newBuilder[CepMatch]
        evs.foreach(e => out ++= engine.feed(e))
        out ++= engine.finish()
        out.result().iterator
      }
  }

  /** Flatten matches to a stable-schema DataFrame: one row per match with a `<name>_idx`
    * column per bound slot (KC slots emit the array `<name>_idxs`). Column order follows
    * pattern position; names are deterministic, so results are oracle-comparable. */
  def flat(ms: Dataset[CepMatch], pattern: Pattern): DataFrame = {
    val cp = Compiler.compile(pattern).head
    var df = ms.toDF()
    outputSlots(cp.root).zipWithIndex.foreach { case ((slot, isKc), i) =>
      val name = cp.nameBySlot(slot)
      val evs = element_at(col("binds"), i + 1).getField("evs")
      df =
        if (isKc) df.withColumn(s"${name}_idxs", evs.getField("idx"))
        else df.withColumn(s"${name}_idx", element_at(evs, 1).getField("idx"))
    }
    df.drop("binds")
  }

  /** Slots present in emitted match binds, in slot order, with KC-ness. Negative slots never
    * appear in output; a KC subtree collapses to its bind slot. */
  private def outputSlots(s: Spec): List[(Int, Boolean)] = s match {
    case l: LeafSpec => List((l.slot, false))
    case b: BinSpec  => (outputSlots(b.left) ++ outputSlots(b.right)).sortBy(_._1)
    case k: KCSpec   => List((k.bindSlot, true))
    case n: NegSpec  => outputSlots(n.pos)
  }
}
