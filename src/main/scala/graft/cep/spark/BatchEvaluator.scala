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

  /** Evaluate patterns over a typed event dataset. The relevant-type filter is applied as a
    * Catalyst predicate BEFORE the shuffle so it reaches the parquet scan (pushdown); the
    * per-key group is sorted by (ts, idx) and fed through the incremental engine.
    * `sortedStorage` enables binary-searched relop probes (output-invariant; off = the
    * reference's default full-scan probe, /root/reference/misc/DefaultConfig.py:34). */
  def evaluate(events: Dataset[Ev], patterns: Seq[Pattern],
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
