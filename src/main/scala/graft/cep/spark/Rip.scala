package graft.cep.spark

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import graft.cep._

/**
 * Skew handling: RIP-style time-pane salting
 * (/root/reference/parallel/data_parallel/RIPParallelExecutionAlgorithm.py:11-70).
 *
 * A single hot key (one conversation holding a large share of the stream) would serialize
 * on one task under plain groupByKey. Here event time is sliced into panes of width
 * `paneMicros >= window`; each event is replicated to its own pane and the previous one, so
 * the task owning pane p sees every event in [p*W, (p+2)*W) — enough to build any match
 * whose first event falls in [p*W, (p+1)*W). A match is kept only by its owner pane
 * (the pane containing firstTs), mirroring the reference's owner-dedup rule
 * (/root/reference/parallel/data_parallel/RIPParallelExecutionAlgorithm.py:45-52), so each
 * match is emitted exactly once. Cost: 2x event replication; benefit: a hot key fans out
 * over ceil(timespan/W) tasks.
 *
 * Restriction (same as the reference's RIP): correct for patterns whose matches are fully
 * determined by events within `window` of firstTs — true for all bounded patterns; for
 * unbounded negation the invalidating negative is itself window-bounded
 * (/root/reference/tree/nodes/Node.py:187-193), so the 2-pane coverage still suffices.
 */
object Rip {

  final case class PaneEv(pane: Long, ev: Ev)

  def evaluateSalted(events: Dataset[Ev], patterns: Seq[Pattern], paneMicros: Long): Dataset[CepMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    val window = patterns.map(_.windowMicros).max
    require(paneMicros >= window, s"pane width $paneMicros must be >= max pattern window $window")
    require(patterns.forall(p => p.policy.single.isEmpty && p.policy.freeze.isEmpty),
      "salted evaluation requires MATCH_ANY (single/freeze policies carry cross-pane state)")
    val compiled = patterns.flatMap(Compiler.compile).toIndexedSeq
    val types = compiled.flatMap(_.relevantTypes).distinct

    events
      .filter(col("etype").isin(types: _*))
      .flatMap { e =>
        val p = Math.floorDiv(e.ts, paneMicros)
        Seq(PaneEv(p, e), PaneEv(p - 1, e))
      }
      .groupByKey(pe => (pe.ev.key, pe.pane))
      .flatMapGroups { (pk: (String, Long), it: Iterator[PaneEv]) =>
        val pane = pk._2
        val evs = it.map(_.ev).toArray
        java.util.Arrays.sort(evs, Ordering.by((e: Ev) => (e.ts, e.idx)))
        val engine = new MatchEngine(compiled)
        val out = Vector.newBuilder[CepMatch]
        evs.foreach(e => out ++= engine.feed(e))
        out ++= engine.finish()
        val lo = pane * paneMicros
        val hi = lo + paneMicros
        out.result().iterator.filter(m => m.firstTs >= lo && m.firstTs < hi)
      }
  }
}
