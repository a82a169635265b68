package graft.cep

/**
 * Adaptive replanning — the Spark-shaped port of the reference's trivial tree-swap
 * mechanism (/root/reference/tree/evaluation/TrivialTreeBasedEvaluationMechnism.py:15-57)
 * and deviation-aware optimizer trigger
 * (/root/reference/adaptive/optimizer/Optimizer.py:110-133).
 *
 * The reference swaps evaluation trees mid-run inside one process. In Spark the natural
 * swap point is a micro-batch / query (re)start: the driver observes fresh statistics
 * (graft.cep.spark.Stats), decides via [[DeviationAwareSelector]] whether the plan has
 * drifted, compiles a new join order (graft.cep.Orders), and restarts the query. Per-key
 * state written under the OLD plan is detected by its plan-shape fingerprint and migrated
 * exactly like the reference: the events still buffered at LEAF storage are replayed
 * through a fresh engine for the new plan, and matches produced during replay are
 * discarded (they were already reported before the swap). Partial matches whose leaf
 * events have expired are dropped — the same information the reference's swap preserves,
 * no more (`__get_all_old_events` reads leaf storage only).
 */
object Adaptive {

  /** Combined fingerprint of a compiled multi-pattern plan. */
  def fingerprint(compiled: IndexedSeq[CompiledPattern]): Int =
    compiled.map(_.shapeFingerprint).hashCode()

  /** Single-event (leaf-storage) events recoverable from a serialized engine state,
    * WITHOUT the old compiled plan: leaf buffers are exactly the single-bind,
    * single-event, non-aggregate partial matches. Deduplicated (the same event sits in
    * every leaf of its type across patterns) and replay-ordered by (ts, idx). */
  def leafEventsOf(s: EngineState): Seq[Ev] =
    s.runtimes.iterator
      .flatMap(_.bufs.iterator.flatten)
      .filter(pm => pm.binds.length == 1 && !pm.binds.head.isKC &&
        pm.binds.head.evs.lengthCompare(1) == 0)
      .map(_.binds.head.evs.head)
      .toSeq.distinctBy(e => (e.key, e.idx, e.etype))
      .sortBy(e => (e.ts, e.idx))

  /** Build an engine for `newCompiled` carrying over an old engine state produced under a
    * DIFFERENT plan: replay the old leaf events, discard replay emissions (already
    * reported). Policies are rejected — replay bypasses freeze admission and would
    * double-consume single/next budgets, mirroring the reorder restriction. */
  def migrate(oldState: EngineState, newCompiled: IndexedSeq[CompiledPattern]): MatchEngine = {
    require(newCompiled.forall(cp => cp.singleAt.isEmpty && cp.freezeMap.isEmpty),
      "plan migration requires MATCH_ANY (policies carry emission-order state)")
    val eng = new MatchEngine(newCompiled)
    leafEventsOf(oldState).foreach(eng.feed(_)) // discard: pre-swap matches were emitted
    eng
  }

  /** Invariant-aware replan trigger (reference InvariantsAwareOptimizer,
    * /root/reference/adaptive/optimizer/Optimizer.py:110-133, invariants from
    * /root/reference/plan/invariant/Invariants.py:39-70): where [[DeviationAwareSelector]]
    * fires on ANY sufficient statistic drift, this fires only when fresh statistics
    * VIOLATE an invariant of the current greedy plan — i.e. some step's runner-up now
    * beats the step's choice. Drift that provably cannot change the greedy choice
    * sequence (however large) triggers no rebuild; a tiny drift that flips a choice
    * does. Use with the swap machinery exactly like DeviationAwareSelector: when
    * [[shouldReplan]] fires, restart the query with [[build]]'s fresh order (the
    * in-flight SIMULTANEOUS swap or leaf-replay migration applies unchanged). */
  final class InvariantAwareOptimizer(posArgs: List[PStruct]) extends Serializable {
    private var inv: Orders.GreedyInvariants = _
    private var order: IndexedSeq[Int] = _
    def currentOrder: Option[IndexedSeq[Int]] = Option(order)
    /** (Re)build the greedy order under fresh statistics, refreshing the invariants. */
    def build(perWindowByType: Map[String, Double],
              selByNames: Map[(String, String), Double] = Map.empty): IndexedSeq[Int] = {
      val (o, i) = Orders.greedyWithInvariants(posArgs, perWindowByType, selByNames)
      order = o; inv = i; o
    }
    /** True when no plan exists yet or the stored invariants are violated under the new
      * statistics (reference Optimizer.should_optimize, Optimizer.py:120-121). */
    def shouldReplan(perWindowByType: Map[String, Double],
                     selByNames: Map[(String, String), Double] = Map.empty): Boolean =
      inv == null || inv.violated(posArgs, perWindowByType, selByNames)
  }

  /** Bushy variant of [[InvariantAwareOptimizer]]: the plan is a ZStream BRACKETING and
    * the invariants are per-subtree cost inequalities against each interval's runner-up
    * split (reference InvariantAwareZStreamTreeBuilder,
    * /root/reference/plan/invariant/InvariantBushyTreeBuilder.py:15-107, checked by
    * ZStreamTreeInvariants, /root/reference/plan/invariant/Invariants.py:73-90, under
    * InvariantsAwareOptimizer.should_optimize, Optimizer.py:120-121). Use the returned
    * tree via `Orders.FixedTree` / `Compiler.compile`; the swap machinery applies
    * unchanged when [[shouldReplan]] fires. */
  final class InvariantAwareZStreamOptimizer(posArgs: List[PStruct],
                                             greedyOrder: Boolean = false) extends Serializable {
    private var inv: Orders.ZStreamInvariants = _
    private var tree: Orders.JTree = _
    def currentTree: Option[Orders.JTree] = Option(tree)
    /** (Re)build the ZStream bracketing under fresh statistics, refreshing invariants. */
    def build(perWindowByType: Map[String, Double],
              selByNames: Map[(String, String), Double] = Map.empty): Orders.JTree = {
      val (t, i) = Orders.zstreamWithInvariants(posArgs, perWindowByType, selByNames, greedyOrder)
      tree = t; inv = i; t
    }
    /** True when no plan exists yet or some recorded subtree now costs more than its
      * interval's runner-up bracketing under the new statistics. */
    def shouldReplan(perWindowByType: Map[String, Double],
                     selByNames: Map[(String, String), Double] = Map.empty): Boolean =
      inv == null || inv.violated(posArgs, perWindowByType, selByNames)
  }

  /** Replan trigger (reference StatisticsDeviationAwareOptimizer): fire when any tracked
    * statistic drifts more than `threshold` (relative) from the value at the last plan
    * build. Driver-side, cheap, deterministic. */
  final class DeviationAwareSelector(threshold: Double) extends Serializable {
    private var prev: Map[String, Double] = _
    def shouldReplan(stats: Map[String, Double]): Boolean = {
      val fire = prev == null || stats.exists { case (k, v) =>
        val p = prev.getOrElse(k, v)
        math.abs(v - p) > threshold * math.max(1e-12, math.abs(p))
      }
      if (fire) prev = stats
      fire
    }
  }
}
