package graft.cep

/**
 * Static cost-based left-deep join ordering over a pattern's top-level positive args —
 * the Spark-side analogue of the reference's plan builders
 * (/root/reference/plan/LeftDeepTreeBuilders.py:59-224) and intermediate-count cost model
 * (/root/reference/plan/TreeCostModel.py:23-97). Ordering changes the JOIN TREE only:
 * slots keep their original pattern positions, so SEQ order checks, bindings, and output
 * are invariant (asserted by test). Trivial (pattern order) stays the default — it is the
 * reference's parity-defining default (/root/reference/misc/DefaultConfig.py:25).
 *
 * Statistics come from the `graft.cep.spark.Stats` side-pipeline: `perWindow` is the
 * expected number of events of a type inside one pattern window (arrival rate x window),
 * `sel` the selectivity of the conditions between two named args (1.0 = no condition).
 */
object Orders {

  sealed trait Strategy extends Serializable
  /** Pattern order — the reference default. */
  case object Trivial extends Strategy
  /** Explicit permutation of the positive-arg indices. */
  final case class Fixed(order: IndexedSeq[Int]) extends Strategy
  /** Ascending expected-count order (reference AscendingFrequencyTreeBuilder,
    * /root/reference/plan/LeftDeepTreeBuilders.py:59-96). */
  final case class AscendingRate(perWindowByType: Map[String, Double]) extends Strategy
  /** Greedy minimum-marginal-growth order (reference GreedyLeftDeepTreeBuilder,
    * /root/reference/plan/LeftDeepTreeBuilders.py:98-162): start from the smallest
    * filtered leaf, repeatedly append the arg with the smallest marginal partial-match
    * multiplier against the already-chosen prefix. */
  final case class Greedy(perWindowByType: Map[String, Double],
                          selByNames: Map[(String, String), Double] = Map.empty) extends Strategy

  /** Expected per-window count of one positive arg: max over its leaf types (conservative
    * for composite args — a nested SEQ/AND/KC produces at most one match per driving
    * event of its densest type). */
  private def argCount(arg: PStruct, perWindowByType: Map[String, Double]): Double = {
    def etypes(s: PStruct): List[String] = s match {
      case Prim(et, _)      => List(et)
      case PSeq(as)         => as.flatMap(etypes)
      case PAnd(as)         => as.flatMap(etypes)
      case POr(as)          => as.flatMap(etypes)
      case PKleene(a, _, _) => etypes(a)
      case PNeg(a)          => etypes(a)
    }
    etypes(arg).map(t => perWindowByType.getOrElse(t, 1.0)).max
  }

  /** Pairwise selectivity between two args = product of the selectivities of all
    * name-pair conditions crossing them (missing entries = 1.0). */
  private def argSel(a: PStruct, b: PStruct, selByNames: Map[(String, String), Double]): Double = {
    var s = 1.0
    for (x <- a.names; y <- b.names) {
      selByNames.get((x, y)).foreach(s *= _)
      selByNames.get((y, x)).foreach(s *= _)
    }
    s
  }

  /** Resolve a strategy to a permutation of positive-arg indices. */
  def resolve(strategy: Strategy, posArgs: List[PStruct]): IndexedSeq[Int] = strategy match {
    case Trivial => posArgs.indices.toIndexedSeq
    case Fixed(o) =>
      require(o.sorted == posArgs.indices.toIndexedSeq, s"order $o is not a permutation")
      o
    case AscendingRate(pw) =>
      posArgs.indices.sortBy(i => argCount(posArgs(i), pw)).toIndexedSeq
    case Greedy(pw, sel) =>
      val n = posArgs.length
      val counts = posArgs.map(argCount(_, pw)).toIndexedSeq
      val chosen = scala.collection.mutable.ArrayBuffer.empty[Int]
      val remaining = scala.collection.mutable.Set(posArgs.indices: _*)
      while (remaining.nonEmpty) {
        val next = remaining.minBy { i =>
          // marginal multiplier of appending arg i to the chosen prefix
          val cross = chosen.foldLeft(1.0)((p, j) => p * argSel(posArgs(i), posArgs(j), sel))
          (counts(i) * cross, i) // tie-break by index for determinism
        }
        chosen += next
        remaining -= next
      }
      chosen.toIndexedSeq
  }

  /** Reference cost model: sum of expected partial-match counts at every node of the
    * left-deep tree over `order` (/root/reference/plan/TreeCostModel.py:23-97). Used by
    * tests/benchmarks to compare candidate orders. */
  def leftDeepCost(order: IndexedSeq[Int], posArgs: List[PStruct],
                   perWindowByType: Map[String, Double],
                   selByNames: Map[(String, String), Double] = Map.empty): Double = {
    val counts = posArgs.map(argCount(_, perWindowByType)).toIndexedSeq
    var cost = 0.0
    var pm = 0.0
    order.zipWithIndex.foreach { case (argIdx, pos) =>
      val leafPm = counts(argIdx)
      cost += leafPm
      if (pos == 0) pm = leafPm
      else {
        val cross = order.take(pos).foldLeft(1.0)((p, j) =>
          p * argSel(posArgs(argIdx), posArgs(j), selByNames))
        pm = pm * leafPm * cross
        cost += pm
      }
    }
    cost
  }
}
