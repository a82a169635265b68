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
  /** Exact dynamic-programming LEFT-DEEP order (reference
    * DynamicProgrammingLeftDeepTreeBuilder, /root/reference/plan/LeftDeepTreeBuilders.py:163-224):
    * subset DP minimizing the intermediate-count cost model — optimal among left-deep
    * trees, unlike Greedy. */
  final case class DpLeftDeep(perWindowByType: Map[String, Double],
                              selByNames: Map[(String, String), Double] = Map.empty) extends Strategy
  /** Explicit join tree over the positive-arg indices — the output form of the
    * multi-pattern local-search merger ([[MultiPlan]]), which needs to force a SHARED
    * bracket into several patterns' plans. */
  final case class FixedTree(tree: JTree) extends Strategy
  /** Exact dynamic-programming BUSHY tree (reference DynamicProgrammingBushyTreeBuilder,
    * /root/reference/plan/BushyTreeBuilders.py:16-123): subset DP over all binary join
    * trees. For patterns with several selective CROSS-pairs (e.g. sel(A,B) and sel(C,D)
    * both tight), no left-deep order can bracket both — a bushy (A⋈B)⋈(C⋈D) shape keeps
    * every intermediate small. */
  final case class DpBushy(perWindowByType: Map[String, Double],
                           selByNames: Map[(String, String), Double] = Map.empty) extends Strategy

  /** Join tree over positive-arg indices — the combination shape the compiler builds.
    * Left-deep strategies resolve to a left-spine; DpBushy may produce any binary shape.
    * Slots/output are invariant to the shape (asserted by OrdersSpec). */
  sealed trait JTree extends Serializable { def indices: List[Int] }
  final case class JLeaf(i: Int) extends JTree { def indices: List[Int] = List(i) }
  final case class JNode(l: JTree, r: JTree) extends JTree {
    def indices: List[Int] = l.indices ::: r.indices
  }

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

  /** Resolve a strategy to a permutation of positive-arg indices (left-deep strategies
    * only; DpBushy has no permutation — use [[resolveTree]]). */
  def resolve(strategy: Strategy, posArgs: List[PStruct]): IndexedSeq[Int] = strategy match {
    case Trivial => posArgs.indices.toIndexedSeq
    case Fixed(o) =>
      require(o.sorted == posArgs.indices.toIndexedSeq, s"order $o is not a permutation")
      o
    case AscendingRate(pw) =>
      posArgs.indices.sortBy(i => argCount(posArgs(i), pw)).toIndexedSeq
    case Greedy(pw, sel) =>
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
    case DpLeftDeep(pw, sel) =>
      dpLeftDeepOrder(posArgs, pw, sel)
    case DpBushy(_, _) | FixedTree(_) =>
      throw new IllegalArgumentException("tree-shaped strategy has no flat order — use resolveTree")
  }

  /** Resolve a strategy to a join TREE. Permutation strategies become the left spine over
    * their order; DP strategies run the subset DP. */
  def resolveTree(strategy: Strategy, posArgs: List[PStruct]): JTree = strategy match {
    case FixedTree(t) =>
      require(t.indices.sorted == posArgs.indices.toList, s"tree $t is not a permutation")
      t
    case DpBushy(pw, sel) => dpBushy(posArgs, pw, sel)
    case s =>
      val order = resolve(s, posArgs)
      order.tail.foldLeft(JLeaf(order.head): JTree)((t, i) => JNode(t, JLeaf(i)))
  }

  /** Expected partial-match count of a node covering arg set `mask`:
    * product of per-arg counts x product of pairwise cross-selectivities — the reference's
    * intermediate-count cost model (/root/reference/plan/TreeCostModel.py:23-97). */
  private def pmCount(mask: Int, counts: IndexedSeq[Double],
                      selGrid: Array[Array[Double]]): Double = {
    var p = 1.0
    var i = 0
    while (i < counts.length) {
      if ((mask & (1 << i)) != 0) {
        p *= counts(i)
        var j = i + 1
        while (j < counts.length) {
          if ((mask & (1 << j)) != 0) p *= selGrid(i)(j)
          j += 1
        }
      }
      i += 1
    }
    p
  }

  private def grids(posArgs: List[PStruct], pw: Map[String, Double],
                    sel: Map[(String, String), Double]): (IndexedSeq[Double], Array[Array[Double]]) = {
    val counts = posArgs.map(argCount(_, pw)).toIndexedSeq
    val n = posArgs.length
    val g = Array.tabulate(n, n)((i, j) => argSel(posArgs(i), posArgs(j), sel))
    (counts, g)
  }

  /** Optimal left-deep order by subset DP (reference
    * /root/reference/plan/LeftDeepTreeBuilders.py:163-224): best(S) = min over last args
    * i of best(S-i) + pm(S). O(2^n * n); n is the pattern arity (small). */
  private def dpLeftDeepOrder(posArgs: List[PStruct], pw: Map[String, Double],
                              sel: Map[(String, String), Double]): IndexedSeq[Int] = {
    val n = posArgs.length
    require(n <= 20, s"DP ordering supports up to 20 args, got $n")
    if (n == 1) return IndexedSeq(0)
    val (counts, g) = grids(posArgs, pw, sel)
    val full = (1 << n) - 1
    val cost = Array.fill(1 << n)(Double.MaxValue)
    val last = Array.fill(1 << n)(-1)
    (0 until n).foreach { i => cost(1 << i) = counts(i); last(1 << i) = i }
    (1 to full).foreach { s =>
      if (java.lang.Integer.bitCount(s) >= 2) {
        val pm = pmCount(s, counts, g)
        var i = 0
        while (i < n) {
          if ((s & (1 << i)) != 0) {
            val c = cost(s ^ (1 << i)) + counts(i) + pm
            if (c < cost(s)) { cost(s) = c; last(s) = i }
          }
          i += 1
        }
      }
    }
    var s = full
    val rev = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (s != 0) { rev += last(s); s ^= 1 << last(s) }
    rev.reverse.toIndexedSeq
  }

  /** Optimal bushy tree by subset DP (reference
    * /root/reference/plan/BushyTreeBuilders.py:16-123): best(S) = min over proper
    * sub-partitions (L, S\L) of best(L) + best(R) + pm(S). O(3^n); n <= 16 guarded. */
  private def dpBushy(posArgs: List[PStruct], pw: Map[String, Double],
                      sel: Map[(String, String), Double]): JTree = {
    val n = posArgs.length
    require(n <= 16, s"bushy DP supports up to 16 args, got $n")
    if (n == 1) return JLeaf(0)
    val (counts, g) = grids(posArgs, pw, sel)
    val full = (1 << n) - 1
    val cost = Array.fill(1 << n)(Double.MaxValue)
    val tree = new Array[JTree](1 << n)
    (0 until n).foreach { i => cost(1 << i) = counts(i); tree(1 << i) = JLeaf(i) }
    (1 to full).foreach { s =>
      if (java.lang.Integer.bitCount(s) >= 2) {
        val pm = pmCount(s, counts, g)
        // enumerate proper submasks; keep the lowest set bit on the left side to halve
        // the symmetric enumeration (left/right choice does not change the cost model)
        val lowBit = s & -s
        var l = (s - 1) & s
        while (l != 0) {
          if ((l & lowBit) != 0) {
            val r = s ^ l
            val c = cost(l) + cost(r) + pm
            if (c < cost(s)) { cost(s) = c; tree(s) = JNode(tree(l), tree(r)) }
          }
          l = (l - 1) & s
        }
      }
    }
    tree(full)
  }

  /** Cost of an arbitrary join tree under the intermediate-count model: sum of expected
    * PM counts over every node (leaves included). Generalizes [[leftDeepCost]]. */
  def treeCost(t: JTree, posArgs: List[PStruct],
               perWindowByType: Map[String, Double],
               selByNames: Map[(String, String), Double] = Map.empty): Double = {
    val (counts, g) = grids(posArgs, perWindowByType, selByNames)
    def mask(tr: JTree): Int = tr.indices.foldLeft(0)((m, i) => m | (1 << i))
    def go(tr: JTree): Double = tr match {
      case JLeaf(i)    => counts(i)
      case JNode(l, r) => go(l) + go(r) + pmCount(mask(tr), counts, g)
    }
    go(t)
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
