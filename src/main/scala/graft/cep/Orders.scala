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
  /** Anytime left-deep improvement (reference IterativeImprovementLeftDeepTreeBuilder,
    * /root/reference/plan/LeftDeepTreeBuilders.py:138-178, moves from
    * /root/reference/plan/IterativeImprovement.py:23-104): start from a greedy or random
    * order, propose `stepLimit` random swap (two positions exchanged) or circle (three
    * positions rotated) moves, keep strict improvements under the intermediate-count cost.
    * The middle ground for arity > 20 where [[DpLeftDeep]]'s 2^n subset DP is barred:
    * cost scales with stepLimit, not arity, and the result never regresses below its
    * seed. Seeded RNG — deterministic and executor-shippable. */
  final case class IterativeImprovement(perWindowByType: Map[String, Double],
                                        selByNames: Map[(String, String), Double] = Map.empty,
                                        stepLimit: Int = 200,
                                        circleMoves: Boolean = false,
                                        greedyInit: Boolean = true,
                                        seed: Long = 17L) extends Strategy
  /** ZStream bushy builder (reference ZStreamTreeBuilder,
    * /root/reference/plan/BushyTreeBuilders.py:68-114): optimal BRACKETING of a fixed
    * leaf order by interval DP over contiguous suborders — O(n^3) intervals against
    * DpBushy's O(3^n) subsets, at the price of never permuting leaves. `greedyOrder`
    * seeds the Greedy order instead of pattern order (reference ZStreamOrdTreeBuilder,
    * `:117-123`). Sits between left-deep-over-same-order (never better bracketing) and
    * DpBushy (never worse than ZStream) — documented by OrdersSpec's cost comparison. */
  final case class ZStream(perWindowByType: Map[String, Double],
                           selByNames: Map[(String, String), Double] = Map.empty,
                           greedyOrder: Boolean = false) extends Strategy

  /** Negative-stack placement (SURVEY §2.3): [[NegNaive]] keeps pattern order within the
    * bounded and unbounded groups (reference NaiveNegationAlgorithm,
    * /root/reference/plan/negation/NaiveNegationAlgorithm.py:9-43); [[NegStatistic]]
    * sorts each group by DESCENDING arrival rate (reference StatisticNegationAlgorithm,
    * /root/reference/plan/negation/StatisticNegationAlgorithm.py:10-25), so the negative
    * most likely to invalidate a pending positive is checked first and prunes the
    * pending set cheapest. Bounded negatives always stack below unbounded ones (shared by
    * both algorithms — unbounded negation parks matches and must sit on top). Stack order
    * is output-invariant (each negative is a ∀-check; asserted by EngineSpec). */
  sealed trait NegStrategy extends Serializable
  case object NegNaive extends NegStrategy
  final case class NegStatistic(perWindowByType: Map[String, Double]) extends NegStrategy

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
    case ii: IterativeImprovement =>
      iiOrder(ii, posArgs)
    case DpBushy(_, _) | FixedTree(_) | ZStream(_, _, _) =>
      throw new IllegalArgumentException("tree-shaped strategy has no flat order — use resolveTree")
  }

  /** Resolve a strategy to a join TREE. Permutation strategies become the left spine over
    * their order; DP strategies run the subset DP. */
  def resolveTree(strategy: Strategy, posArgs: List[PStruct]): JTree = strategy match {
    case FixedTree(t) =>
      require(t.indices.sorted == posArgs.indices.toList, s"tree $t is not a permutation")
      t
    case DpBushy(pw, sel) => dpBushy(posArgs, pw, sel)
    case z: ZStream       => zStreamTree(z, posArgs)
    case s =>
      val order = resolve(s, posArgs)
      order.tail.foldLeft(JLeaf(order.head): JTree)((t, i) => JNode(t, JLeaf(i)))
  }

  /** Hill-climbing order improvement (reference IterativeImprovement.execute,
    * /root/reference/plan/IterativeImprovement.py:27-38, with the swap/circle generators
    * `:50-91`): propose a random move, keep it iff the cost strictly drops, else undo. */
  private def iiOrder(ii: IterativeImprovement, posArgs: List[PStruct]): IndexedSeq[Int] = {
    val n = posArgs.length
    if (n == 1) return IndexedSeq(0)
    val rnd = new scala.util.Random(ii.seed)
    val order: Array[Int] =
      if (ii.greedyInit) resolve(Greedy(ii.perWindowByType, ii.selByNames), posArgs).toArray
      else rnd.shuffle(posArgs.indices.toList).toArray
    def cost(): Double =
      leftDeepCost(order.toIndexedSeq, posArgs, ii.perWindowByType, ii.selByNames)
    // 3-cycle of positions (a,b,c): contents rotate b->a, c->b, a->c; the inverse cycle
    // is rotate(a,c,b). (The reference's _reverse_move re-applies the SAME cycle in a
    // shifted frame — IterativeImprovement.py:89-91 — which does not undo it; a rejected
    // circle move there silently leaves the order rotated. We undo exactly.)
    def rotate(a: Int, b: Int, c: Int): Unit = {
      val t = order(a); order(a) = order(b); order(b) = order(c); order(c) = t
    }
    var cur = cost()
    var step = 0
    while (step < ii.stepLimit) {
      if (!ii.circleMoves || n < 3) {
        val i = rnd.nextInt(n)
        val j = i + rnd.nextInt(n - i)
        val t = order(i); order(i) = order(j); order(j) = t
        val c = cost()
        if (c < cur) cur = c
        else { val u = order(i); order(i) = order(j); order(j) = u }
      } else {
        val i = rnd.nextInt(n - 2)
        val j = i + 1 + rnd.nextInt(n - 2 - i)
        val k = j + 1 + rnd.nextInt(n - 1 - j)
        val (a, b, c0) = if (rnd.nextBoolean()) (i, j, k) else (i, k, j)
        rotate(a, b, c0)
        val c = cost()
        if (c < cur) cur = c else rotate(a, c0, b)
      }
      step += 1
    }
    order.toIndexedSeq
  }

  /** Interval DP over a fixed leaf order (reference ZStreamTreeBuilder._create_tree_topology,
    * /root/reference/plan/BushyTreeBuilders.py:72-110): best(i,j) = min over splits k of
    * best(i,k) + best(k,j) + pm(i..j). Only contiguous suborders are bracketed, so leaves
    * keep their order; O(n^3) suborder-split pairs. */
  private def zStreamTree(z: ZStream, posArgs: List[PStruct]): JTree =
    zstreamWithInvariants(posArgs, z.perWindowByType, z.selByNames, z.greedyOrder)._1

  /** Invariants certifying a ZStream bushy bracketing (reference ZStreamTreeInvariants,
    * /root/reference/plan/invariant/Invariants.py:73-90): every internal node of the best
    * tree with >= 3 leaves is paired with its RUNNER-UP bracketing of the same contiguous
    * suborder (the second-cheapest top split found by the interval DP). The bracketing
    * stays certified while every recorded subtree still costs <= its runner-up under
    * fresh statistics — [[violated]] re-checks the |pairs| <= n-2 cost inequalities
    * without re-running the O(n^3) DP. */
  final case class ZStreamInvariants(pairs: List[(JTree, JTree)]) extends Serializable {
    def violated(posArgs: List[PStruct], perWindowByType: Map[String, Double],
                 selByNames: Map[(String, String), Double] = Map.empty): Boolean =
      pairs.exists { case (best, second) =>
        treeCost(best, posArgs, perWindowByType, selByNames) >
          treeCost(second, posArgs, perWindowByType, selByNames)
      }
  }

  /** ZStream interval DP retaining, per suborder, the second-cheapest TOP SPLIT — the
    * reference's InvariantAwareZStreamTreeBuilder
    * (/root/reference/plan/invariant/InvariantBushyTreeBuilder.py:15-107). The tree is
    * IDENTICAL to [[ZStream]]'s (same DP, asserted by OrdersSpec); the invariants cover
    * exactly the best tree's internal nodes with >= 3 leaves (the reference's
    * __get_relevant_sub_trees filter, `:95-107`). We track the TRUE second-minimum split:
    * the reference's bookkeeping (`second_min_tree == tree` against the speculative
    * first-split object, InvariantBushyTreeBuilder.py:74-76) can overwrite a valid
    * runner-up with a costlier later split once the speculative tree has been displaced —
    * the recorded pair is then not the second-min; we keep the exact one (a violated
    * check against the true second-min certifies the subtree is still the interval's DP
    * optimum w.r.t. its top split).
    *
    * `greedyOrder = false` mirrors the reference builder, whose initial order is the
    * IDENTITY (`_get_initial_order`, `:92-94`) precisely so the certified object — the
    * bracketing of a FIXED order — does not itself drift with statistics; with
    * `greedyOrder = true` the invariants certify the bracketing of the order computed at
    * build time only. */
  def zstreamWithInvariants(posArgs: List[PStruct], perWindowByType: Map[String, Double],
                            selByNames: Map[(String, String), Double] = Map.empty,
                            greedyOrder: Boolean = false): (JTree, ZStreamInvariants) = {
    val order: IndexedSeq[Int] =
      if (greedyOrder) resolve(Greedy(perWindowByType, selByNames), posArgs)
      else posArgs.indices.toIndexedSeq
    val n = order.length
    require(n <= 30, s"ZStream interval masks support up to 30 args, got $n")
    if (n == 1) return (JLeaf(order.head), ZStreamInvariants(Nil))
    val (counts, g) = grids(posArgs, perWindowByType, selByNames)
    val tree = Array.ofDim[JTree](n, n + 1)
    val second = Array.ofDim[JTree](n, n + 1)
    val cost = Array.fill(n, n + 1)(Double.MaxValue)
    (0 until n).foreach { i => tree(i)(i + 1) = JLeaf(order(i)); cost(i)(i + 1) = counts(order(i)) }
    (2 to n).foreach { len =>
      (0 to n - len).foreach { i =>
        val j = i + len
        val mask = (i until j).foldLeft(0)((m, t) => m | (1 << order(t)))
        val pm = pmCount(mask, counts, g)
        var secondCost = Double.MaxValue
        var k = i + 1
        while (k < j) {
          val c = cost(i)(k) + cost(k)(j) + pm
          val t = JNode(tree(i)(k), tree(k)(j))
          if (c < cost(i)(j)) {
            second(i)(j) = tree(i)(j); secondCost = cost(i)(j)
            tree(i)(j) = t; cost(i)(j) = c
          } else if (c < secondCost) { second(i)(j) = t; secondCost = c }
          k += 1
        }
      }
    }
    // pair each >=3-leaf internal node of the BEST tree with its interval's runner-up;
    // children of interval (i,j) cover (i, i+|left|) and (i+|left|, j) — leaves stay
    // contiguous, so the walk recovers each node's interval from subtree sizes
    val pairs = List.newBuilder[(JTree, JTree)]
    def collect(i: Int, j: Int): Unit =
      if (j - i >= 3) {
        pairs += ((tree(i)(j), second(i)(j)))
        tree(i)(j) match {
          case JNode(l, _) =>
            val k = i + l.indices.length
            collect(i, k); collect(k, j)
          case _ => ()
        }
      }
    collect(0, n)
    (tree(0)(n), ZStreamInvariants(pairs.result()))
  }

  /** Invariants certifying a greedy order (reference GreedyTreeInvariants,
    * /root/reference/plan/invariant/Invariants.py:39-70): step s of the greedy build
    * recorded (chosen_s, runnerUp_s). The plan remains the greedy optimum for fresh
    * statistics as long as every chosen step's change factor (count x selectivities
    * against the already-chosen prefix) stays <= its runner-up's; [[violated]] re-checks
    * that in O(n^2) without rebuilding anything. The last step has no runner-up. */
  final case class GreedyInvariants(steps: List[(Int, Option[Int])]) extends Serializable {
    def violated(posArgs: List[PStruct], perWindowByType: Map[String, Double],
                 selByNames: Map[(String, String), Double] = Map.empty): Boolean = {
      val counts = posArgs.map(argCount(_, perWindowByType)).toIndexedSeq
      def changeFactor(i: Int, prefix: List[Int]): Double =
        prefix.foldLeft(counts(i))((p, j) => p * argSel(posArgs(i), posArgs(j), selByNames))
      var prefix = List.empty[Int]
      steps.exists { case (chosen, runnerUp) =>
        val v = runnerUp.exists(r => changeFactor(chosen, prefix) > changeFactor(r, prefix))
        prefix = prefix :+ chosen
        v
      }
    }
  }

  /** Greedy order plus its invariants (reference InvariantAwareGreedyTreeBuilder
    * .calculate_greedy_order, /root/reference/plan/invariant/InvariantLeftDeepTreeBuilder
    * .py:66-126). The order is IDENTICAL to [[Greedy]]'s (asserted by OrdersSpec); the
    * invariants additionally capture each step's runner-up for [[GreedyInvariants
    * .violated]]. */
  def greedyWithInvariants(posArgs: List[PStruct], perWindowByType: Map[String, Double],
                           selByNames: Map[(String, String), Double] = Map.empty)
  : (IndexedSeq[Int], GreedyInvariants) = {
    val counts = posArgs.map(argCount(_, perWindowByType)).toIndexedSeq
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Int]
    val remaining = scala.collection.mutable.Set(posArgs.indices: _*)
    val steps = List.newBuilder[(Int, Option[Int])]
    while (remaining.nonEmpty) {
      def factor(i: Int): Double =
        chosen.foldLeft(counts(i))((p, j) => p * argSel(posArgs(i), posArgs(j), selByNames))
      val ranked = remaining.toList.sortBy(i => (factor(i), i))
      val next = ranked.head
      steps += ((next, ranked.drop(1).headOption))
      chosen += next
      remaining -= next
    }
    (chosen.toIndexedSeq, GreedyInvariants(steps.result()))
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
