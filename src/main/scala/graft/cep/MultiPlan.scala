package graft.cep

import scala.collection.mutable
import scala.util.Random

/**
 * Multi-pattern plan merging by LOCAL SEARCH — the Spark-side analogue of the reference's
 * local-search global planner (/root/reference/plan/multi/local_search/LocalSearch.py:15-45,
 * MultiPatternGraph.py:10-90, StateNode.py:56-96): find per-pattern join trees that
 * maximize cross-pattern subtree sharing under the intermediate-count cost model.
 *
 * The reference builds a multi-pattern graph of maximal common sub-patterns, then
 * hill-climbs/anneals over global plans, each step forcing a randomly chosen common
 * sub-pattern to be planned ONCE and embedded in every containing pattern's tree. Here
 * the searched object is the per-pattern [[Orders.JTree]]: a neighbor move picks a common
 * index set, plans it with the bushy DP, brackets it into every agreeing pattern
 * (remaining args joined left-deep greedily around the shared unit), and the objective is
 *   sum of per-pattern tree costs  −  (k−1) × cost of each subtree shared by k patterns
 * — exactly what the runtime saves, because [[MatchEngine]]'s subtree sharing
 * (Engine.scala `buildSharing`) buffers an equivalent subtree once and aliases followers.
 *
 * Sharing eligibility mirrors the engine's rules: policy-free patterns, equal windows and
 * confidence, identical arg structures at identical slot positions, and identical
 * condition objects over the shared names (lambda-bearing conditions compare by
 * reference — build shared conditions once and reuse them across patterns, as the
 * multi-pattern tests do).
 */
object MultiPlan {

  /** Per-pattern plan info the search works over. `slotBase(i)` = slot of the first
    * primitive of positive arg i (slots precede it from earlier args, negatives
    * included) — shared subtrees must agree on slots, not just structure. */
  private final case class PatInfo(idx: Int, p: Pattern, posArgs: IndexedSeq[PStruct],
                                   slotBase: IndexedSeq[Int], isSeq: Boolean,
                                   eligible: Boolean)

  private def primCount(s: PStruct): Int = s match {
    case _: Prim          => 1
    case PSeq(as)         => as.map(primCount).sum
    case PAnd(as)         => as.map(primCount).sum
    case POr(as)          => as.map(primCount).max // not eligible anyway
    case PKleene(a, _, _) => primCount(a)
    case PNeg(a)          => primCount(a)
  }

  private def info(idx: Int, p: Pattern): PatInfo = {
    val args = p.structure match {
      case PSeq(as) => as
      case PAnd(as) => as
      case other    => List(other)
    }
    val pos = args.filterNot(_.isInstanceOf[PNeg])
    val bases = args.scanLeft(0)((b, a) => b + primCount(a))
    val posBases = args.zip(bases).collect { case (a, b) if !a.isInstanceOf[PNeg] => b }
    val isSeq = p.structure match { case _: PSeq => true; case _ => false }
    val hasOr = Compiler.expandOr(p.structure).lengthCompare(1) != 0
    val eligible = p.policy.single.isEmpty && p.policy.next.isEmpty &&
      p.policy.freeze.isEmpty && !hasOr && pos.length >= 2 &&
      (p.structure.isInstanceOf[PSeq] || p.structure.isInstanceOf[PAnd])
    PatInfo(idx, p, pos.toIndexedSeq, posBases.toIndexedSeq, isSeq, eligible)
  }

  /** Conjuncts of `p`'s condition whose names fall entirely inside `names` — the
    * conditions the compiler places inside a bracket covering those args. */
  private def condsIn(p: Pattern, names: Set[String]): Set[Cond] =
    p.condition.conjuncts.filter(c => c.names.nonEmpty && c.names.subsetOf(names)).toSet

  private def argsNames(pi: PatInfo, s: Set[Int]): Set[String] =
    s.flatMap(i => pi.posArgs(i).names)

  /** Two patterns agree on index set `s` when sharing could trigger for that bracket. */
  private def agree(a: PatInfo, b: PatInfo, s: Set[Int]): Boolean =
    a.eligible && b.eligible && a.isSeq == b.isSeq &&
      a.p.windowMicros == b.p.windowMicros && a.p.confidence == b.p.confidence &&
      s.forall(i => i < a.posArgs.length && i < b.posArgs.length &&
        a.posArgs(i) == b.posArgs(i) && a.slotBase(i) == b.slotBase(i)) &&
      condsIn(a.p, argsNames(a, s)) == condsIn(b.p, argsNames(b, s))

  private def subtrees(t: Orders.JTree): List[Orders.JTree] = t match {
    case Orders.JLeaf(_)    => Nil
    case n @ Orders.JNode(l, r) => n :: subtrees(l) ::: subtrees(r)
  }

  private def shapeKey(t: Orders.JTree, pi: PatInfo): Any = {
    def shape(tr: Orders.JTree): String = tr match {
      case Orders.JLeaf(i)    => s"L($i,${pi.slotBase(i)},${pi.posArgs(i)})"
      case Orders.JNode(l, r) => s"N(${shape(l)},${shape(r)})"
    }
    val names = argsNames(pi, t.indices.toSet)
    (pi.isSeq, pi.p.windowMicros, pi.p.confidence, shape(t), condsIn(pi.p, names))
  }

  /** Objective: total cost minus realized sharing savings (largest shared subtrees first,
    * each pattern region shared at most once — mirrors the engine's host/follower rule). */
  private def cost(state: IndexedSeq[Orders.JTree], pats: IndexedSeq[PatInfo],
                   pw: Map[String, Double], sel: Map[(String, String), Double]): Double = {
    var total = 0.0
    pats.indices.foreach { i =>
      total += Orders.treeCost(state(i), pats(i).posArgs.toList, pw, sel)
    }
    // group identical-key subtrees across eligible patterns
    val groups = mutable.LinkedHashMap.empty[Any, mutable.ArrayBuffer[(Int, Orders.JTree)]]
    pats.indices.foreach { i =>
      if (pats(i).eligible)
        subtrees(state(i)).foreach { st =>
          groups.getOrElseUpdate(shapeKey(st, pats(i)), mutable.ArrayBuffer.empty) += ((i, st))
        }
    }
    val shared = Array.fill(pats.length)(Set.empty[Int])
    groups.valuesIterator.toSeq.sortBy(-_.head._2.indices.length).foreach { occ =>
      val distinct = occ.groupBy(_._1).map(_._2.head).toSeq // one occurrence per pattern
      val live = distinct.filter { case (i, st) => st.indices.forall(!shared(i).contains(_)) }
      if (live.length >= 2) {
        val (hostI, hostT) = live.head
        val c = Orders.treeCost(hostT, pats(hostI).posArgs.toList, pw, sel)
        total -= (live.length - 1) * c
        live.foreach { case (i, st) => shared(i) ++= st.indices }
      }
    }
    total
  }

  /** Bracket `s` (planned as `sharedTree`) into pattern `pi`'s plan: remaining args join
    * the shared unit left-deep in greedy marginal-growth order. */
  private def withBracket(pi: PatInfo, s: Set[Int], sharedTree: Orders.JTree,
                         pw: Map[String, Double], sel: Map[(String, String), Double]): Orders.JTree = {
    val (counts, grid) = unitGrids(pi, pw, sel)
    val rest = pi.posArgs.indices.filterNot(s).toBuffer
    var tree: Orders.JTree = sharedTree
    var inTree = s
    while (rest.nonEmpty) {
      val next = rest.minBy { j =>
        val cross = inTree.foldLeft(1.0)((p, i) => p * grid(i)(j))
        (counts(j) * cross, j)
      }
      tree = Orders.JNode(tree, Orders.JLeaf(next))
      inTree += next
      rest -= next
    }
    tree
  }

  private def unitGrids(pi: PatInfo, pw: Map[String, Double],
                        sel: Map[(String, String), Double]): (IndexedSeq[Double], Array[Array[Double]]) = {
    val args = pi.posArgs.toList
    val n = args.length
    val counts = args.map(a => Orders.treeCost(Orders.JLeaf(0), List(a), pw, sel)).toIndexedSeq
    val g = Array.tabulate(n, n)((i, j) =>
      if (i == j) 1.0
      else {
        var p = 1.0
        for (x <- args(i).names; y <- args(j).names) {
          sel.get((x, y)).foreach(p *= _)
          sel.get((y, x)).foreach(p *= _)
        }
        p
      })
    (counts, g)
  }

  /** Run the local search; returns one strategy per pattern (input order). Ineligible
    * patterns (policies, OR, single-arg) keep their individual DP-optimal plan.
    *
    * Two meta-heuristics, mirroring the reference's LocalSearchApproaches
    * (/root/reference/plan/multi/local_search/LocalSearchApproaches.py:1-10,
    * LocalSearch.py:82-129): the default SIMULATED ANNEALING accepts a single random
    * neighbor per step with temperature-decayed tolerance for regressions; `tabu = true`
    * switches to TABU SEARCH — explore `neighborhood` random neighbors per step, skip
    * states already on the bounded tabu list, and move to the CHEAPEST remaining one
    * even when it is worse than the current state (the tabu list, not the move rule,
    * prevents cycling). Both track and return the best state visited. */
  def localSearch(patterns: Seq[Pattern],
                  perWindowByType: Map[String, Double],
                  selByNames: Map[(String, String), Double] = Map.empty,
                  steps: Int = 60, seed: Long = 17L,
                  tabu: Boolean = false, neighborhood: Int = 6,
                  tabuCapacity: Int = 64): IndexedSeq[Orders.Strategy] = {
    val pw = perWindowByType
    val pats = patterns.zipWithIndex.map { case (p, i) => info(i, p) }.toIndexedSeq
    val rnd = new Random(seed)
    // individual optimum as the starting state (and the fallback for ineligible patterns)
    def individual(pi: PatInfo): Orders.JTree =
      if (pi.posArgs.length < 2) Orders.JLeaf(0)
      else Orders.resolveTree(Orders.DpBushy(pw, selByNames), pi.posArgs.toList)
    var state = pats.map(individual)
    var cur = cost(state, pats, pw, selByNames)
    var best = state
    var bestCost = cur
    // maximal common index sets per eligible pair — the multi-pattern graph edges
    val pairs = for {
      a <- pats if a.eligible
      b <- pats if b.eligible && b.idx > a.idx
      m = (0 until math.min(a.posArgs.length, b.posArgs.length))
        .filter(i => agree(a, b, Set(i))).toIndexedSeq
      if m.length >= 2 && agree(a, b, m.toSet)
    } yield (a.idx, b.idx, m)
    // ineligible patterns (policies, OR, single-arg) must compile under Trivial — the
    // compiler rejects reordering for policy patterns
    def strategies(trees: IndexedSeq[Orders.JTree]): IndexedSeq[Orders.Strategy] =
      pats.indices.map { i =>
        if (!pats(i).eligible || pats(i).posArgs.length < 2) Orders.Trivial
        else Orders.FixedTree(trees(i))
      }
    if (pairs.isEmpty) return strategies(state)

    /** One random neighbor of `st`: pick a pair edge, bracket a random common subset
      * (planned once by the bushy DP) into every agreeing pattern. None when the draw
      * fails the agreement re-check. */
    def neighbor(st: IndexedSeq[Orders.JTree]): Option[IndexedSeq[Orders.JTree]] = {
      val (ai, bi, m) = pairs(rnd.nextInt(pairs.length))
      val size = 2 + rnd.nextInt(m.length - 1)
      val s = rnd.shuffle(m).take(size).toSet
      if (!agree(pats(ai), pats(bi), s)) return None
      val peers = pats.filter(c => c.eligible && agree(pats(ai), c, s)).map(_.idx)
      if (peers.length < 2) return None
      val subList = s.toList.sorted
      val subTree0 = Orders.resolveTree(
        Orders.DpBushy(pw, selByNames), subList.map(pats(ai).posArgs(_)))
      def remap(t: Orders.JTree): Orders.JTree = t match {
        case Orders.JLeaf(i)    => Orders.JLeaf(subList(i))
        case Orders.JNode(l, r) => Orders.JNode(remap(l), remap(r))
      }
      val subTree = remap(subTree0)
      Some(st.zipWithIndex.map { case (t, i) =>
        if (peers.contains(i)) withBracket(pats(i), s, subTree, pw, selByNames) else t
      })
    }

    if (!tabu) {
      // simulated annealing: one neighbor per step, decayed tolerance for regressions
      val t0 = math.max(1e-9, cur.abs * 0.05)
      (0 until steps).foreach { step =>
        neighbor(state).foreach { cand =>
          val c = cost(cand, pats, pw, selByNames)
          val d = c - cur
          val temp = t0 * math.pow(0.9, step)
          if (d < 0 || rnd.nextDouble() < math.exp(-d / math.max(temp, 1e-12))) {
            state = cand; cur = c
            if (c < bestCost) { best = state; bestCost = c }
          }
        }
      }
    } else {
      // tabu search (reference TabuSearch, LocalSearch.py:94-129): per step explore
      // `neighborhood` random neighbors, drop tabu-listed states, move to the cheapest
      // remaining even if worse; visited states enter a bounded FIFO tabu list
      def key(st: IndexedSeq[Orders.JTree]): String = st.mkString(";")
      val tabuList = mutable.ArrayDeque.empty[String]
      val tabuSet = mutable.HashSet.empty[String]
      def remember(k: String): Unit = {
        if (tabuSet.add(k)) {
          tabuList.append(k)
          while (tabuList.length > tabuCapacity) tabuSet.remove(tabuList.removeHead())
        }
      }
      remember(key(state))
      (0 until steps).foreach { _ =>
        val cands = (0 until neighborhood).flatMap(_ => neighbor(state))
          .filter(c => !tabuSet.contains(key(c)))
        if (cands.nonEmpty) {
          val scored = cands.map(c => (cost(c, pats, pw, selByNames), c))
          val (c, st) = scored.minBy(_._1)
          state = st; cur = c
          remember(key(st))
          if (c < bestCost) { best = state; bestCost = c }
        }
      }
    }
    strategies(best)
  }
}
