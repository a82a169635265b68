package graft.cep

import scala.collection.mutable

/**
 * Compiled evaluation-tree spec. This replaces the reference's `plan/` + `tree/` construction
 * (/root/reference/plan/TreePlanBuilder.py, /root/reference/tree/Tree.py:25-47) with a single
 * immutable, serializable tree: left-deep over the pattern args in pattern order (the
 * reference's parity-defining default, /root/reference/misc/DefaultConfig.py:25,
 * /root/reference/plan/LeftDeepTreeBuilders.py:24-43), negations stacked on top (bounded
 * first — the naive negation algorithm, /root/reference/plan/negation/NaiveNegationAlgorithm.py:9-43).
 *
 * `slot` = the primitive event's DFS position in the full pattern (the reference's
 * event-definition index); SEQ order checks and merge order are defined over slots.
 */
sealed trait Spec extends Serializable {
  def id: Int
  def slots: Array[Int] // sorted covered slots (including negative slots below this node)
  def names: Set[String]
}
final case class LeafSpec(id: Int, slot: Int, name: String, etype: String) extends Spec {
  val slots: Array[Int] = Array(slot)
  val names: Set[String] = Set(name)
}
final case class BinSpec(id: Int, isSeq: Boolean, left: Spec, right: Spec) extends Spec {
  val slots: Array[Int] = (left.slots ++ right.slots).sorted
  val names: Set[String] = left.names ++ right.names
}
/** Kleene closure: buffers child matches, emits every subset containing the newest
  * (/root/reference/tree/nodes/KleeneClosureNode.py:24-89). maxSize = 0 -> unbounded. */
final case class KCSpec(id: Int, child: Spec, minSize: Int, maxSize: Int) extends Spec {
  val slots: Array[Int] = child.slots
  val names: Set[String] = child.names
  def bindSlot: Int = child.slots.min
}
/** Negation: positive partial match passes iff no buffered negative combines validly
  * (/root/reference/tree/nodes/NegationNode.py:96-122). `unbounded` = the negative may
  * arrive after the last positive (NOT-at-end in SEQ, or any NOT under AND), forcing the
  * positive match to be parked until window expiry (/root/reference/tree/nodes/NegationNode.py:124-183). */
final case class NegSpec(id: Int, isSeq: Boolean, pos: Spec, neg: Spec, unbounded: Boolean) extends Spec {
  val slots: Array[Int] = (pos.slots ++ neg.slots).sorted
  val names: Set[String] = pos.names ++ neg.names
}

/**
 * A fully compiled, executor-shippable pattern. Conditions are held out-of-tree in per-node
 * maps (the reference pushes each atomic condition to the deepest covering node,
 * /root/reference/tree/nodes/Node.py:310-319, /root/reference/condition/CompositeCondition.py:30-64).
 */
final case class CompiledPattern(
    patternId: Int,
    root: Spec,
    windowMicros: Long,
    nodeConds: Map[Int, List[Cond]],
    kcNodeConds: Map[Int, List[Cond]],
    /** slot of a KC bind -> all primitive names under that KC (for binding construction). */
    kcNamesBySlot: Map[Int, List[String]],
    /** leaf slot -> name. */
    nameBySlot: Map[Int, String],
    /** nodeId -> event types filtered under single/next consumption policies
      * (/root/reference/tree/Tree.py:35-37,117-118). */
    singleAt: Map[Int, Set[String]],
    /** freezer leaf name -> names frozen while it is active
      * (/root/reference/tree/evaluation/TreeBasedEvaluationMechanism.py:173-190). */
    freezeMap: Map[String, Set[String]],
    confidence: Double,
    nodes: IndexedSeq[Spec],      // by id
    parentOf: IndexedSeq[Int],    // by id; -1 for root
    firstUnboundedId: Int,        // -1 if no unbounded negation
    relevantTypes: Set[String]) extends Serializable {
  /** Compiled-once runtime helpers (condition evaluators); one instance per deserialized
    * CompiledPattern, shared across all per-key runtimes in a task. */
  @transient lazy val statics: PatternStatics = new PatternStatics(this)

  /** Deterministic fingerprint of the compiled PLAN SHAPE (tree topology, slots, types,
    * window, policies) — NOT of condition lambdas. Stored with streaming state so a
    * restart under a different join order (or changed pattern) detects the mismatch and
    * migrates state by leaf-event replay instead of misinterpreting node-id-keyed
    * buffers (see graft.cep.Adaptive). */
  lazy val shapeFingerprint: Int = {
    def render(s: Spec): String = s match {
      case l: LeafSpec => s"L(${l.slot},${l.etype})"
      case b: BinSpec  => s"B(${b.isSeq},${render(b.left)},${render(b.right)})"
      case k: KCSpec   => s"K(${k.minSize},${k.maxSize},${render(k.child)})"
      case n: NegSpec  => s"N(${n.isSeq},${n.unbounded},${render(n.pos)},${render(n.neg)})"
    }
    (patternId, render(root), windowMicros, confidence, singleAt, freezeMap).hashCode()
  }

  /** Leaves in final-tree traversal order (positive subtree first, negation leaves after —
    * the reference's event_types_listeners order, /root/reference/tree/Tree.py:59-67 via
    * get_leaves). The order is observable when one event plays on several leaves of the
    * same type: it decides which buffers are populated when later leaves probe them. */
  @transient lazy val leavesByType: Map[String, IndexedSeq[LeafSpec]] = {
    def leaves(s: Spec): Vector[LeafSpec] = s match {
      case l: LeafSpec => Vector(l)
      case b: BinSpec  => leaves(b.left) ++ leaves(b.right)
      case k: KCSpec   => leaves(k.child)
      case n: NegSpec  => leaves(n.pos) ++ leaves(n.neg)
    }
    leaves(root).groupBy(_.etype)
  }
}

object Compiler {

  /** Compile a pattern; OR structures split into one compiled pattern per alternative, all
    * sharing the user pattern id — the union of their outputs is the pattern's result
    * (/root/reference/transformation/PatternTransformer.py:64-115). */
  def compile(p: Pattern): IndexedSeq[CompiledPattern] = compile(p, Orders.Trivial)

  def compile(p: Pattern, strategy: Orders.Strategy): IndexedSeq[CompiledPattern] =
    compile(p, strategy, Orders.NegNaive)

  /** Compile with a join-order strategy (SURVEY.md §4.1 "join reordering") and a
    * negative-stack strategy (§2.3 "statistic negation placement"): the left-deep tree
    * combines the top-level positive args in the strategy's order while slots keep their
    * pattern positions — outputs are order/stack-invariant, intermediate buffer sizes and
    * per-event check costs are not. Trivial/NegNaive = the reference's parity defaults. */
  def compile(p: Pattern, strategy: Orders.Strategy,
              negStrategy: Orders.NegStrategy): IndexedSeq[CompiledPattern] = {
    val originalNames = p.structure.names.toSet
    val unknown = p.condition.conjuncts.flatMap(_.names).filterNot(originalNames)
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"condition references unknown event name(s): ${unknown.distinct.mkString(", ")}")
    if (strategy != Orders.Trivial)
      require(p.policy.single.isEmpty && p.policy.next.isEmpty && p.policy.freeze.isEmpty,
        "non-trivial join order requires MATCH_ANY (policies observe node identity / emission order)")
    expandOr(p.structure).map(s => compileOne(p, s, strategy, negStrategy)).toIndexedSeq
  }

  /** Cartesian expansion of OR alternatives anywhere in the structure. */
  private[cep] def expandOr(s: PStruct): List[PStruct] = s match {
    case p: Prim          => List(p)
    case POr(as)          => as.flatMap(expandOr)
    case PSeq(as)         => cartesian(as.map(expandOr)).map(PSeq(_))
    case PAnd(as)         => cartesian(as.map(expandOr)).map(PAnd(_))
    case PKleene(a, m, x) => expandOr(a).map(PKleene(_, m, x))
    case PNeg(a)          => expandOr(a).map(PNeg(_))
  }

  private def cartesian[A](ls: List[List[A]]): List[List[A]] =
    ls.foldRight(List(List.empty[A])) { (alts, acc) => alts.flatMap(a => acc.map(a :: _)) }

  private def compileOne(p: Pattern, structure: PStruct,
                         strategy: Orders.Strategy = Orders.Trivial,
                         negStrategy: Orders.NegStrategy = Orders.NegNaive): CompiledPattern = {
    // 1. slot assignment: DFS order over the full structure (negatives keep their positions,
    //    mirroring the reference's index-by-arg-position, /root/reference/base/Pattern.py:90-101).
    var nextSlot = -1
    def newSlot(): Int = { nextSlot += 1; nextSlot }
    var nextId = -1
    def newId(): Int = { nextId += 1; nextId }

    val nodesBuf = mutable.ArrayBuffer.empty[Spec]
    def register(s: Spec): Spec = { nodesBuf += s; s }

    // compile positive (OR-free, negation-free) structure to a spec tree, assigning slots DFS
    def build(s: PStruct): Spec = s match {
      case Prim(et, n) => register(LeafSpec(newId(), newSlot(), n, et))
      case PSeq(as)    => leftDeep(as.map(build), isSeq = true)
      case PAnd(as)    => leftDeep(as.map(build), isSeq = false)
      case PKleene(a, mn, mx) =>
        a match {
          case _: PNeg => throw new IllegalArgumentException("Kleene closure cannot wrap a negation")
          case _       => ()
        }
        if (mn < 1) throw new IllegalArgumentException("Kleene min size must be >= 1")
        register(KCSpec(newId(), build(a), mn, mx))
      case PNeg(_) => throw new IllegalArgumentException(
        "negation is only supported as a top-level argument of the outermost SEQ/AND " +
          "(matching the reference, /root/reference/base/Pattern.py:65-88)")
      case POr(_) => throw new IllegalStateException("OR must be expanded before compilation")
    }
    def leftDeep(specs: List[Spec], isSeq: Boolean): Spec =
      specs.reduceLeft((l, r) => register(BinSpec(newId(), isSeq, l, r)))

    // 2. split top-level negatives (/root/reference/base/Pattern.py:65-88)
    val (root0, firstUnbounded) = structure match {
      case comp @ (_: PSeq | _: PAnd) =>
        val args = comp match { case PSeq(a) => a; case PAnd(a) => a; case _ => Nil }
        val isSeqTop = comp.isInstanceOf[PSeq]
        if (args.forall(_.isInstanceOf[PNeg]))
          throw new IllegalArgumentException("pattern contains no positive events")
        // determine bounded/unbounded per negative: under SEQ a negative is unbounded iff no
        // positive arg follows it; under AND all negatives are unbounded
        // (/root/reference/plan/negation/NegationAlgorithm.py:29-37)
        val lastPosIdx = args.lastIndexWhere(!_.isInstanceOf[PNeg])
        case class NegArg(inner: PStruct, argIdx: Int, unbounded: Boolean)
        val negArgs = args.zipWithIndex.collect { case (PNeg(inner), i) =>
          NegArg(inner, i, if (isSeqTop) i > lastPosIdx else true)
        }
        // build in arg order so slots are assigned by original position: walk args, building
        // positives into a list and negatives into their own subtrees
        val posSpecs = mutable.ArrayBuffer.empty[Spec]
        val posArgs = mutable.ArrayBuffer.empty[PStruct]
        val negSpecs = mutable.ArrayBuffer.empty[(Spec, Boolean)] // (subtree, unbounded)
        args.zipWithIndex.foreach {
          case (PNeg(inner), i) =>
            negSpecs += ((build(inner), negArgs.find(_.argIdx == i).get.unbounded))
          case (a, _) => posSpecs += build(a); posArgs += a
        }
        // join tree from the strategy: slots stay in pattern positions (assigned above),
        // only the combination SHAPE changes (left-deep spine for permutation strategies,
        // any binary shape for DpBushy) — output-invariant (SEQ order checks and window
        // bounds are defined over merged slots, not tree shape; asserted by OrdersSpec)
        def buildJ(t: Orders.JTree): Spec = t match {
          case Orders.JLeaf(i)    => posSpecs(i)
          case Orders.JNode(l, r) => register(BinSpec(newId(), isSeqTop, buildJ(l), buildJ(r)))
        }
        var root: Spec = buildJ(Orders.resolveTree(strategy, posArgs.toList))
        var firstUnb = -1
        // bounded below unbounded always (unbounded negation parks matches — it must sit
        // on top); WITHIN each group: pattern order (NegNaive) or descending arrival rate
        // (NegStatistic — the likeliest invalidator checked first, reference
        // StatisticNegationAlgorithm.py:17-21). Output-invariant: every NegSpec is a
        // ∀-check over its buffer, so stack order changes cost, not the match set.
        def stack(group: Seq[(Spec, Boolean)]): Seq[(Spec, Boolean)] = negStrategy match {
          case Orders.NegNaive => group
          case Orders.NegStatistic(pw) =>
            def rate(s: Spec): Double = s match {
              case l: LeafSpec => pw.getOrElse(l.etype, 1.0)
              case b: BinSpec  => math.max(rate(b.left), rate(b.right))
              case k: KCSpec   => rate(k.child)
              case n: NegSpec  => math.max(rate(n.pos), rate(n.neg))
            }
            // stable sort, tie-broken by slot position for determinism
            group.sortBy { case (s, _) => (-rate(s), s.slots.min) }
        }
        (stack(negSpecs.filter(!_._2).toSeq) ++ stack(negSpecs.filter(_._2).toSeq))
          .foreach { case (neg, unb) =>
            root = register(NegSpec(newId(), isSeqTop, root, neg, unb))
            if (unb && firstUnb == -1) firstUnb = root.id
          }
        (root, firstUnb)
      case s => (build(s), -1)
    }

    // 3. parent table
    val nodes = nodesBuf.sortBy(_.id).toIndexedSeq
    val parentOf = Array.fill(nodes.length)(-1)
    nodes.foreach {
      case b: BinSpec => parentOf(b.left.id) = b.id; parentOf(b.right.id) = b.id
      case k: KCSpec  => parentOf(k.child.id) = k.id
      case n: NegSpec => parentOf(n.pos.id) = n.id; parentOf(n.neg.id) = n.id
      case _          => ()
    }

    // 4. condition placement: each conjunct to the deepest covering node. KC conditions only
    //    at KC nodes; plain conditions to the deepest non-KC node.
    val contigConds: List[Cond] = p.policy.contiguous.flatMap { group =>
      group.sliding(2).collect { case List(a, b) =>
        CBinary(a, b, (x: Ev, y: Ev) => y.idx == x.idx + 1): Cond
      }
    }
    val allNames: Set[String] = root0.names
    val conjuncts = (p.condition.conjuncts ++ contigConds)
      .filter(c => c.names.nonEmpty && c.names.subsetOf(allNames)) // drop conds for names absent in this OR alternative
    val nodeConds = mutable.HashMap.empty[Int, List[Cond]].withDefaultValue(Nil)
    val kcConds = mutable.HashMap.empty[Int, List[Cond]].withDefaultValue(Nil)

    def placeKC(c: Cond, n: Spec): Boolean = n match {
      case k: KCSpec =>
        if (c.names.subsetOf(k.names)) { kcConds(k.id) = kcConds(k.id) :+ c; true } else false
      case b: BinSpec => placeKC(c, b.left) || placeKC(c, b.right) ||
        (if (c.names.subsetOf(b.names)) { nodeConds(b.id) = nodeConds(b.id) :+ c; true } else false)
      case ng: NegSpec => placeKC(c, ng.pos) || placeKC(c, ng.neg) ||
        (if (c.names.subsetOf(ng.names)) { nodeConds(ng.id) = nodeConds(ng.id) :+ c; true } else false)
      case _ => false
    }
    def place(c: Cond, n: Spec): Boolean = n match {
      case l: LeafSpec =>
        if (c.names.subsetOf(l.names)) { nodeConds(l.id) = nodeConds(l.id) :+ c; true } else false
      case k: KCSpec => place(c, k.child) // plain conditions fall through the KC node to its child
      case b: BinSpec => place(c, b.left) || place(c, b.right) ||
        (if (c.names.subsetOf(b.names)) { nodeConds(b.id) = nodeConds(b.id) :+ c; true } else false)
      case ng: NegSpec => place(c, ng.pos) || place(c, ng.neg) ||
        (if (c.names.subsetOf(ng.names)) { nodeConds(ng.id) = nodeConds(ng.id) :+ c; true } else false)
    }
    conjuncts.foreach { c =>
      val placed = if (c.isKC) placeKC(c, root0) else place(c, root0)
      if (!placed)
        throw new IllegalArgumentException(s"condition $c could not be placed (names ${c.names})")
    }

    // 5. binding metadata
    val nameBySlot = nodes.collect { case l: LeafSpec => l.slot -> l.name }.toMap
    val kcNamesBySlot = nodes.collect { case k: KCSpec =>
      k.bindSlot -> k.child.slots.toList.map(nameBySlot)
    }.toMap

    // 6. consumption policies: MATCH_SINGLE at root for listed types
    //    (/root/reference/misc/ConsumptionPolicy.py:76-88 with the default MATCH_SINGLE
    //    secondary strategy; registration /root/reference/tree/Tree.py:35-37);
    //    MATCH_NEXT at each listed type's leaf parent, propagated to its ancestors
    //    (/root/reference/tree/Tree.py:117-118, /root/reference/tree/nodes/Node.py:301-308)
    val singleAt: Map[Int, Set[String]] = {
      val acc = mutable.HashMap.empty[Int, Set[String]].withDefaultValue(Set.empty)
      if (p.policy.single.nonEmpty) acc(root0.id) = acc(root0.id) ++ p.policy.single
      if (p.policy.next.nonEmpty) nodes.foreach {
        case l: LeafSpec if p.policy.next.contains(l.etype) =>
          var n = parentOf(l.id)
          while (n >= 0) { acc(n) = acc(n) + l.etype; n = parentOf(n) }
        case _ => ()
      }
      acc.toMap
    }

    // 7. freeze map over flat sequences
    //    (/root/reference/tree/evaluation/TreeBasedEvaluationMechanism.py:173-190)
    val freezeMap: Map[String, Set[String]] =
      if (p.policy.freeze.isEmpty) Map.empty
      else {
        val sequences: List[List[String]] = flatSequences(structure)
        p.policy.freeze.iterator.map { fz =>
          fz -> sequences.filter(_.contains(fz)).flatMap(seq => seq.take(seq.indexOf(fz) + 1)).toSet
        }.filter(_._2.nonEmpty).toMap
      }

    CompiledPattern(
      patternId = p.id,
      root = root0,
      windowMicros = p.windowMicros,
      nodeConds = nodeConds.toMap,
      kcNodeConds = kcConds.toMap,
      kcNamesBySlot = kcNamesBySlot,
      nameBySlot = nameBySlot,
      singleAt = singleAt,
      freezeMap = freezeMap,
      confidence = p.confidence,
      nodes = nodes,
      parentOf = parentOf.toIndexedSeq,
      firstUnboundedId = firstUnbounded,
      relevantTypes = nodes.collect { case l: LeafSpec => l.etype }.toSet)
  }

  /** Name lists of maximal SEQ contexts (the reference's `extract_flat_sequences`). */
  private def flatSequences(s: PStruct): List[List[String]] = s match {
    case PSeq(as)         => List(as.flatMap(_.names)) ++ as.flatMap(flatSequencesInner)
    case PAnd(as)         => as.flatMap(flatSequences)
    case PKleene(a, _, _) => flatSequences(a)
    case PNeg(a)          => flatSequences(a)
    case _: Prim          => Nil
    case POr(as)          => as.flatMap(flatSequences)
  }
  private def flatSequencesInner(s: PStruct): List[List[String]] = s match {
    case PSeq(_) => flatSequences(s)
    case PAnd(as) => as.flatMap(flatSequencesInner)
    case PKleene(a, _, _) => flatSequencesInner(a)
    case PNeg(a) => flatSequencesInner(a)
    case _ => Nil
  }
}
