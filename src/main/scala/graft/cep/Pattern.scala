package graft.cep

/**
 * Pattern structure ADT — the user-facing query surface. A direct, idiomatic-Scala
 * re-expression of the reference's AST (/root/reference/base/PatternStructure.py):
 * SEQ / AND / OR / Kleene closure / negation over primitive typed events.
 * Serializable so compiled patterns can ship inside stateful-operator closures.
 */
sealed trait PStruct extends Serializable {
  /** All primitive event names in DFS order. */
  def names: List[String] = this match {
    case Prim(_, n)       => List(n)
    case PSeq(as)         => as.flatMap(_.names)
    case PAnd(as)         => as.flatMap(_.names)
    case POr(as)          => as.flatMap(_.names)
    case PKleene(a, _, _) => a.names
    case PNeg(a)          => a.names
  }
}

/** Binds one event of `etype` to variable `name` (/root/reference/base/PatternStructure.py:49-78). */
final case class Prim(etype: String, name: String) extends PStruct
/** All args in timestamp order, ties allowed (/root/reference/base/PatternStructure.py:160-165). */
final case class PSeq(args: List[PStruct]) extends PStruct
/** All args in any order (/root/reference/base/PatternStructure.py:144-149). */
final case class PAnd(args: List[PStruct]) extends PStruct
/** Any one arg (/root/reference/base/PatternStructure.py:152-157); compiled by splitting into
  * one pattern per alternative, like the reference preprocessor
  * (/root/reference/transformation/PatternTransformer.py:64-115). */
final case class POr(args: List[PStruct]) extends PStruct
/** 1..n repetitions; every subset is a match (/root/reference/base/PatternStructure.py:168-191).
  * maxSize = 0 means unbounded. Cannot wrap a negation. */
final case class PKleene(arg: PStruct, minSize: Int = 1, maxSize: Int = 0) extends PStruct
/** The arg must NOT occur (/root/reference/base/PatternStructure.py:194-205). */
final case class PNeg(arg: PStruct) extends PStruct

object PStruct {
  def SEQ(args: PStruct*): PSeq  = PSeq(args.toList)
  def AND(args: PStruct*): PAnd  = PAnd(args.toList)
  def OR(args: PStruct*): POr    = POr(args.toList)
  def NOT(arg: PStruct): PNeg    = PNeg(arg)
  def KC(arg: PStruct, min: Int = 1, max: Int = 0): PKleene = PKleene(arg, min, max)
  def P(etype: String, name: String): Prim = Prim(etype, name)
}

/**
 * Condition ADT (/root/reference/condition/). A binding maps event name -> bound events
 * (singleton list for plain bindings, full list for Kleene bindings).
 */
sealed trait Cond extends Serializable {
  def names: Set[String]
  def isKC: Boolean = this match {
    case _: CKCIndex | _: CKCValue | _: CKCFn => true
    case _                                    => false
  }
  /** Evaluate under a full binding. Composite short-circuit like the reference
    * (/root/reference/condition/CompositeCondition.py:22-28). */
  def eval(b: Map[String, List[Ev]]): Boolean = this match {
    case CTrue            => true
    case CAnd(cs)         => cs.forall(_.eval(b))
    case COr(cs)          => cs.exists(_.eval(b))
    case CUnary(n, f)     => b.get(n).exists(l => f(l.head))
    case CBinary(x, y, f) => (b.get(x), b.get(y)) match {
      case (Some(a), Some(c)) => f(a.head, c.head)
      case _                  => false
    }
    case r: CRel          => (b.get(r.a), b.get(r.b)) match {
      case (Some(x), Some(y)) => r.fn(x.head, y.head)
      case _                  => false
    }
    case CSimple(ns, f)   => ns.forall(b.contains) && f(ns.map(n => n -> b(n)).toMap)
    case k: CKCIndex      => b.get(k.name).exists(k.evalList)
    case k: CKCValue      => b.get(k.name).exists(k.evalList)
    case k: CKCFn         => b.get(k.name).exists(k.fn)
  }
  /** Flatten a conjunction into atomic conjuncts for node placement
    * (/root/reference/condition/CompositeCondition.py:30-64). */
  def conjuncts: List[Cond] = this match {
    case CTrue    => Nil
    case CAnd(cs) => cs.flatMap(_.conjuncts)
    case c        => List(c)
  }
}

case object CTrue extends Cond { val names: Set[String] = Set.empty }
final case class CAnd(cs: List[Cond]) extends Cond { lazy val names: Set[String] = cs.flatMap(_.names).toSet }
final case class COr(cs: List[Cond]) extends Cond { lazy val names: Set[String] = cs.flatMap(_.names).toSet }
/** Single-event predicate (pushed to the leaf, /root/reference/tree/nodes/LeafNode.py:66-80). */
final case class CUnary(name: String, fn: Ev => Boolean) extends Cond { def names = Set(name) }
/** Two-event predicate (/root/reference/condition/BaseRelationCondition.py). */
final case class CBinary(a: String, b: String, fn: (Ev, Ev) => Boolean) extends Cond { def names = Set(a, b) }

/** Typed relational operator — the ONLY condition kind the engine can reason about for
  * sorted-storage access paths, exactly like the reference's `BaseRelationCondition`
  * relop metadata (/root/reference/condition/BaseRelationCondition.py:9-181,
  * /root/reference/condition/Condition.py:12-36). */
sealed abstract class RelOp(val test: (Double, Double) => Boolean)
object RelOp {
  case object EQ extends RelOp(_ == _)
  case object NE extends RelOp(_ != _)
  case object LT extends RelOp(_ < _)
  case object LE extends RelOp(_ <= _)
  case object GT extends RelOp(_ > _)
  case object GE extends RelOp(_ >= _)
  /** The "opposite" relation: swap(op)(y, x) == op(x, y)
    * (/root/reference/condition/Condition.py:12-36 get_opposite_relation_op). */
  def swap(op: RelOp): RelOp = op match {
    case LT => GT; case GT => LT; case LE => GE; case GE => LE; case x => x
  }
}

/** Typed two-event relop: `op(getA(a), getB(b))`. Behaves exactly like the equivalent
  * CBinary under evaluation, but carries relop + key-extraction metadata so a join node
  * can keep its child buffers sorted by the key and binary-search the qualifying probe
  * range (/root/reference/tree/nodes/BinaryNode.py:168-256,
  * /root/reference/tree/PatternMatchStorage.py:144-283). */
final case class CRel(a: String, b: String, op: RelOp,
                      getA: Ev => Double, getB: Ev => Double) extends Cond {
  def names = Set(a, b)
  def fn(x: Ev, y: Ev): Boolean = op.test(getA(x), getB(y))
}
object CRel {
  /** Relop over each side's `num` payload attribute (the common case). */
  def num(a: String, b: String, op: RelOp): CRel = CRel(a, b, op, _.num, _.num)
}
/** N-ary predicate over full bindings (/root/reference/condition/Condition.py:189-226). */
final case class CSimple(ns: List[String], fn: Map[String, List[Ev]] => Boolean) extends Cond {
  def names: Set[String] = ns.toSet
}

/** KC condition comparing two indices of the KC list, or every pair at `offset`
  * (/root/reference/condition/KCCondition.py:52-152). Indices beyond bounds => false;
  * offset >= length => false; offset comparison is a ∀ over valid pairs. */
final case class CKCIndex(name: String, get: Ev => Double, relop: (Double, Double) => Boolean,
                          firstIndex: Int = -1, secondIndex: Int = -1, useOffset: Boolean = false,
                          offset: Int = 0) extends Cond {
  def names = Set(name)
  def evalList(l: List[Ev]): Boolean = {
    val arr = l.toArray
    def valid(i: Int) = i >= 0 && i < arr.length
    if (useOffset) {
      if (offset >= arr.length) return false
      var i = 0
      while (i < arr.length) {
        val j = i + offset
        if (valid(j) && !relop(get(arr(i)), get(arr(j)))) return false
        i += 1
      }
      true
    } else {
      valid(firstIndex) && valid(secondIndex) && relop(get(arr(firstIndex)), get(arr(secondIndex)))
    }
  }
}

/** KC condition comparing one index (or all items, ∀) against a constant
  * (/root/reference/condition/KCCondition.py:155-195). */
final case class CKCValue(name: String, get: Ev => Double, relop: (Double, Double) => Boolean,
                          value: Double, index: Int = -1, useIndex: Boolean = false) extends Cond {
  def names = Set(name)
  def evalList(l: List[Ev]): Boolean =
    if (useIndex) {
      index >= 0 && index < l.length && relop(get(l(index)), value)
    } else l.forall(e => relop(get(e), value))
}

/** Arbitrary predicate over the whole KC event list. */
final case class CKCFn(name: String, fn: List[Ev] => Boolean) extends Cond { def names = Set(name) }

object Cond {
  def all(cs: Cond*): Cond = CAnd(cs.toList)
  def any(cs: Cond*): Cond = COr(cs.toList)
}

/**
 * Consumption policies (/root/reference/misc/ConsumptionPolicy.py,
 * /root/reference/base/Pattern.py:151-182):
 *  - `single`: event types whose events may appear in at most one reported match
 *    (MATCH_SINGLE — enforced at the root).
 *  - `next`: event types whose events join at most one partial match at their leaf's parent
 *    node and each ancestor (MATCH_NEXT — registration propagates up,
 *    /root/reference/tree/Tree.py:117-118, /root/reference/tree/nodes/Node.py:301-308).
 *  - `contiguous`: groups of event names that must be adjacent in per-key arrival order
 *    (compiled into idx(b) == idx(a)+1 conditions).
 *  - `freeze`: while an event bound to this name is alive, no new sub-matches may start.
 */
final case class Policy(
    single: Set[String] = Set.empty,
    next: Set[String] = Set.empty,
    contiguous: List[List[String]] = Nil,
    freeze: Set[String] = Set.empty) extends Serializable

/**
 * A CEP query (/root/reference/base/Pattern.py:28-57): structure + condition + sliding
 * time window (micros, inclusive bound: lastTs - firstTs <= window) + policies +
 * optional confidence threshold for probabilistic streams.
 */
final case class Pattern(
    structure: PStruct,
    condition: Cond,
    windowMicros: Long,
    policy: Policy = Policy(),
    confidence: Double = -1.0,
    id: Int = 0) extends Serializable
