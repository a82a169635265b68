package graft.cep

/**
 * Pattern rewrite rules (/root/reference/transformation/PatternTransformer.py:37-151),
 * applied to fixpoint. OFF by default, exactly like the reference
 * (PREPROCESSING_RULES_ORDER = None, /root/reference/misc/DefaultConfig.py:52-62) — the
 * compiler's OR expansion is the only always-on transformation. These are available for
 * callers that want normalized patterns (e.g. to improve multi-pattern sharing).
 */
object Rewrites {

  /** One full rewrite pass: flatten same-operator nesting, drop double negation,
    * De Morgan over negated composites, pull ORs to the top. */
  def normalize(s: PStruct): PStruct = fixpoint(s)(step)

  private def fixpoint(s: PStruct)(f: PStruct => PStruct): PStruct = {
    var cur = s
    var next = f(cur)
    var fuel = 100
    while (next != cur && fuel > 0) { cur = next; next = f(cur); fuel -= 1 }
    next
  }

  private def step(s: PStruct): PStruct = s match {
    // AND(A, AND(B, C)) -> AND(A, B, C); same for OR (an inner SEQ inside SEQ is NOT
    // flattened: SEQ nesting affects the merged slot-order check only through coverage,
    // and the reference's InnerOperator rule also only flattens AND/OR)
    case PAnd(args) =>
      PAnd(args.map(step).flatMap { case PAnd(inner) => inner; case a => List(a) })
    case POr(args) =>
      POr(args.map(step).flatMap { case POr(inner) => inner; case a => List(a) })
    // NOT(NOT(x)) -> x
    case PNeg(PNeg(inner)) => step(inner)
    // De Morgan: NOT(AND(...)) -> OR(NOT(...)); NOT(OR(...)) -> AND(NOT(...))
    case PNeg(PAnd(args)) => POr(args.map(a => PNeg(step(a))))
    case PNeg(POr(args))  => PAnd(args.map(a => PNeg(step(a))))
    case PNeg(inner)      => PNeg(step(inner))
    case PSeq(args)       => PSeq(args.map(step))
    case PKleene(a, mn, mx) => PKleene(step(a), mn, mx)
    case p: Prim          => p
  }
}
