package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import PStruct._

class RewritesAndSheddingSpec extends AnyFunSuite {
  import T._

  test("rewrites: flatten, double negation, De Morgan, to fixpoint") {
    assert(Rewrites.normalize(AND(P("A", "a"), AND(P("B", "b"), P("C", "c")))) ==
      PAnd(List(P("A", "a"), P("B", "b"), P("C", "c"))))
    assert(Rewrites.normalize(NOT(NOT(P("A", "a")))) == P("A", "a"))
    assert(Rewrites.normalize(NOT(AND(P("A", "a"), P("B", "b")))) ==
      POr(List(NOT(P("A", "a")), NOT(P("B", "b")))))
    assert(Rewrites.normalize(NOT(OR(P("A", "a"), NOT(P("B", "b"))))) ==
      PAnd(List(NOT(P("A", "a")), P("B", "b"))))
  }

  test("rewritten pattern evaluates identically (flatten case)") {
    val nested = Pattern(AND(P("A", "a"), AND(P("B", "b"), P("C", "c"))), CTrue, 60 * MIN)
    val flat = nested.copy(structure = Rewrites.normalize(nested.structure))
    val evs = Seq(ev("A", 1, 1), ev("B", 2, 2), ev("C", 3, 3), ev("B", 4, 4))
    assert(idxSets(cepRun(nested, evs)) == idxSets(cepRun(flat, evs)))
  }

  test("load shedding caps partial-match state and degrades gracefully") {
    val p = Pattern(SEQ(P("A", "a"), P("B", "b")), CTrue, 600 * MIN)
    val evs = (1 to 50).map(i => ev("A", i, i)) :+ ev("B", 60, 60)
    // unlimited: every A pairs with the B
    val full = {
      val e = new MatchEngine(Compiler.compile(p))
      (evs.flatMap(e.feed) ++ e.finish()).size
    }
    assert(full == 50)
    // cap 10: at most 10 buffered A partial matches survive at probe time
    val shed = {
      val e = new MatchEngine(Compiler.compile(p), shedCap = 10)
      (evs.flatMap(e.feed) ++ e.finish()).size
    }
    assert(shed == 10, s"expected exactly the capped buffer to match, got $shed")
  }
}
