package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import PStruct._
import T._
import scala.util.Random

/**
 * Local-search multi-pattern plan merging
 * (/root/reference/plan/multi/local_search/LocalSearch.py:15-45): the searched trees must
 * (a) discover a shared bracket that the INDIVIDUAL optimum rejects when the global
 * (sharing-aware) cost favors it, (b) actually engage the engine's subtree sharing when
 * compiled, and (c) leave outputs invariant.
 */
class MultiPlanSpec extends AnyFunSuite {

  private val W = 120 * MIN
  // shared condition OBJECT between a and b: sharing compares lambdas by reference
  private val abCond = CRel.num("a", "b", RelOp.LT)
  private def tailCond(n: String) = CRel.num("a", n, RelOp.GT)

  // SEQ(A a, B b, X x): A/B are heavy (100/window), the tail is rare (1/window) with a
  // very selective (a, x) condition — the individually optimal bushy plan starts from the
  // tail (cost ~202), bracketing (A, B) costs ~301; but (A, B) shared across 3 patterns
  // saves ~2x300, so the global optimum brackets it everywhere.
  private def pat(third: String, name: String, id: Int): Pattern =
    Pattern(SEQ(P("A", "a"), P("B", "b"), P(third, name)),
      Cond.all(abCond, tailCond(name)), W, id = id)

  private val ps = Seq(pat("C", "c", 0), pat("D", "d", 1), pat("E", "e", 2))
  private val pw = Map("A" -> 100.0, "B" -> 100.0, "C" -> 1.0, "D" -> 1.0, "E" -> 1.0)
  private val sel = Map(("a", "b") -> 0.01,
    ("a", "c") -> 0.001, ("a", "d") -> 0.001, ("a", "e") -> 0.001)

  private def bracketsAB(t: Orders.JTree): Boolean = {
    def sub(tr: Orders.JTree): List[Orders.JTree] = tr match {
      case Orders.JLeaf(_)        => List(tr)
      case n @ Orders.JNode(l, r) => n :: sub(l) ::: sub(r)
    }
    sub(t).exists(_.indices.toSet == Set(0, 1))
  }

  test("search brackets the shared (A,B) pair that the individual optimum rejects") {
    ps.foreach { p =>
      val indiv = Orders.resolveTree(Orders.DpBushy(pw, sel),
        p.structure.asInstanceOf[PSeq].args)
      assert(!bracketsAB(indiv), s"test premise: individual optimum must NOT bracket (A,B), got $indiv")
    }
    val strategies = MultiPlan.localSearch(ps, pw, sel, steps = 80, seed = 5)
    assert(strategies.length == 3)
    strategies.foreach {
      case Orders.FixedTree(t) => assert(bracketsAB(t), s"shared bracket missing in $t")
      case other               => fail(s"expected FixedTree, got $other")
    }
  }

  test("searched plans engage engine subtree sharing and keep outputs invariant") {
    val strategies = MultiPlan.localSearch(ps, pw, sel, steps = 80, seed = 5)
    val compiled = ps.zip(strategies).flatMap { case (p, s) => Compiler.compile(p, s) }.toIndexedSeq
    val tables = MatchEngine.tablesFor(compiled)
    assert(!tables.sharing.isEmpty, "local-search plans must trigger runtime subtree sharing")
    assert(tables.sharing.aliases.map(_.size).sum >= 2,
      "both follower patterns should alias the host's (A,B) buffer")

    val rnd = new Random(11)
    val events = (0 until 400).map { i =>
      ev(Seq("A", "B", "C", "D", "E")(rnd.nextInt(5)), rnd.nextInt(600), i,
        num = rnd.nextInt(12).toDouble)
    }.sortBy(e => (e.ts, e.idx))
    def run(c: IndexedSeq[CompiledPattern]): Set[(Int, List[List[Long]])] = {
      val eng = new MatchEngine(c)
      val ms = events.flatMap(eng.feed) ++ eng.finish()
      ms.map(m => (m.patternId, m.binds.toList.sortBy(_.slot).map(_.evs.map(_.idx)))).toSet
    }
    val want = run(ps.flatMap(Compiler.compile(_)).toIndexedSeq)
    assert(want.nonEmpty)
    assert(run(compiled) == want)
  }

  test("driver query cep_merged_vc2's plans bracket and share the (view, click) prefix") {
    val H = 3600L * 1000000L
    val seq3 = Pattern(SEQ(P("view", "v"), P("click", "c"), P("purchase", "b")), CTrue, 24 * H, id = 0)
    val vc2 = Pattern(SEQ(P("view", "v"), P("click", "c")), CTrue, 24 * H, id = 1)
    val pw2 = Map("view" -> 40.0, "click" -> 40.0, "purchase" -> 5.0)
    val strategies = MultiPlan.localSearch(Seq(seq3, vc2), pw2)
    strategies.foreach {
      case Orders.FixedTree(t) => assert(bracketsAB(t), s"(v,c) bracket missing in $t")
      case other               => fail(s"expected FixedTree, got $other")
    }
    val compiled = Seq(seq3, vc2).zip(strategies)
      .flatMap { case (p, s) => Compiler.compile(p, s) }.toIndexedSeq
    assert(!MatchEngine.tablesFor(compiled).sharing.isEmpty,
      "the merged (view, click) subtree must buffer once across both patterns")
  }

  test("tabu search finds the shared bracket too, and outputs stay invariant") {
    val strategies = MultiPlan.localSearch(ps, pw, sel, steps = 40, seed = 5, tabu = true)
    strategies.foreach {
      case Orders.FixedTree(t) => assert(bracketsAB(t), s"tabu: shared bracket missing in $t")
      case other               => fail(s"expected FixedTree, got $other")
    }
    val compiled = ps.zip(strategies).flatMap { case (p, s) => Compiler.compile(p, s) }.toIndexedSeq
    assert(!MatchEngine.tablesFor(compiled).sharing.isEmpty,
      "tabu-searched plans must trigger runtime subtree sharing")
    val rnd = new Random(13)
    val events = (0 until 300).map { i =>
      ev(Seq("A", "B", "C", "D", "E")(rnd.nextInt(5)), rnd.nextInt(600), i,
        num = rnd.nextInt(12).toDouble)
    }.sortBy(e => (e.ts, e.idx))
    def run(c: IndexedSeq[CompiledPattern]): Set[(Int, List[List[Long]])] = {
      val eng = new MatchEngine(c)
      val ms = events.flatMap(eng.feed) ++ eng.finish()
      ms.map(m => (m.patternId, m.binds.toList.sortBy(_.slot).map(_.evs.map(_.idx)))).toSet
    }
    val want = run(ps.flatMap(Compiler.compile(_)).toIndexedSeq)
    assert(want.nonEmpty)
    assert(run(compiled) == want)
  }

  test("search leaves ineligible patterns on safe defaults") {
    val withPolicy = pat("C", "c", 0).copy(policy = Policy(single = Set("A")))
    val strategies = MultiPlan.localSearch(Seq(withPolicy, pat("D", "d", 1)), pw, sel)
    // a lone eligible pattern has no peer: both fall back without error
    assert(strategies.length == 2)
    val compiled = Seq(withPolicy, pat("D", "d", 1)).zip(strategies)
      .flatMap { case (p, s) => Compiler.compile(p, s) }
    assert(compiled.nonEmpty)
  }
}
