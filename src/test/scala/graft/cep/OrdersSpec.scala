package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import PStruct._
import T._

/** Join-order selection (reference plan/LeftDeepTreeBuilders.py + plan/TreeCostModel.py):
  * order changes plans, never outputs. */
class OrdersSpec extends AnyFunSuite {

  private def run(p: Pattern, events: Seq[Ev], strategy: Orders.Strategy): Set[List[List[Long]]] =
    idxSets(events.groupBy(_.key).values.toSeq.flatMap { perKey =>
      val eng = new MatchEngine(Compiler.compile(p, strategy))
      perKey.sortBy(e => (e.ts, e.idx)).flatMap(eng.feed) ++ eng.finish()
    })

  private val rnd = new scala.util.Random(3)
  private def randomEvents(n: Int): Seq[Ev] = (0 until n).map { i =>
    ev(Seq("A", "B", "C", "D")(rnd.nextInt(4)), rnd.nextInt(200), i,
      key = s"k${rnd.nextInt(2)}", num = rnd.nextInt(10).toDouble)
  }

  test("every join order yields the same output (SEQ / AND / NOT / KC / conditions)") {
    val patterns = Seq(
      Pattern(SEQ(P("A", "a"), P("B", "b"), P("C", "c")), CTrue, 40 * MIN),
      Pattern(SEQ(P("A", "a"), P("B", "b"), P("C", "c")),
        CBinary("a", "c", (x, y) => y.num > x.num), 40 * MIN),
      Pattern(AND(P("A", "a"), P("B", "b"), P("C", "c")), CTrue, 30 * MIN),
      Pattern(SEQ(P("A", "a"), NOT(P("D", "d")), P("B", "b"), P("C", "c")), CTrue, 40 * MIN),
      Pattern(SEQ(P("A", "a"), KC(P("B", "b"), min = 1, max = 2), P("C", "c")), CTrue, 30 * MIN))
    val events = randomEvents(150)
    patterns.foreach { p =>
      val trivial = run(p, events, Orders.Trivial)
      assert(trivial.nonEmpty, s"want matches for $p")
      val k = p.structure match {
        case PSeq(as) => as.count(!_.isInstanceOf[PNeg]); case PAnd(as) => as.length; case _ => 1
      }
      (0 until k).toList.permutations.foreach { perm =>
        assert(run(p, events, Orders.Fixed(perm.toIndexedSeq)) == trivial,
          s"order $perm diverged for $p")
      }
    }
  }

  test("ascending-rate and greedy orders put the rare type first; cost model agrees") {
    val posArgs = List[PStruct](P("HIGH1", "a"), P("HIGH2", "b"), P("RARE", "c"))
    val perWindow = Map("HIGH1" -> 100.0, "HIGH2" -> 80.0, "RARE" -> 2.0)
    assert(Orders.resolve(Orders.AscendingRate(perWindow), posArgs) == IndexedSeq(2, 1, 0))
    val greedy = Orders.resolve(Orders.Greedy(perWindow), posArgs)
    assert(greedy.head == 2, s"greedy should start at the rare arg, got $greedy")
    val costTrivial = Orders.leftDeepCost(IndexedSeq(0, 1, 2), posArgs, perWindow)
    val costGreedy = Orders.leftDeepCost(greedy, posArgs, perWindow)
    assert(costGreedy < costTrivial,
      s"greedy cost $costGreedy should beat trivial $costTrivial")
  }

  test("greedy uses cross-arg selectivities, not just rates") {
    val posArgs = List[PStruct](P("X", "x"), P("Y", "y"), P("Z", "z"))
    val perWindow = Map("X" -> 10.0, "Y" -> 10.0, "Z" -> 9.0)
    // a crushing x-y selectivity makes (z, then x, then y) worse than grouping x with y
    val sel = Map(("x", "y") -> 0.001)
    val greedy = Orders.resolve(Orders.Greedy(perWindow, sel), posArgs)
    val costGreedy = Orders.leftDeepCost(greedy, posArgs, perWindow, sel)
    val costNaive = Orders.leftDeepCost(IndexedSeq(2, 0, 1), posArgs, perWindow, sel)
    assert(costGreedy <= costNaive)
  }

  test("DP left-deep and DP bushy yield the same output as every permutation") {
    val sel = Map(("a", "b") -> 0.2, ("c", "d") -> 0.2)
    val pw = Map("A" -> 10.0, "B" -> 10.0, "C" -> 10.0, "D" -> 10.0)
    val patterns = Seq(
      Pattern(SEQ(P("A", "a"), P("B", "b"), P("C", "c"), P("D", "d")),
        Cond.all(CRel.num("a", "b", RelOp.LT), CRel.num("c", "d", RelOp.GT)), 60 * MIN),
      Pattern(AND(P("A", "a"), P("B", "b"), P("C", "c"), P("D", "d")),
        CBinary("a", "d", (x, y) => y.num >= x.num), 40 * MIN),
      Pattern(SEQ(P("A", "a"), KC(P("B", "b"), min = 1, max = 2), P("C", "c"), P("D", "d")),
        CTrue, 30 * MIN))
    val events = randomEvents(120)
    patterns.foreach { p =>
      val trivial = run(p, events, Orders.Trivial)
      assert(trivial.nonEmpty, s"want matches for $p")
      assert(run(p, events, Orders.DpLeftDeep(pw, sel)) == trivial, s"DP left-deep diverged for $p")
      assert(run(p, events, Orders.DpBushy(pw, sel)) == trivial, s"DP bushy diverged for $p")
    }
  }

  test("DP left-deep is optimal among left-deep orders; bushy beats all left-deep on cross-pairs") {
    // two selective CROSS pairs: (a,b) tight, (c,d) tight, nothing across the pairs —
    // a left-deep tree can bracket one pair but must then join the other one arg at a
    // time through a huge intermediate; bushy (a⋈b)⋈(c⋈d) keeps both sides small
    val posArgs = List[PStruct](P("A", "a"), P("B", "b"), P("C", "c"), P("D", "d"))
    val pw = Map("A" -> 100.0, "B" -> 100.0, "C" -> 100.0, "D" -> 100.0)
    val sel = Map(("a", "b") -> 0.001, ("c", "d") -> 0.001)
    val allPerms = (0 until 4).toList.permutations.map(_.toIndexedSeq).toList
    val bestLd = allPerms.map(o => Orders.leftDeepCost(o, posArgs, pw, sel)).min
    val dpLd = Orders.resolve(Orders.DpLeftDeep(pw, sel), posArgs)
    assert(Orders.leftDeepCost(dpLd, posArgs, pw, sel) == bestLd,
      "DP left-deep must match the best permutation's cost")
    val bushy = Orders.resolveTree(Orders.DpBushy(pw, sel), posArgs)
    val bushyCost = Orders.treeCost(bushy, posArgs, pw, sel)
    assert(bushyCost < bestLd,
      s"bushy cost $bushyCost should beat the best left-deep $bestLd")
    // the chosen shape is the expected pair-of-pairs
    def spine(t: Orders.JTree): Set[Set[Int]] = t match {
      case Orders.JLeaf(_)    => Set.empty
      case n @ Orders.JNode(l, r) => spine(l) ++ spine(r) + n.indices.toSet
    }
    assert(spine(bushy).contains(Set(0, 1)) && spine(bushy).contains(Set(2, 3)),
      s"expected (a,b) and (c,d) sub-joins, got $bushy")
    // treeCost on a left-deep spine agrees with leftDeepCost (model consistency)
    val spineTree = Orders.resolveTree(Orders.Fixed(IndexedSeq(0, 1, 2, 3)), posArgs)
    assert(math.abs(Orders.treeCost(spineTree, posArgs, pw, sel) -
      Orders.leftDeepCost(IndexedSeq(0, 1, 2, 3), posArgs, pw, sel)) < 1e-9)
  }

  test("non-trivial order is rejected for policy patterns") {
    val p = Pattern(SEQ(P("A", "a"), P("B", "b")), CTrue, 10 * MIN,
      policy = Policy(single = Set("A")))
    intercept[IllegalArgumentException] {
      Compiler.compile(p, Orders.Fixed(IndexedSeq(1, 0)))
    }
  }
}
