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

  test("non-trivial order is rejected for policy patterns") {
    val p = Pattern(SEQ(P("A", "a"), P("B", "b")), CTrue, 10 * MIN,
      policy = Policy(single = Set("A")))
    intercept[IllegalArgumentException] {
      Compiler.compile(p, Orders.Fixed(IndexedSeq(1, 0)))
    }
  }
}
