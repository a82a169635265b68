package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import PStruct._
import T._

/** Adaptive replanning: trivial tree-swap semantics
  * (/root/reference/tree/evaluation/TrivialTreeBasedEvaluationMechnism.py:15-57) and the
  * deviation-aware trigger (/root/reference/adaptive/optimizer/Optimizer.py:110-133). */
class AdaptiveSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(29)
  private def randomEvents(n: Int): Seq[Ev] = (0 until n).map { i =>
    ev(Seq("A", "B", "C")(rnd.nextInt(3)), rnd.nextInt(120), i, num = rnd.nextInt(10).toDouble)
  }.sortBy(e => (e.ts, e.idx))

  test("mid-stream plan swap: pre-swap + post-swap output equals the single-plan run") {
    val p = Pattern(SEQ(P("A", "a"), P("B", "b"), P("C", "c")),
      CBinary("a", "c", (x, y) => y.num >= x.num), 40 * MIN)
    val trivial = Compiler.compile(p, Orders.Trivial)
    val reordered = Compiler.compile(p, Orders.Fixed(IndexedSeq(2, 0, 1)))
    assert(Adaptive.fingerprint(trivial) != Adaptive.fingerprint(reordered))
    val events = randomEvents(200)
    (40 to 160 by 40).foreach { cut =>
      val (before, after) = events.splitAt(cut)
      val eng1 = new MatchEngine(trivial)
      val preSwap = before.flatMap(eng1.feed)
      // swap: serialize old state the way streaming would, migrate to the new plan
      val eng2 = Adaptive.migrate(eng1.snapshot(), reordered)
      val postSwap = after.flatMap(eng2.feed) ++ eng2.finish()
      val got = idxSets(preSwap ++ postSwap)
      val want = idxSets(cepRun(p, events))
      assert(got == want, s"swap at $cut diverged")
    }
  }

  test("migration round-trips through the state codec (fingerprint detects the old plan)") {
    val p = Pattern(AND(P("A", "a"), P("B", "b")), CTrue, 30 * MIN)
    val oldC = Compiler.compile(p, Orders.Trivial)
    val newC = Compiler.compile(p, Orders.Fixed(IndexedSeq(1, 0)))
    val events = randomEvents(80)
    val (before, after) = events.splitAt(40)
    val eng1 = new MatchEngine(oldC)
    val pre = before.flatMap(eng1.feed)
    val bytes = StateCodec.write(Adaptive.fingerprint(oldC), Vector.empty, eng1.snapshot())
    val d = StateCodec.read(bytes)
    assert(d.fp == Adaptive.fingerprint(oldC) && d.fp != Adaptive.fingerprint(newC))
    assert(d.old.isEmpty)
    val eng2 = Adaptive.migrate(d.engine, newC)
    val got = idxSets(pre ++ after.flatMap(eng2.feed) ++ eng2.finish())
    assert(got == idxSets(cepRun(p, events)))
    assert(got.nonEmpty)
  }

  test("invariant-aware optimizer replans only when a greedy choice flips") {
    val posArgs = List[PStruct](P("A", "a"), P("B", "b"), P("C", "c"))
    val pw0 = Map("A" -> 20.0, "B" -> 20.0, "C" -> 5.0)
    val sel = Map(("a", "b") -> 0.001)
    val opt = new Adaptive.InvariantAwareOptimizer(posArgs)
    assert(opt.shouldReplan(pw0, sel), "no plan yet -> always plan")
    val o0 = opt.build(pw0, sel)
    assert(o0 == Orders.resolve(Orders.Greedy(pw0, sel), posArgs))
    // 10x drift preserving every greedy choice: the deviation selector would fire,
    // the invariant check provably does not need to
    val drifted = Map("A" -> 200.0, "B" -> 220.0, "C" -> 6.0)
    val dev = new Adaptive.DeviationAwareSelector(0.5)
    dev.shouldReplan(pw0)
    assert(dev.shouldReplan(drifted), "sanity: deviation trigger fires on this drift")
    assert(!opt.shouldReplan(drifted, sel), "no invariant violated -> keep the plan")
    // small drift flipping the first choice (A now cheaper than C): replan, new order
    val flipped = Map("A" -> 4.0, "B" -> 20.0, "C" -> 5.0)
    assert(opt.shouldReplan(flipped, sel))
    assert(opt.build(flipped, sel).head == 0, "A leads after the flip")
  }

  test("invariant-aware ZStream optimizer replans only when the bracketing flips") {
    val posArgs = List[PStruct](P("A", "a"), P("B", "b"), P("C", "c"), P("D", "d"))
    val pw = Map("A" -> 100.0, "B" -> 100.0, "C" -> 100.0, "D" -> 100.0)
    val sel = Map(("a", "b") -> 0.001, ("c", "d") -> 0.001)
    val opt = new Adaptive.InvariantAwareZStreamOptimizer(posArgs)
    assert(opt.shouldReplan(pw, sel), "no plan yet -> always plan")
    val t0 = opt.build(pw, sel)
    assert(t0 == Orders.resolveTree(Orders.ZStream(pw, sel), posArgs))
    // uniform 10x drift: the deviation selector would fire, the bracketing provably holds
    val uniform = Map("A" -> 1000.0, "B" -> 1000.0, "C" -> 1000.0, "D" -> 1000.0)
    val dev = new Adaptive.DeviationAwareSelector(0.5)
    dev.shouldReplan(pw)
    assert(dev.shouldReplan(uniform), "sanity: deviation trigger fires on this drift")
    assert(!opt.shouldReplan(uniform, sel), "no invariant violated -> keep the bracketing")
    // the (a,b) pair loses its selectivity: recorded runner-up beats the bracketing
    val selDrift = Map(("c", "d") -> 0.001)
    assert(opt.shouldReplan(pw, selDrift))
    assert(opt.build(pw, selDrift) != t0, "replan yields a different bracketing")
  }

  test("deviation-aware selector fires on drift, stays quiet when stable") {
    val sel = new Adaptive.DeviationAwareSelector(0.5)
    assert(sel.shouldReplan(Map("A" -> 100.0, "B" -> 10.0))) // first sight always plans
    assert(!sel.shouldReplan(Map("A" -> 120.0, "B" -> 11.0))) // within 50%
    assert(sel.shouldReplan(Map("A" -> 100.0, "B" -> 40.0))) // B drifted 4x
    assert(!sel.shouldReplan(Map("A" -> 101.0, "B" -> 41.0))) // baseline was updated
  }

  test("migration rejects policy patterns") {
    val p = Pattern(SEQ(P("A", "a"), P("B", "b")), CTrue, 10 * MIN,
      policy = Policy(single = Set("A")))
    val c = Compiler.compile(p)
    val eng = new MatchEngine(c)
    eng.feed(ev("A", 1, 1))
    intercept[IllegalArgumentException] {
      Adaptive.migrate(eng.snapshot(), c)
    }
  }
}
