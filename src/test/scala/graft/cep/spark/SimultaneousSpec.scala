package graft.cep.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.cep._
import graft.cep.PStruct._
import graft.cep.T._

/**
 * In-flight simultaneous plan swap
 * (/root/reference/tree/evaluation/SimultaneousTreeBasedEvaluationMechanism.py:14-92):
 * driven at the [[StreamEvaluator.step]] level — batches of watermark-complete events,
 * state round-tripping through the codec between visits exactly as the state store would.
 * Assertions compare MULTISETS of matches (not sets) so a double emission during the
 * transition fails the test.
 */
class SimultaneousSpec extends AnyFunSuite {

  private def canonMulti(ms: Seq[CepMatch]): Seq[List[(Int, List[Long])]] =
    ms.map(_.binds.toList.sortBy(_.slot).map(b => (b.slot, b.evs.map(_.idx)))).sortBy(_.toString)

  /** Replay `events` through step() in `batches` watermark-complete slices, swapping the
    * compiled plan (with `previous` available) at batch index `swapAt`. */
  private def streamRun(events: Seq[Ev], newC: IndexedSeq[CompiledPattern],
                        oldC: IndexedSeq[CompiledPattern], swapAt: Int, batches: Int,
                        windowMicros: Long): Seq[CepMatch] = {
    val sorted = events.sortBy(e => (e.ts, e.idx)).toVector
    val slices = sorted.grouped(math.max(1, sorted.size / batches)).toVector
    val maxWindowMs = windowMicros / 1000L
    var state: Option[Array[Byte]] = None
    val out = Vector.newBuilder[CepMatch]
    var wmMs = 0L
    slices.zipWithIndex.foreach { case (slice, i) =>
      // watermark = min ts of this slice: everything previously delivered is complete
      wmMs = slice.head.ts / 1000L
      val (compiled, old) =
        if (i < swapAt) (oldC, None) else (newC, Some(oldC))
      val res = StreamEvaluator.step(compiled, maxWindowMs, assumeOrdered = false,
        state, slice, wmMs, old)
      out ++= res.matches
      state = res.state
    }
    // final watermark far past every event: all holds feed, all parked matches release,
    // any live transition retires
    var guard = 0
    while (state.isDefined && guard < 4) {
      wmMs = sorted.last.ts / 1000L + 20 * maxWindowMs
      val res = StreamEvaluator.step(newC, maxWindowMs, assumeOrdered = false,
        state, Vector.empty, wmMs, Some(oldC))
      out ++= res.matches
      state = res.state
      guard += 1
    }
    out.result()
  }

  private val rnd = new scala.util.Random(31)
  private def randomEvents(n: Int): Seq[Ev] = (0 until n).map { i =>
    ev(Seq("A", "B", "C")(rnd.nextInt(3)), rnd.nextInt(240), i, num = rnd.nextInt(8).toDouble)
  }

  test("simultaneous swap: SEQ output equals the single-plan run at every cut, no dups") {
    val W = 40 * MIN
    val p = Pattern(SEQ(P("A", "a"), P("B", "b"), P("C", "c")),
      CBinary("a", "c", (x, y) => y.num >= x.num), W)
    val oldC = Compiler.compile(p, Orders.Trivial)
    val newC = Compiler.compile(p, Orders.Fixed(IndexedSeq(2, 0, 1)))
    assert(Adaptive.fingerprint(oldC) != Adaptive.fingerprint(newC))
    val events = randomEvents(300)
    val want = canonMulti(cepRun(p, events))
    assert(want.nonEmpty)
    (1 until 10 by 2).foreach { swapAt =>
      val got = canonMulti(streamRun(events, newC, oldC, swapAt, batches = 10, W))
      assert(got == want, s"simultaneous swap at batch $swapAt diverged")
    }
  }

  test("simultaneous swap hands over parked unbounded-negation matches exactly once") {
    val W = 40 * MIN
    // NOT at the end of a SEQ: positive pairs park until the window passes without a C
    val p = Pattern(SEQ(P("A", "a"), P("B", "b"), NOT(P("C", "c"))), CTrue, W)
    val oldC = Compiler.compile(p, Orders.Trivial)
    val newC = Compiler.compile(p, Orders.Fixed(IndexedSeq(1, 0)))
    assert(Adaptive.fingerprint(oldC) != Adaptive.fingerprint(newC))
    val events = randomEvents(300)
    val want = canonMulti(cepRun(p, events))
    assert(want.nonEmpty)
    (1 until 10 by 2).foreach { swapAt =>
      val got = canonMulti(streamRun(events, newC, oldC, swapAt, batches = 10, W))
      assert(got == want, s"negation swap at batch $swapAt diverged")
    }
  }

  test("swap with no previousOrder falls back to leaf-replay migration (same output)") {
    val W = 40 * MIN
    val p = Pattern(SEQ(P("A", "a"), P("B", "b"), P("C", "c")), CTrue, W)
    val oldC = Compiler.compile(p, Orders.Trivial)
    val newC = Compiler.compile(p, Orders.Fixed(IndexedSeq(2, 0, 1)))
    val events = randomEvents(200).sortBy(e => (e.ts, e.idx)).toVector
    val (before, after) = events.splitAt(100)
    val maxWindowMs = W / 1000L
    var state: Option[Array[Byte]] = None
    val out = Vector.newBuilder[CepMatch]
    val r1 = StreamEvaluator.step(oldC, maxWindowMs, assumeOrdered = true, state, before,
      before.last.ts / 1000L, None)
    out ++= r1.matches
    // restart under newC WITHOUT oldCompiled: fingerprint mismatch -> replay migration
    val r2 = StreamEvaluator.step(newC, maxWindowMs, assumeOrdered = true, r1.state, after,
      events.last.ts / 1000L + 20 * maxWindowMs, None)
    out ++= r2.matches
    assert(canonMulti(out.result()) == canonMulti(cepRun(p, events)))
  }
}
