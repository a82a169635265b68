package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import PStruct._
import scala.util.Random

/**
 * Multi-pattern subtree sharing (the SubTreeSharingTreePlanMerger analogue,
 * /root/reference/plan/multi/SubTreeSharingTreePlanMerger.py:5-13): patterns with an
 * equivalent subtree buffer its partial matches ONCE. The contract tested here is output
 * invariance — the jointly-evaluated (shared) engine emits exactly the union of the
 * per-pattern independent runs — plus the structural assertions that sharing actually
 * engaged (follower leaves removed from dispatch, buffers aliased) and that streaming
 * snapshot/restore round-trips shared state without duplication.
 */
class SharingSpec extends AnyFunSuite {
  import T._

  private val W = 60 * MIN
  // one shared condition OBJECT — sharing keys conditions by case-class equality, which
  // is reference equality for the lambda inside CRel
  private val abLt = CRel.num("a", "b", RelOp.LT)

  private def prefix2(third: String, name: String, id: Int): Pattern =
    Pattern(SEQ(P("A", "a"), P("B", "b"), P(third, name)), abLt, W, id = id)

  private def jointRun(ps: Seq[Pattern], events: Seq[Ev]): Set[(Int, List[List[Long]])] = {
    val compiled = ps.flatMap(Compiler.compile).toIndexedSeq
    val eng = new MatchEngine(compiled)
    val ms = events.sortBy(e => (e.ts, e.idx)).flatMap(eng.feed) ++ eng.finish()
    ms.map(m => (m.patternId, m.binds.toList.sortBy(_.slot).map(_.evs.map(_.idx)))).toSet
  }

  private def separateRun(ps: Seq[Pattern], events: Seq[Ev]): Set[(Int, List[List[Long]])] =
    ps.flatMap { p =>
      val eng = new MatchEngine(Compiler.compile(p))
      val ms = events.sortBy(e => (e.ts, e.idx)).flatMap(eng.feed) ++ eng.finish()
      ms.map(m => (m.patternId, m.binds.toList.sortBy(_.slot).map(_.evs.map(_.idx))))
    }.toSet

  test("shared SEQ(A,B) prefix: follower leaves leave the dispatch; buffers alias the host") {
    val ps = Seq(prefix2("C", "c", 0), prefix2("D", "d", 1))
    val compiled = ps.flatMap(Compiler.compile).toIndexedSeq
    val tables = MatchEngine.tablesFor(compiled)
    assert(!tables.sharing.isEmpty, "equivalent SEQ(A,B) prefixes must share")
    // follower (rt 1) aliases exactly one node — the Bin(A,B) subtree root — and its
    // A/B leaves are dead (host plays them for both patterns)
    assert(tables.sharing.aliases(0).isEmpty && tables.sharing.aliases(1).size == 1)
    val deadLeaves1 = tables.sharing.deadLeaves(1)
    val abLeafIds1 = compiled(1).nodes.collect {
      case l: LeafSpec if l.etype == "A" || l.etype == "B" => l.id
    }
    assert(abLeafIds1.forall(deadLeaves1.contains))
    // dispatch for A/B now routes to ONE runtime's leaves
    Seq("A", "B").foreach { et =>
      val entries = tables.sharedDispatch.byType(et)
      assert(entries.length == 1 && entries.head.rtIdx == 0,
        s"type $et should play only on the host pattern's leaf")
    }
    // C/D leaves stay per-pattern
    assert(tables.sharedDispatch.byType("C").length == 1)
    assert(tables.sharedDispatch.byType("D").length == 1)
  }

  test("shared prefix: joint output == union of independent runs (randomized, with ties)") {
    val ps = Seq(prefix2("C", "c", 0), prefix2("D", "d", 1))
    val rnd = new Random(11)
    (1 to 20).foreach { trial =>
      val events = (0 until 60).map { i =>
        val et = Seq("A", "B", "C", "D")(rnd.nextInt(4))
        // coarse minutes force frequent timestamp ties (the SEQ tie rule is order-sensitive)
        ev(et, rnd.nextInt(12).toDouble, i, num = rnd.nextInt(5).toDouble)
      }
      assert(jointRun(ps, events) == separateRun(ps, events), s"trial $trial diverged")
    }
  }

  test("shared Kleene subtree: joint == separate (aggregate identities preserved)") {
    val kc1 = Pattern(SEQ(KC(P("A", "k"), min = 1, max = 3), P("B", "b")), CTrue, W, id = 0)
    val kc2 = Pattern(SEQ(KC(P("A", "k"), min = 1, max = 3), P("C", "c")), CTrue, W, id = 1)
    val tables = MatchEngine.tablesFor((Compiler.compile(kc1) ++ Compiler.compile(kc2)).toIndexedSeq)
    assert(!tables.sharing.isEmpty, "equivalent KC subtrees must share")
    val rnd = new Random(12)
    (1 to 20).foreach { trial =>
      val events = (0 until 25).map { i =>
        ev(Seq("A", "A", "B", "C")(rnd.nextInt(4)), rnd.nextInt(10).toDouble, i)
      }
      assert(jointRun(Seq(kc1, kc2), events) == separateRun(Seq(kc1, kc2), events),
        s"trial $trial diverged")
    }
  }

  test("positive prefix shares under a negation pattern (NegSpec itself never shared)") {
    val pPos = prefix2("C", "c", 0)
    val pNeg = Pattern(SEQ(P("A", "a"), P("B", "b"), NOT(P("E", "e"))), abLt, W, id = 1)
    val compiled = (Compiler.compile(pPos) ++ Compiler.compile(pNeg)).toIndexedSeq
    val tables = MatchEngine.tablesFor(compiled)
    assert(!tables.sharing.isEmpty, "the positive SEQ(A,B) prefix under NOT must share")
    val rnd = new Random(13)
    (1 to 20).foreach { trial =>
      val events = (0 until 50).map { i =>
        ev(Seq("A", "B", "C", "E")(rnd.nextInt(4)), rnd.nextInt(12).toDouble, i,
          num = rnd.nextInt(5).toDouble)
      }
      assert(jointRun(Seq(pPos, pNeg), events) == separateRun(Seq(pPos, pNeg), events),
        s"trial $trial diverged")
    }
  }

  test("policies and sorted storage disable sharing (buffers must stay private)") {
    val pol = Pattern(SEQ(P("A", "a"), P("B", "b"), P("C", "c")), abLt, W, id = 0,
      policy = Policy(single = Set("A")))
    val plain = prefix2("D", "d", 1)
    val compiled = (Compiler.compile(pol) ++ Compiler.compile(plain)).toIndexedSeq
    assert(MatchEngine.tablesFor(compiled).sharing.isEmpty,
      "a pattern with a consumption policy must not participate in sharing")
    // sortedStorage bypasses sharing at the engine level: outputs still correct
    val ps = Seq(prefix2("C", "c", 0), prefix2("D", "d", 1))
    val sortedEng = new MatchEngine(ps.flatMap(Compiler.compile).toIndexedSeq, sortedStorage = true)
    val events = (0 until 40).map(i => ev(Seq("A", "B", "C", "D")(i % 4), i.toDouble, i,
      num = (i % 5).toDouble))
    val got = (events.flatMap(sortedEng.feed) ++ sortedEng.finish())
      .map(m => (m.patternId, m.binds.toList.sortBy(_.slot).map(_.evs.map(_.idx)))).toSet
    assert(got == separateRun(ps, events))
  }

  test("snapshot/restore round-trips shared state (no duplication, no loss)") {
    val ps = Seq(prefix2("C", "c", 0), prefix2("D", "d", 1))
    val compiled = ps.flatMap(Compiler.compile).toIndexedSeq
    val rnd = new Random(14)
    (1 to 10).foreach { trial =>
      val events = (0 until 60).map { i =>
        ev(Seq("A", "B", "C", "D")(rnd.nextInt(4)), (i / 2).toDouble, i,
          num = rnd.nextInt(5).toDouble)
      }
      val cut = 10 + rnd.nextInt(40)
      val eng1 = new MatchEngine(compiled)
      val out1 = events.take(cut).flatMap(eng1.feed)
      val snap = eng1.snapshot()
      val eng2 = new MatchEngine(compiled)
      eng2.restore(snap)
      val out2 = out1 ++ events.drop(cut).flatMap(eng2.feed) ++ eng2.finish()
      val whole = new MatchEngine(compiled)
      val ref = events.flatMap(whole.feed) ++ whole.finish()
      def sig(ms: Seq[CepMatch]) =
        ms.map(m => (m.patternId, m.binds.toList.sortBy(_.slot).map(_.evs.map(_.idx)))).toSet
      assert(sig(out2) == sig(ref), s"trial $trial diverged after snapshot/restore")
      assert(out2.size == ref.size, s"trial $trial duplicated matches")
    }
  }
}
