package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import PStruct._

/** MATCH_NEXT parity: expectations produced by executing the reference with
  * ConsumptionPolicy(secondary_selection_strategy=MATCH_NEXT, single=["B"]) — each B event
  * joins at most one partial match at its leaf's parent (and each ancestor). */
class PolicyNextSpec extends AnyFunSuite {

  private val SEC = 1000000L
  private def ev(line: String): Ev = {
    val Array(t, sec, v, id) = line.split(",")
    Ev("k", id.toLong, t, sec.toLong * SEC, v.toDouble, null, null)
  }
  private def run(p: Pattern, events: Seq[String]): Set[List[List[Long]]] = {
    val eng = new MatchEngine(Compiler.compile(p))
    (events.map(ev).sortBy(e => (e.ts, e.idx)).flatMap(eng.feed) ++ eng.finish())
      .map(_.binds.toList.sortBy(_.slot).map(_.evs.map(_.idx))).toSet
  }

  test("MATCH_NEXT on SEQ(A,B): reference golden (seed 310)") {
    val p = Pattern(SEQ(P("A", "a"), P("B", "b")), CTrue, 7 * 60 * SEC,
      policy = Policy(next = Set("B")))
    val events = Seq(
      "B,60,7,0", "A,120,5,1", "A,120,9,2", "B,180,2,3", "B,240,9,4", "B,240,0,5",
      "B,300,7,6", "B,300,9,7", "B,300,9,8", "A,480,1,9", "A,600,4,10", "B,600,1,11",
      "B,600,5,12", "A,600,7,13")
    val want: Set[List[List[Long]]] = Set(
      List(List(1L), List(3L)), List(List(1L), List(4L)), List(List(1L), List(5L)),
      List(List(1L), List(6L)), List(List(1L), List(7L)), List(List(1L), List(8L)),
      List(List(9L), List(11L)), List(List(9L), List(12L)))
    assert(run(p, events) == want)
  }

  test("MATCH_NEXT on SEQ(A,B,C): reference golden (seed 311)") {
    val p = Pattern(SEQ(P("A", "a"), P("B", "b"), P("C", "c")), CTrue, 7 * 60 * SEC,
      policy = Policy(next = Set("B")))
    val events = Seq(
      "B,0,8,0", "C,0,8,1", "B,60,6,2", "C,60,2,3", "C,120,4,4", "B,180,5,5",
      "A,180,2,6", "C,240,4,7", "A,240,4,8", "B,240,5,9", "C,240,1,10", "A,420,7,11",
      "C,420,4,12", "C,540,3,13", "B,540,1,14")
    val want: Set[List[List[Long]]] = Set(
      List(List(6L), List(14L), List(13L)),
      List(List(6L), List(5L), List(7L)),
      List(List(6L), List(9L), List(7L)))
    assert(run(p, events) == want)
  }
}
