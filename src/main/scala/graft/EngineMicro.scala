package graft

import graft.cep._
import graft.cep.PStruct._

/** Pure-JVM engine micro-bench, replicating Bench part 1b's corpora and legs (budget
  * profile sizes, microDiv=2) without the Spark blocks — the before/after instrument for
  * engine-internal optimization. args: [reps]. Prints per-leg min over reps. */
object EngineMicro {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val microDiv = 2
    def engRun(compiled: IndexedSeq[CompiledPattern], events: Array[Ev],
               sorted: Boolean): (Long, Double) = {
      val t0 = System.nanoTime()
      val eng = new MatchEngine(compiled, sortedStorage = sorted)
      var m = 0L
      events.foreach(e => m += eng.feed(e).size)
      m += eng.finish().size
      (m, (System.nanoTime() - t0) / 1e9)
    }
    val rndR = new scala.util.Random(5)
    val reorderEvents = Array.tabulate(20000 / microDiv) { i =>
      val et = if (rndR.nextInt(200) == 0) "C" else if (rndR.nextBoolean()) "A" else "B"
      Ev("k", i, et, i.toLong * 1000000L, rndR.nextInt(1000).toDouble, null, null)
    }
    val seqP = Pattern(SEQ(P("A", "a"), P("B", "b"), P("C", "c")), CTrue, 200L * 1000000L)
    val trivialC = Compiler.compile(seqP, Orders.Trivial)
    val greedyC = Compiler.compile(seqP,
      Orders.Greedy(Map("A" -> 100.0, "B" -> 100.0, "C" -> 1.0)))
    val rndS = new scala.util.Random(6)
    val sortedEvents = Array.tabulate(15000 / microDiv) { i =>
      val num =
        if (i % 2 == 0) { if (i % 100 == 0) 0.0 else 900.0 + rndS.nextInt(100) }
        else rndS.nextInt(100).toDouble
      Ev("k", i, if (i % 2 == 0) "A" else "B", i.toLong * 1000000L, num, null, null)
    }
    val relP = Pattern(SEQ(P("A", "a"), P("B", "b")), CRel.num("a", "b", RelOp.LT), 3000L * 1000000L)
    val relC = Compiler.compile(relP)
    val rndB = new scala.util.Random(8)
    val bushyEvents = Array.tabulate(24000 / microDiv) { i =>
      Ev("k", i, Seq("A", "B", "C", "D")(i % 4), i.toLong * 1000000L,
        rndB.nextInt(300).toDouble, null, null)
    }
    val bushyP = Pattern(SEQ(P("A", "a"), P("B", "b"), P("C", "c"), P("D", "d")),
      Cond.all(CRel.num("a", "b", RelOp.EQ), CRel.num("c", "d", RelOp.EQ)), 300L * 1000000L)
    val pwB = Map("A" -> 75.0, "B" -> 75.0, "C" -> 75.0, "D" -> 75.0)
    val selB = Map(("a", "b") -> 1 / 300.0, ("c", "d") -> 1 / 300.0)
    val greedy4C = Compiler.compile(bushyP, Orders.Greedy(pwB, selB))
    val bushy4C = Compiler.compile(bushyP, Orders.DpBushy(pwB, selB))
    val rndN = new scala.util.Random(9)
    val negEvents = Array.tabulate(40000 / microDiv) { i =>
      val d = rndN.nextInt(100)
      val et = if (d < 5) "A" else if (d < 10) "B" else if (d < 20) "NLO" else "NHI"
      Ev("k", i, et, i.toLong * 1000000L, if (et == "B") 1.0 else 0.0, null, null)
    }
    val negP = Pattern(SEQ(P("A", "a"), NOT(P("NLO", "nl")), NOT(P("NHI", "nh")), P("B", "b")),
      CBinary("nl", "b", (x, y) => x.num > y.num), 600L * 1000000L)
    val negNaiveC = Compiler.compile(negP, Orders.Trivial, Orders.NegNaive)
    val negStatC = Compiler.compile(negP, Orders.Trivial,
      Orders.NegStatistic(Map("NLO" -> 60.0, "NHI" -> 480.0)))
    val rndM = new scala.util.Random(7)
    val multiEvents = Array.tabulate(60000 / microDiv) { i =>
      Ev("k", i, "T" + rndM.nextInt(16), i.toLong * 1000000L, rndM.nextInt(100).toDouble, null, null)
    }
    val multiPats = (0 until 8).map(i =>
      Pattern(SEQ(P(s"T${2 * i}", "a"), P(s"T${2 * i + 1}", "b")), CTrue, 100L * 1000000L, id = i))
    val multiJoint = multiPats.flatMap(Compiler.compile).toIndexedSeq
    // JIT warmup
    engRun(trivialC, reorderEvents, sorted = false)
    engRun(relC, sortedEvents, sorted = true)
    engRun(multiJoint, multiEvents, sorted = false)
    engRun(bushy4C, bushyEvents, sorted = false)
    engRun(negStatC, negEvents, sorted = false)
    val legs = Seq(
      ("cep_order_trivial", () => engRun(trivialC, reorderEvents, sorted = false)),
      ("cep_order_greedy", () => engRun(greedyC, reorderEvents, sorted = false)),
      ("cep_probe_scan", () => engRun(relC, sortedEvents, sorted = false)),
      ("cep_probe_sorted", () => engRun(relC, sortedEvents, sorted = true)),
      ("cep_multi8_joint", () => engRun(multiJoint, multiEvents, sorted = false)),
      ("cep_order4_greedy", () => engRun(greedy4C, bushyEvents, sorted = false)),
      ("cep_order4_bushy", () => engRun(bushy4C, bushyEvents, sorted = false)),
      ("cep_neg_naive", () => engRun(negNaiveC, negEvents, sorted = false)),
      ("cep_neg_stat", () => engRun(negStatC, negEvents, sorted = false)))
    val results = (1 to reps).map(_ => legs.map { case (n, f) => n -> f() })
    legs.map(_._1).zipWithIndex.foreach { case (n, i) =>
      val times = results.map(_(i)._2._2)
      val counts = results.map(_(i)._2._1).distinct
      println(f"MICRO $n%-20s min=${times.min}%.3f matches=${counts.mkString(",")}")
    }
  }
}
