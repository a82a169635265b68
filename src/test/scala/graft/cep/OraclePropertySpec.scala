package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import PStruct._

/**
 * Property check: the incremental engine equals the declarative brute-force oracle on random
 * small streams for randomly generated patterns (SEQ/AND composition, optional negation,
 * optional Kleene closure, cross-event conditions). Mirrors the reference's test-generation
 * approach (/root/reference/misc/Utils.py:175-215) with deterministic seeds.
 */
class OraclePropertySpec extends AnyFunSuite {
  import T.MIN

  private val types = Vector("A", "B", "C")

  private def randomStream(r: Random, n: Int, keys: Int): Seq[Ev] = {
    val perKey = collection.mutable.Map.empty[String, Long]
    (0 until n).map { _ =>
      val key = s"k${r.nextInt(keys)}"
      val idx = perKey.getOrElse(key, 0L); perKey(key) = idx + 1
      // coarse timestamps to generate plenty of ties
      Ev(key, idx, types(r.nextInt(types.size)), r.nextInt(12) * MIN, r.nextInt(10), null, null)
    }
  }

  private def randomPattern(r: Random): Pattern = {
    val isSeq = r.nextBoolean()
    val nPrims = 2 + r.nextInt(2)
    val prims: List[PStruct] = (0 until nPrims).map { i =>
      val base = P(types(r.nextInt(types.size)), s"e$i")
      if (r.nextInt(4) == 0) KC(base, min = 1, max = 1 + r.nextInt(2)) else base
    }.toList
    // optionally add one negation at a random position (top level only)
    val withNeg: List[PStruct] =
      if (r.nextInt(3) == 0) {
        val pos = r.nextInt(prims.size + 1)
        val (l, rr) = prims.splitAt(pos)
        l ++ List(NOT(P(types(r.nextInt(types.size)), "neg"))) ++ rr
      } else prims
    val struct = if (isSeq) PSeq(withNeg) else PAnd(withNeg)
    // random conditions over two distinct primitive (non-KC) names
    val plainNames = prims.zipWithIndex.collect { case (_: Prim, i) => s"e$i" }
    val cond: Cond =
      if (plainNames.size >= 2 && r.nextBoolean()) {
        val a = plainNames(r.nextInt(plainNames.size))
        val b = plainNames(r.nextInt(plainNames.size))
        if (a == b) CUnary(a, _.num > 2) else CBinary(a, b, (x, y) => x.num <= y.num)
      } else if (plainNames.nonEmpty && r.nextBoolean()) {
        CUnary(plainNames(r.nextInt(plainNames.size)), _.num > 2)
      } else CTrue
    Pattern(struct, cond, (3 + r.nextInt(8)) * MIN)
  }

  test("engine == oracle on 300 random (pattern, stream) cases") {
    val failures = collection.mutable.ArrayBuffer.empty[String]
    (0 until 300).foreach { seed =>
      val r = new Random(seed)
      val p = randomPattern(r)
      val evs = randomStream(r, 8 + r.nextInt(10), keys = 2)
      val got = Oracle.canon(T.cepRun(p, evs))
      val want = Oracle.matches(p, evs)
      if (got != want) {
        failures += s"seed=$seed pattern=$p\n  missing=${(want -- got).take(3)}\n  extra=${(got -- want).take(3)}"
      }
    }
    assert(failures.isEmpty, s"\n${failures.size} mismatching cases:\n${failures.take(5).mkString("\n")}")
  }

  test("engine == oracle on 300 cases under RANDOM plan strategies (order + negation stack)") {
    // The plan-space sweep: every (pattern, stream) case compiles under a randomly drawn
    // join-order strategy (incl. the round-4 iterative-improvement and ZStream builders)
    // and a randomly drawn negative-stack strategy with random rates — all of which must
    // be invisible in the output. Catches planner/engine interactions the per-strategy
    // unit tests (which use hand-picked shapes) cannot.
    val failures = collection.mutable.ArrayBuffer.empty[String]
    (0 until 300).foreach { seed =>
      val r = new Random(1000 + seed)
      val p = randomPattern(r)
      val evs = randomStream(r, 8 + r.nextInt(10), keys = 2)
      val pw: Map[String, Double] = types.map(t => t -> (0.5 + r.nextInt(20))).toMap
      val strategy = r.nextInt(6) match {
        case 0 => Orders.Trivial
        case 1 => Orders.AscendingRate(pw)
        case 2 => Orders.Greedy(pw)
        case 3 => Orders.DpLeftDeep(pw)
        case 4 => Orders.IterativeImprovement(pw, stepLimit = 50,
          circleMoves = r.nextBoolean(), greedyInit = r.nextBoolean(), seed = seed)
        case _ => Orders.ZStream(pw, greedyOrder = r.nextBoolean())
      }
      val negStrategy = if (r.nextBoolean()) Orders.NegNaive else Orders.NegStatistic(pw)
      val compiled = Compiler.compile(p, strategy, negStrategy)
      val got = Oracle.canon(evs.groupBy(_.key).values.toSeq.flatMap { perKey =>
        val eng = new MatchEngine(compiled)
        perKey.sortBy(e => (e.ts, e.idx)).flatMap(eng.feed) ++ eng.finish()
      })
      val want = Oracle.matches(p, evs)
      if (got != want) {
        failures += s"seed=$seed strategy=$strategy neg=$negStrategy pattern=$p\n" +
          s"  missing=${(want -- got).take(3)}\n  extra=${(got -- want).take(3)}"
      }
    }
    assert(failures.isEmpty, s"\n${failures.size} mismatching cases:\n${failures.take(5).mkString("\n")}")
  }
}
