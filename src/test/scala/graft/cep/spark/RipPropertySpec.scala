package graft.cep.spark

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.cep._
import graft.cep.PStruct._

/**
 * Property check for the RIP pane semantics: replicate-by-pane + per-pane evaluation +
 * owner-pane dedup must equal the plain per-key engine for ANY pattern shape, stream and
 * pane width >= window. The crafted Spark tests (SparkSpec, StreamSpec) pin the Catalyst
 * expression and the shuffle plumbing; this suite sweeps the pane MATH — boundary
 * replication, back-pane coverage for negatives preceding the first positive, owner
 * filtering — over random cases in-process (no Spark), using the same replication rules
 * ([[Rip.paneArray]]'s definition, mirrored in Scala) and the brute-force oracle's
 * pattern/stream generators.
 */
class RipPropertySpec extends AnyFunSuite {
  private val MIN: Long = 60L * 1000000L
  private val types = Vector("A", "B", "C")

  private def randomStream(r: Random, n: Int, keys: Int): Seq[Ev] = {
    val perKey = collection.mutable.Map.empty[String, Long]
    (0 until n).map { _ =>
      val key = s"k${r.nextInt(keys)}"
      val idx = perKey.getOrElse(key, 0L); perKey(key) = idx + 1
      // spread over enough panes that owner dedup and boundary replication both engage
      Ev(key, idx, types(r.nextInt(types.size)), r.nextInt(40) * MIN, r.nextInt(10), null, null)
    }
  }

  private def randomPattern(r: Random): Pattern = {
    val isSeq = r.nextBoolean()
    val nPrims = 2 + r.nextInt(2)
    val prims: List[PStruct] = (0 until nPrims).map { i =>
      val base = P(types(r.nextInt(types.size)), s"e$i")
      if (r.nextInt(4) == 0) KC(base, min = 1, max = 1 + r.nextInt(2)) else base
    }.toList
    // one negation at a random position 1/2 of the time: positions 0 / middle exercise
    // the back-pane replication predicate (negCanPrecedeFirstPositive)
    val withNeg: List[PStruct] =
      if (r.nextInt(2) == 0) {
        val pos = r.nextInt(prims.size + 1)
        val (l, rr) = prims.splitAt(pos)
        l ++ List(NOT(P(types(r.nextInt(types.size)), "neg"))) ++ rr
      } else prims
    val struct = if (isSeq) PSeq(withNeg) else PAnd(withNeg)
    Pattern(struct, CTrue, (3 + r.nextInt(8)) * MIN)
  }

  /** The in-process mirror of the pane pipeline: same replication rules as
    * [[Rip.paneArray]], one engine per (key, pane), owner filter on emission. */
  private def paneRun(p: Pattern, evs: Seq[Ev], paneMicros: Long): Set[(String, Oracle.OMatch)] = {
    val compiled = Compiler.compile(p).toIndexedSeq
    val window = p.windowMicros
    val backPane = compiled.exists(Rip.negCanPrecedeFirstPositive)
    val negTypes = Rip.negativeTypes(compiled)
    val replicated: Seq[((String, Long), Ev)] = evs.flatMap { e =>
      val pn = Math.floorDiv(e.ts, paneMicros)
      val offset = e.ts - pn * paneMicros
      val prev = if (offset <= window) Seq(pn - 1) else Nil
      val next =
        if (backPane && negTypes(e.etype) && offset >= paneMicros - window) Seq(pn + 1) else Nil
      (Seq(pn) ++ prev ++ next).map(x => ((e.key, x), e))
    }
    val out = replicated.groupBy(_._1).toSeq.flatMap { case ((_, pn), grp) =>
      val eng = new MatchEngine(compiled)
      val lo = pn * paneMicros; val hi = lo + paneMicros
      val ms = grp.map(_._2).sortBy(e => (e.ts, e.idx)).flatMap(eng.feed) ++ eng.finish()
      ms.filter(m => m.firstTs >= lo && m.firstTs < hi)
    }
    Oracle.canon(out)
  }

  test("paned evaluation == plain engine on 300 random (pattern, stream, pane) cases") {
    val failures = collection.mutable.ArrayBuffer.empty[String]
    (0 until 300).foreach { seed =>
      val r = new Random(7000 + seed)
      val p = randomPattern(r)
      val evs = randomStream(r, 10 + r.nextInt(12), keys = 2)
      val paneMicros = p.windowMicros * (1 + r.nextInt(3)) // window .. 3x window
      val got = paneRun(p, evs, paneMicros)
      val want = Oracle.canon(evs.groupBy(_.key).values.toSeq.flatMap { perKey =>
        val eng = new MatchEngine(Compiler.compile(p).toIndexedSeq)
        perKey.sortBy(e => (e.ts, e.idx)).flatMap(eng.feed) ++ eng.finish()
      })
      if (got != want)
        failures += s"seed=$seed pane=$paneMicros pattern=$p\n" +
          s"  missing=${(want -- got).take(3)}\n  extra=${(got -- want).take(3)}"
    }
    assert(failures.isEmpty, s"\n${failures.size} mismatching cases:\n${failures.take(5).mkString("\n")}")
  }
}
