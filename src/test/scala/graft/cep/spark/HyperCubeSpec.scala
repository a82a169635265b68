package graft.cep.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.cep._
import graft.cep.PStruct._

/** HyperCube partitioning for key-less (cross-conversation) patterns
  * (/root/reference/parallel/data_parallel/HyperCubeParallelExecutionAlgorithm.py). */
class HyperCubeSpec extends AnyFunSuite {
  import SparkT.{spark, MIN, canon}

  private val rnd = new scala.util.Random(17)
  // events spread over many keys — a cross-key pattern cannot use groupByKey(conv)
  private lazy val events = (0 until 600).map { i =>
    Ev(s"u${rnd.nextInt(50)}", i, Seq("A", "B", "N")(rnd.nextInt(3)),
      rnd.nextInt(300) * MIN / 4, rnd.nextInt(20).toDouble, null, null)
  }

  /** Global single-engine truth: all events through one engine in (ts, idx) order. */
  private def globalRun(patterns: Seq[Pattern]): Seq[CepMatch] = {
    val eng = new MatchEngine(patterns.flatMap(Compiler.compile).toIndexedSeq)
    events.sortBy(e => (e.ts, e.idx)).flatMap(eng.feed) ++ eng.finish()
  }

  test("cubic shares factor the unit budget most-equally") {
    assert(HyperCube.calcCubicShares(10, 2).toList == List(3, 3))
    assert(HyperCube.calcCubicShares(16, 2).toList == List(4, 4))
    assert(HyperCube.calcCubicShares(7, 1).toList == List(7))
    val s = HyperCube.calcCubicShares(30, 3)
    assert(s.product <= 30 && s.max - s.min <= 1)
  }

  test("cross-key AND with equality condition equals the global run, exactly once") {
    import spark.implicits._
    // same-attribute events co-locate on the cube diagonal faces
    val p = Pattern(AND(P("A", "a"), P("B", "b")),
      CRel.num("a", "b", RelOp.EQ), 60 * MIN)
    val got = canon(HyperCube.evaluate(spark.createDataset(events), Seq(p),
      attributes = Map("A" -> Seq((e: Ev) => e.num.toLong), "B" -> Seq((e: Ev) => e.num.toLong)),
      units = 9).collect().toSeq)
    val want = canon(globalRun(Seq(p)))
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("UNEQUAL cube shares still route exactly (cell-cache keys must not collide)") {
    import spark.implicits._
    // units=30 over 2 dims -> shares [6,5]: with unequal shapes a naive per-type cache
    // key (typeIdx leading a same-radix code) collides across types — e.g. type-0 coord 5
    // and type-1 coord 0 — which mis-routes events and silently DROPS matches (caught at
    // sf0.01 by the driver oracle in round 4; equal shares mask it)
    val p = Pattern(AND(P("A", "a"), P("B", "b")),
      CRel.num("a", "b", RelOp.EQ), 60 * MIN)
    val got = canon(HyperCube.evaluate(spark.createDataset(events), Seq(p),
      attributes = Map("A" -> Seq((e: Ev) => e.num.toLong), "B" -> Seq((e: Ev) => e.num.toLong)),
      units = 30).collect().toSeq)
    val want = canon(globalRun(Seq(p)))
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("unmapped negative type broadcasts, so negation matches the global run") {
    import spark.implicits._
    val p = Pattern(SEQ(P("A", "a"), NOT(P("N", "n")), P("B", "b")),
      CRel.num("a", "b", RelOp.EQ), 60 * MIN)
    val got = canon(HyperCube.evaluate(spark.createDataset(events), Seq(p),
      attributes = Map("A" -> Seq((e: Ev) => e.num.toLong), "B" -> Seq((e: Ev) => e.num.toLong)),
      units = 9).collect().toSeq)
    val want = canon(globalRun(Seq(p)))
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("kleene-bound mapped types are rejected") {
    import spark.implicits._
    val p = Pattern(SEQ(KC(P("A", "a"), min = 1, max = 2), P("B", "b")), CTrue, 60 * MIN)
    val e = intercept[IllegalArgumentException] {
      HyperCube.evaluate(spark.createDataset(events), Seq(p),
        attributes = Map("A" -> Seq((x: Ev) => x.num.toLong)), units = 4)
    }
    assert(e.getMessage.contains("Kleene"))
  }
}
