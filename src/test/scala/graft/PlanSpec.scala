package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cep.spark.SparkT

/** Physical-plan guards: the properties that matter at 100 TB must not silently regress. */
class PlanSpec extends AnyFunSuite {
  import SparkT.spark

  private val sf = "/root/testdata/sf0.001"

  test("q1_agg prunes the lineitem scan to the referenced columns") {
    val plan = Queries.q1Agg(spark, sf).queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_orderkey"),
      s"scan reads unreferenced columns:\n$readSchema")
  }

  test("q_join_nation broadcasts the dimension tables (no fact-side shuffle join)") {
    val plan = Queries.qJoinNation(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"dimension join degraded to sort-merge:\n$plan")
  }

  private def countExchanges(plan: String): Int =
    plan.linesIterator.count(_.trim.startsWith("+- Exchange")) +
      plan.linesIterator.count(_.trim.startsWith("Exchange"))

  test("CEP pipeline has exactly one shuffle (the key exchange)") {
    import spark.implicits._
    val evs = graft.io.EventsTable.load(spark, sf)
    val plan = graft.cep.spark.BatchEvaluator
      .evaluate(evs, Seq(Queries.seq3Pattern)).queryExecution.executedPlan.toString
    assert(countExchanges(plan) == 1, s"expected exactly one Exchange:\n$plan")
  }

  test("brute cosine top-1 never shuffles the quadratic pair stream") {
    val plan = graft.ops.Similarity.bruteTop1(spark, sf).queryExecution.executedPlan.toString
    // the O(n²) pairs must be consumed by a HASH-based partial aggregate inside the
    // stage that produces them: a Window would shuffle n² rows, and a SortAggregate's
    // partial pass would sort (materialize/spill) each task's pair block — nn_top1 is a
    // TypedImperativeAggregate precisely so the plan uses ObjectHashAggregate
    assert(!plan.contains("Window"), s"pair stream reached a window operator:\n$plan")
    assert(!plan.contains("Sort"), s"pair stream reached a sort:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"expected hash aggregation of pairs:\n$plan")
  }

  test("auto skew routing is ONE pass: the routed job has exactly one shuffle, no union") {
    import spark.implicits._
    val evs = graft.io.EventsTable.load(spark, sf)
    // threshold low enough that hot keys ARE detected, so the conditional-pane path runs
    val routed = graft.cep.spark.Rip.evaluateAuto(evs, Seq(Queries.seq3Pattern),
      paneMicros = 24L * 3600 * 1000000, hotThreshold = 50L)
    val plan = routed.queryExecution.executedPlan.toString
    assert(countExchanges(plan) == 1,
      s"auto's main job must shuffle once (round-3 shape was plain ∪ salted = two jobs):\n$plan")
    assert(!plan.contains("Union"), s"no plain∪salted union allowed:\n$plan")
  }
}
