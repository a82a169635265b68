package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import PStruct._

/**
 * Golden parity suite: every case in reference_cases.json was produced by EXECUTING the
 * actual reference engine (alexha11/OpenCEP) on the same deterministic stream (generator
 * script recorded in the repo history; see SURVEY.md §5). This pins row-for-row output
 * parity across nested structures, Kleene closure conditions, all negation placements,
 * duplicate types, consumption policies, and probabilistic confidence.
 */
class GoldenSpec extends AnyFunSuite {

  private val MIN = 60L * 1000000L

  /** Mirrors gengold.py's structure/condition tables (same names). */
  private def pattern(name: String, cond: String, windowMin: Long,
                      policy: Policy, confidence: Double): Pattern = {
    val structure: PStruct = name match {
      case "seq3" | "seq3_cond" => SEQ(P("A", "a"), P("B", "b"), P("C", "c"))
      case "seq_nested_and" => SEQ(P("A", "a"), AND(P("B", "b"), P("C", "c")), P("D", "d"))
      case "and3" => AND(P("A", "a"), P("B", "b"), P("C", "c"))
      case "nested_and_of_seqs" => AND(SEQ(P("A", "a"), P("B", "b")), SEQ(P("C", "c"), P("D", "d")))
      case "seq_of_and_first" => SEQ(AND(P("A", "a"), P("B", "b")), P("C", "c"))
      case "kc_basic" => SEQ(P("A", "a"), KC(P("B", "k")), P("C", "c"))
      case "kc_minmax" => SEQ(P("A", "a"), KC(P("B", "k"), min = 2, max = 4), P("C", "c"))
      case "kc_value" | "kc_offset" => SEQ(KC(P("B", "k")), P("C", "c"))
      case "kc_idx" => SEQ(KC(P("B", "k"), min = 3, max = 4), P("C", "c"))
      case "not_middle" => SEQ(P("A", "a"), NOT(P("B", "nb")), P("C", "c"))
      case "not_begin" => SEQ(NOT(P("B", "nb")), P("A", "a"), P("C", "c"))
      case "not_end" => SEQ(P("A", "a"), P("C", "c"), NOT(P("B", "nb")))
      case "not_and" => AND(P("A", "a"), NOT(P("B", "nb")), P("C", "c"))
      case "not_two" => SEQ(P("A", "a"), NOT(P("B", "nb")), P("C", "c"), NOT(P("D", "nd")))
      case "dup_types" => SEQ(P("A", "a"), P("A", "b"), P("B", "c"))
      case "seq2_cond" | "policy_single" | "policy_contiguous" | "prob_confidence" =>
        SEQ(P("A", "a"), P("B", "b"))
      case "policy_freeze" => SEQ(P("A", "a"), P("B", "b"), P("C", "c"))
      case other => fail(s"unknown case $other")
    }
    val condition: Cond = cond match {
      case "true" => CTrue
      case "b_gt_a" => CBinary("b", "a", (b, a) => b.num > a.num)
      case "a_gt_5" => CUnary("a", _.num > 5)
      case "kc_all_le_6" => CKCValue("k", _.num, _ <= _, 6)
      case "kc_offset_asc" => CKCIndex("k", _.num, _ < _, useOffset = true, offset = 1)
      case "kc_idx02" => CKCIndex("k", _.num, _ <= _, firstIndex = 0, secondIndex = 2)
    }
    Pattern(structure, condition, windowMin * MIN, policy, confidence)
  }

  private case class GoldenCase(name: String, events: Seq[Ev], cond: String, windowMin: Long,
                                matches: Seq[Seq[Seq[Long]]], policy: Policy, confidence: Double)

  private lazy val cases: Seq[GoldenCase] = {
    val spark = graft.cep.spark.SparkT.spark
    import org.apache.spark.sql.functions._
    val path = getClass.getResource("/golden/reference_cases.json").getPath
    val df = spark.read.option("multiLine", "true").json(path)
    df.collect().toSeq.map { r =>
      val name = r.getAs[String]("name")
      val events = r.getSeq[String](r.fieldIndex("events")).toList.map { line =>
        val parts = line.split(",", -1)
        Ev("k", parts(3).toLong, parts(0), parts(1).toLong * 1000000L, parts(2).toDouble,
          null, null, prob = if (parts(4).isEmpty) -1.0 else parts(4).toDouble)
      }
      val matches = r.getSeq[scala.collection.Seq[scala.collection.Seq[Long]]](r.fieldIndex("matches"))
        .toList.map(_.toList.map(_.toList))
      val policy = Option(r.getAs[org.apache.spark.sql.Row]("policy")).map { p =>
        def arr(f: String): List[String] =
          if (p.schema.fieldNames.contains(f) && !p.isNullAt(p.fieldIndex(f)))
            p.getSeq[String](p.fieldIndex(f)).toList
          else Nil
        val contig =
          if (p.schema.fieldNames.contains("contiguous") && !p.isNullAt(p.fieldIndex("contiguous")))
            p.getSeq[scala.collection.Seq[String]](p.fieldIndex("contiguous")).toList.map(_.toList)
          else Nil
        Policy(single = arr("single").toSet, contiguous = contig, freeze = arr("freeze").toSet)
      }.getOrElse(Policy())
      val conf = if (r.isNullAt(r.fieldIndex("confidence"))) -1.0 else r.getAs[Double]("confidence")
      GoldenCase(name, events, r.getAs[String]("cond"), r.getAs[Long]("window_min"),
        matches, policy, conf)
    }
  }

  private def runCase(c: GoldenCase): (Seq[Seq[Seq[Long]]], Seq[Seq[Seq[Long]]]) = {
    val p = pattern(c.name, c.cond, c.windowMin, c.policy, c.confidence)
    val engine = new MatchEngine(Compiler.compile(p))
    val got = (c.events.sortBy(e => (e.ts, e.idx)).flatMap(engine.feed) ++ engine.finish())
      .map(_.binds.toList.sortBy(_.slot).map(_.evs.map(_.idx)))
    (got.sortBy(_.toString), c.matches.sortBy(_.toString))
  }

  test("golden cases loaded") {
    assert(cases.size == 22)
  }

  for (name <- Seq("seq3", "seq3_cond", "seq_nested_and", "and3", "nested_and_of_seqs",
    "seq_of_and_first", "kc_basic", "kc_minmax", "kc_value", "kc_offset", "kc_idx",
    "not_middle", "not_begin", "not_end", "not_and", "not_two", "dup_types", "seq2_cond",
    "policy_single", "policy_contiguous", "policy_freeze", "prob_confidence")) {
    test(s"reference parity: $name") {
      val c = cases.find(_.name == name).getOrElse(fail(s"case $name missing"))
      val (got, want) = runCase(c)
      assert(got == want,
        s"\n got(${got.size}): ${got.take(5)}\nwant(${want.size}): ${want.take(5)}")
    }
  }
}
