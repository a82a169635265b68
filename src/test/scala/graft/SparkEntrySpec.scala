package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cep.spark.SparkT

/** Pins the driver contract that the external correctness gate depends on but nothing
  * in-repo previously asserted: every catalog query has a DuckDB oracle, every output
  * column name is spelled in its oracle SQL (the gate sorts columns BY NAME before
  * hashing values, so a rename on either side is a silent hash mismatch — the exact
  * failure mode the contract warns about), and the flagship `entry` returns rows on
  * sf0.001 (the driver's smoke check). */
class SparkEntrySpec extends AnyFunSuite {

  private val sf0001 = "/root/testdata/sf0.001"

  test("queries and oracleSql cover exactly the same names") {
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
  }

  test("every query's output column names are spelled in its oracle SQL") {
    assume(new java.io.File(sf0001).isDirectory)
    val spark = SparkT.spark
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val cols = fn(spark, sf0001).schema.fieldNames // plan only — no action
      val sql = SparkEntry.oracleSql(name)
      val missing = cols.filterNot(c =>
        ("""(?i)(?<![a-z0-9_])""" + java.util.regex.Pattern.quote(c) + """(?![a-z0-9_])""").r
          .findFirstIn(sql).isDefined)
      assert(missing.isEmpty,
        s"$name: output columns ${missing.mkString(",")} never appear in its oracle SQL — " +
          "a rename on either side hash-mismatches at the driver gate")
    }
  }

  test("flagship entry returns rows at sf0.001") {
    assume(new java.io.File(sf0001).isDirectory)
    assert(SparkEntry.entry(SparkT.spark).count() > 0)
  }
}
