package graft.io

import org.scalatest.funsuite.AnyFunSuite
import graft.cep.spark.SparkT
import java.nio.file.Files

/** Manifest-last exactly-once batch sink (the Iceberg-substitute commit protocol). */
class MatchSinkSpec extends AnyFunSuite {
  import SparkT.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graftsink").toString + "/matches"

  private def sample(n: Int) =
    (1 to n).map(i => (s"conv-$i", i.toLong * 1000000L, s"m$i")).toDF("key", "ts", "payload")

  test("write is manifest-committed, read sees exactly the committed rows") {
    val table = freshTable()
    val m = MatchSink.write(sample(100), table, "c1")
    assert(m.rows == 100 && m.files.nonEmpty)
    assert(m.minTs == 1000000L && m.maxTs == 100000000L)
    val got = MatchSink.read(spark, table)
    assert(got.count() == 100)
    assert(got.agg(org.apache.spark.sql.functions.sum("ts")).head().getLong(0) ==
      (1 to 100).map(_.toLong * 1000000L).sum)
  }

  test("re-running the same commit id is idempotent (retry semantics)") {
    val table = freshTable()
    MatchSink.write(sample(50), table, "job-42")
    val again = MatchSink.write(sample(50), table, "job-42")
    assert(again.rows == 50)
    assert(MatchSink.read(spark, table).count() == 50) // not 100
    assert(MatchSink.listManifests(spark, table).size == 1)
  }

  test("uncommitted staging data is invisible to readers") {
    val table = freshTable()
    MatchSink.write(sample(10), table, "good")
    // simulate a crash before the manifest: staging files exist, no manifest
    sample(999).write.parquet(s"$table/_staging/crashed")
    sample(7).write.parquet(s"$table/data/orphan-no-manifest") // even stray data files
    val got = MatchSink.read(spark, table)
    assert(got.count() == 10, "readers must load only manifested files")
  }

  test("multiple commits union; manifests carry per-file lineage") {
    val table = freshTable()
    MatchSink.write(sample(30), table, "a")
    MatchSink.write(sample(20), table, "b")
    assert(MatchSink.read(spark, table).count() == 50)
    val ms = MatchSink.listManifests(spark, table).sortBy(_.commitId)
    assert(ms.map(_.rows) == Seq(30L, 20L))
    assert(ms.forall(_.files.forall(f => f.bytes > 0 && f.name.endsWith(".parquet"))))
  }
}
