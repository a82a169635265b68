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

  test("vacuum removes crash orphans after the grace period, keeps committed data") {
    val table = freshTable()
    MatchSink.write(sample(10), table, "good")
    // simulate a crash between data rename and manifest write: orphan data + staging
    sample(999).write.parquet(s"$table/_staging/crashed")
    sample(7).write.parquet(s"$table/data/orphan-no-manifest")
    // ...and a crash between manifest create(tmp) and rename: a stale .json.tmp
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$table/_manifests/.deadbeef.json.tmp"), "{}")
    // a completed commit's leftover staging dir (crash AFTER manifest): any-age deletable
    new java.io.File(s"$table/_staging/good").mkdirs()
    // within the grace period the crashed commit might still be in flight: untouched
    // (except the completed commit's staging, which is always safe to clear)
    val early = MatchSink.vacuum(spark, table, graceMs = 60L * 60 * 1000)
    assert(early.forall(_.endsWith("_staging/good")), s"only completed staging early, got $early")
    assert(MatchSink.read(spark, table).count() == 10)
    Thread.sleep(60)
    val deleted = MatchSink.vacuum(spark, table, graceMs = 20L)
    assert(deleted.exists(_.contains("orphan-no-manifest")) &&
      deleted.exists(_.endsWith("_staging/crashed")), s"want both orphans gone, got $deleted")
    assert(deleted.exists(_.endsWith(".deadbeef.json.tmp")), s"stale manifest tmp gone, got $deleted")
    assert(MatchSink.read(spark, table).count() == 10, "committed rows survive vacuum")
    assert(MatchSink.listManifests(spark, table).size == 1)
    // a retried write after vacuum still commits cleanly
    MatchSink.write(sample(5), table, "late")
    assert(MatchSink.read(spark, table).count() == 15)
  }

  test("empty-table read with a supplied schema yields a typed empty frame") {
    val table = freshTable()
    val schema = sample(1).schema
    val got = MatchSink.read(spark, table, schema)
    assert(got.count() == 0 && got.schema == schema)
    assert(got.select("ts").count() == 0, "columns must resolve on the empty frame")
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
