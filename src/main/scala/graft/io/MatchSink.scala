package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Exactly-once BATCH sink with a manifest-last commit protocol — the sandbox substitute
 * for the north rule's Iceberg sink (SURVEY.md §1.4: no Iceberg runtime in this
 * environment; the COMMIT SEMANTICS are what the rule needs and what this reproduces):
 *
 *   1. the dataset is written to `<table>/_staging/<commitId>/` (parquet);
 *   2. data files move atomically (same-filesystem rename) into `<table>/data/<commitId>-*`;
 *   3. the manifest `<table>/_manifests/<commitId>.json` is written LAST, carrying the
 *      exact file list plus row count and event-time bounds observed during the write.
 *
 * Readers ([[read]]) load ONLY manifested files, so a crash anywhere before step 3 leaves
 * the table unchanged (orphaned staging/data files are invisible and re-collectable), and
 * re-running a commit is IDEMPOTENT: an existing manifest short-circuits the write — the
 * retry semantics of a Spark job re-submitted after a driver failure. Streaming jobs get
 * the same guarantee from Structured Streaming's checkpoint + the state-store commit
 * protocol instead (StreamEvaluator scaladoc); this sink is for batch backfills.
 *
 * Lineage: the manifest records each data file with its byte size plus the job-level row
 * count and [minTs, maxTs] observed via [[Observation]] during the actual write pass (no
 * second scan); per-partition evaluation lineage lives in graft.cep.spark.Metrics.
 */
object MatchSink {

  final case class ManifestFile(name: String, bytes: Long)
  final case class Manifest(commitId: String, files: Seq[ManifestFile], rows: Long,
                            minTs: Long, maxTs: Long, committedAtMs: Long)

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(table: String, commitId: String) =
    new Path(s"$table/_manifests/$commitId.json")

  /** Write `df` (must carry a `ts` LongType column for the time bounds) under `commitId`.
    * Returns the manifest; a pre-existing manifest for the id makes this a no-op.
    *
    * SINGLE WRITER PER COMMIT ID: the idempotency guard (manifest-exists check) and the
    * staging-dir cleanup are check-then-act — two processes writing the SAME commitId
    * concurrently can delete each other's staging output mid-write. That is the intended
    * deployment contract (one driver owns a commit id; retries happen after the previous
    * attempt died — the Spark-job-resubmit model), matching Iceberg's
    * single-committer-per-snapshot assumption. Writers that cannot guarantee it must
    * derive distinct commit ids (e.g. suffix an attempt id) and deduplicate downstream. */
  def write(df: DataFrame, table: String, commitId: String): Manifest = {
    require(commitId.matches("[A-Za-z0-9._-]+"), s"unsafe commit id: $commitId")
    val spark = df.sparkSession
    val mPath = manifestPath(table, commitId)
    val f = fs(spark, mPath)
    if (f.exists(mPath)) return readManifest(spark, table, commitId) // idempotent retry

    val staging = new Path(s"$table/_staging/$commitId")
    f.delete(staging, true) // leftovers from a failed earlier attempt
    val obs = Observation(s"sink-$commitId")
    df.observe(obs, count(lit(1)).as("rows"),
        coalesce(min(col("ts")), lit(Long.MaxValue)).as("minTs"),
        coalesce(max(col("ts")), lit(Long.MinValue)).as("maxTs"))
      .write.mode("overwrite").parquet(staging.toString)
    val row = obs.get
    val (rows, minTs, maxTs) =
      (row("rows").asInstanceOf[Long], row("minTs").asInstanceOf[Long],
        row("maxTs").asInstanceOf[Long])

    val dataDir = new Path(s"$table/data")
    f.mkdirs(dataDir)
    val moved = f.listStatus(staging).toSeq
      .filter(s => s.getPath.getName.endsWith(".parquet"))
      .map { s =>
        val target = new Path(dataDir, s"$commitId-${s.getPath.getName}")
        require(f.rename(s.getPath, target), s"rename failed: ${s.getPath} -> $target")
        ManifestFile(target.getName, s.getLen)
      }
    f.delete(staging, true)

    val m = Manifest(commitId, moved, rows, minTs, maxTs, System.currentTimeMillis())
    val json = {
      val fileArr = m.files.map(fl => s"""{"name":"${fl.name}","bytes":${fl.bytes}}""")
        .mkString("[", ",", "]")
      s"""{"commitId":"${m.commitId}","files":$fileArr,"rows":${m.rows},""" +
        s""""minTs":${m.minTs},"maxTs":${m.maxTs},"committedAtMs":${m.committedAtMs}}"""
    }
    // manifest write is the commit point: write to a temp name, rename into place
    val tmp = new Path(mPath.getParent, s".${commitId}.json.tmp")
    f.mkdirs(mPath.getParent)
    val out = f.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    require(f.rename(tmp, mPath), s"manifest commit failed: $mPath")
    m
  }

  /** Load the table = union of all manifested files ONLY (uncommitted data invisible).
    * `schema` is used when NO manifested files exist yet, so downstream column
    * references resolve against an empty-but-typed frame instead of failing on the
    * schema-less `spark.emptyDataFrame`; without it an empty table degrades to the old
    * behavior (documented sharp edge — an unwritten table has no schema source). */
  def read(spark: SparkSession, table: String,
           schema: org.apache.spark.sql.types.StructType = null): DataFrame = {
    val ms = listManifests(spark, table)
    val files = ms.flatMap(_.files).map(fl => s"$table/data/${fl.name}")
    if (files.nonEmpty) spark.read.parquet(files: _*)
    else if (schema != null)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.emptyDataFrame
  }

  /** Garbage-collect ORPHANS: data files no manifest references and staging directories,
    * left behind by commits that crashed between staging and the manifest write (invisible
    * to [[read]] but permanent otherwise). Deletes only items older than `graceMs`
    * (modification time) — younger ones may belong to an IN-FLIGHT commit whose manifest
    * has not landed yet; staging dirs whose manifest ALREADY exists are deleted at any age
    * (their commit completed — write() renamed the data out or a retry will clear them).
    * Crashed-manifest temp files (`_manifests/.{id}.json.tmp` whose rename never ran) are
    * swept under the same grace. Returns the deleted paths. Run from the table owner only
    * (see [[write]]'s single-writer contract) — note the grace is an mtime heuristic, not
    * a lock: rename preserves mtime, so a commit whose WRITE JOB alone runs longer than
    * `graceMs` could see its in-flight staging swept by a concurrently-running vacuum;
    * the single-writer contract (vacuum only between own commits) is what actually
    * protects it, the grace just adds slack for crashed-writer cleanup. */
  def vacuum(spark: SparkSession, table: String,
             graceMs: Long = 24L * 3600 * 1000): Seq[String] = {
    val manifests = listManifests(spark, table)
    val manifested: Set[String] = manifests.flatMap(_.files).map(_.name).toSet
    val committedIds: Set[String] = manifests.map(_.commitId).toSet
    val now = System.currentTimeMillis()
    val deleted = List.newBuilder[String]
    val dataDir = new Path(s"$table/data")
    val f = fs(spark, dataDir)
    if (f.exists(dataDir))
      f.listStatus(dataDir).foreach { s =>
        if (!manifested(s.getPath.getName) && now - s.getModificationTime > graceMs) {
          f.delete(s.getPath, true) // recursive: tolerate stray directories too
          deleted += s.getPath.toString
        }
      }
    val stagingDir = new Path(s"$table/_staging")
    if (f.exists(stagingDir))
      f.listStatus(stagingDir).foreach { s =>
        if (committedIds(s.getPath.getName) || now - s.getModificationTime > graceMs) {
          f.delete(s.getPath, true)
          deleted += s.getPath.toString
        }
      }
    // crashed-manifest temps: a writer that died between create(tmp) and rename leaves
    // .{id}.json.tmp behind forever (readers ignore it — listManifests filters on .json)
    val manifestDir = new Path(s"$table/_manifests")
    if (f.exists(manifestDir))
      f.listStatus(manifestDir).foreach { s =>
        if (s.getPath.getName.endsWith(".json.tmp") && now - s.getModificationTime > graceMs) {
          f.delete(s.getPath, false)
          deleted += s.getPath.toString
        }
      }
    deleted.result()
  }

  def listManifests(spark: SparkSession, table: String): Seq[Manifest] = {
    val dir = new Path(s"$table/_manifests")
    val f = fs(spark, dir)
    if (!f.exists(dir)) return Nil
    f.listStatus(dir).toSeq.filter(_.getPath.getName.endsWith(".json")).map { s =>
      readManifest(spark, table, s.getPath.getName.stripSuffix(".json"))
    }
  }

  private def readManifest(spark: SparkSession, table: String, commitId: String): Manifest = {
    val p = manifestPath(table, commitId)
    val f = fs(spark, p)
    val in = f.open(p)
    val json =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    // minimal parser for our own fixed-shape manifest (no JSON lib on the classpath)
    def longOf(key: String): Long =
      s""""$key":(-?\\d+)""".r.findFirstMatchIn(json).get.group(1).toLong
    val files = """\{"name":"([^"]+)","bytes":(\d+)\}""".r.findAllMatchIn(json)
      .map(m => ManifestFile(m.group(1), m.group(2).toLong)).toSeq
    Manifest(commitId, files, longOf("rows"), longOf("minTs"), longOf("maxTs"),
      longOf("committedAtMs"))
  }
}
