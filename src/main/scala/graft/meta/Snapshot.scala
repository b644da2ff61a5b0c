package graft.meta

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.sql.Timestamp

import graft.model.LineageRow
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-semantics-on-Parquet stage protocol (SURVEY.md §7.6).
  *
  * No Iceberg/Delta jars ship in this image, so snapshot/resume is a
  * small explicit protocol on plain Parquet:
  *  - a stage table lives at {base}/{stage}/data (Parquet, optionally
  *    partitioned by a bucket column);
  *  - Spark's committer writes via _temporary + rename and drops
  *    _SUCCESS only on full commit;
  *  - AFTER the data commit we atomically write {base}/{stage}/
  *    _graft_manifest.json recording (snapshot_id, version, rows);
  *  - re-running with the same (snapshot_id, version) SKIPS the compute
  *    and reads the committed table (resume-from-last-committed-stage;
  *    ≙ the reference's mtime/git-hash-validated .pkl caches,
  *    clangd_index_yaml_parser.py:136-163, compilation_manager.py:27-94).
  *
  * Each committed stage also appends per-partition lineage rows
  * (SURVEY.md §7.7) to {base}/lineage.
  */
object Snapshot {

  final case class Manifest(snapshotId: String, version: String, rows: Long, wallMs: Long)

  private def manifestPath(dir: String): Path = Paths.get(dir, "_graft_manifest.json")

  def readManifest(dir: String): Option[Manifest] = {
    val p = manifestPath(dir)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      def field(k: String): Option[String] =
        ("\"" + k + "\"\\s*:\\s*(\"([^\"]*)\"|[0-9]+)").r.findFirstMatchIn(s)
          .map(m => if (m.group(2) != null) m.group(2) else m.group(1))
      for {
        sid <- field("snapshot_id"); v <- field("version")
        r <- field("rows"); w <- field("wall_ms")
      } yield Manifest(sid, v, r.toLong, w.toLong)
    }
  }

  private def writeManifest(dir: String, m: Manifest): Unit = {
    val json =
      s"""{"snapshot_id": "${m.snapshotId}", "version": "${m.version}", """ +
        s""""rows": ${m.rows}, "wall_ms": ${m.wallMs}}"""
    val tmp = Paths.get(dir, "_graft_manifest.json.tmp")
    Files.createDirectories(Paths.get(dir))
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Run (or resume) one stage. `compute` is only invoked when no
    * committed manifest matches (snapshotId, version). */
  def stage(
      spark: SparkSession,
      baseDir: String,
      stageName: String,
      snapshotId: String,
      version: String,
      partitionCols: Seq[String] = Nil,
      rowsIn: Long = -1L)(compute: => DataFrame): DataFrame = {
    val dir = s"$baseDir/$stageName"
    val dataDir = s"$dir/data"
    readManifest(dir) match {
      case Some(m) if m.snapshotId == snapshotId && m.version == version =>
        spark.read.parquet(dataDir)
      case _ =>
        // invalidate FIRST: a kill between the data overwrite and the new
        // manifest write must not leave the old manifest pointing at
        // destroyed/mixed data (resume would trust it)
        invalidate(dir)
        val t0 = System.nanoTime()
        val df = compute
        val w = df.write.mode(SaveMode.Overwrite)
        (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
          .parquet(dataDir)
        // read back with the computed schema: a legitimately EMPTY stage
        // (e.g. zero mention candidates) writes only _SUCCESS, and a
        // schema-less read would fail with UNABLE_TO_INFER_SCHEMA
        val committed = spark.read.schema(df.schema).parquet(dataDir)
        val rows = committed.count()
        val wallMs = (System.nanoTime() - t0) / 1000000L
        appendLineage(spark, baseDir, stageName, snapshotId, committed,
          partitionCols.find(_ == "bucket"), rowsIn, version, wallMs)
        writeManifest(dir, Manifest(snapshotId, version, rows, wallMs))
        committed
    }
  }

  /** Remove a stage's manifest (mark in-progress) BEFORE its data dir is
    * rewritten, so a kill mid-overwrite cannot leave a committed manifest
    * pointing at partial data. Idempotent. */
  def invalidate(dir: String): Unit =
    Files.deleteIfExists(manifestPath(dir))

  /** Re-stamp a stage's manifest after an external (e.g. incremental)
    * rewrite of its data dir — ≙ the reference's commit-hash stamp on
    * PROJECT after an update (clangd_graph_rag_updater.py:79). */
  def stamp(
      spark: SparkSession,
      baseDir: String,
      stageName: String,
      snapshotId: String,
      version: String): Unit = {
    val dir = s"$baseDir/$stageName"
    val rows =
      try spark.read.parquet(s"$dir/data").count()
      catch { // an empty stage holds only _SUCCESS — that is 0 rows
        case _: org.apache.spark.sql.AnalysisException => 0L
      }
    writeManifest(dir, Manifest(snapshotId, version, rows, 0L))
  }

  private def appendLineage(
      spark: SparkSession,
      baseDir: String,
      stageName: String,
      snapshotId: String,
      committed: DataFrame,
      bucketCol: Option[String],
      rowsIn: Long,
      version: String,
      wallMs: Long): Unit = {
    import spark.implicits._
    val now = new Timestamp(System.currentTimeMillis())
    val perPart: Seq[(Int, Long)] = bucketCol match {
      case Some(b) if committed.columns.contains(b) =>
        committed.groupBy(col(b).cast("int")).count()
          .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      case _ => Seq((0, committed.count()))
    }
    val rows = perPart.map { case (pid, n) =>
      LineageRow(stageName, snapshotId, pid, s"$stageName/data",
        rowsIn, n, version, wallMs, now)
    }
    spark.createDataset(rows).write.mode(SaveMode.Append)
      .parquet(s"$baseDir/lineage")
  }
}
