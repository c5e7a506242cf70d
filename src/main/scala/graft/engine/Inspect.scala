package graft.engine

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.icelite.{Icelite, IceliteTable}

/** Iceberg-style inspection metadata tables over an icelite table: the
  * `table.snapshots` / `.history` / `.files` / `.partitions` / `.refs`
  * surface (Iceberg spec "Inspecting tables"), plus a `lineage` table for
  * this engine's per-partition source-offset lineage (the north rule's
  * lineage mandate, queryable instead of buried in manifests).
  *
  * Every table here is built DRIVER-SIDE from manifest metadata and then
  * handed to Spark as a local DataFrame. That is the right scale contract —
  * the same one Iceberg's metadata tables make: inspection cost is
  * O(snapshot chain + live manifest entries), which retention
  * (`expireSnapshots` / `retainSnapshots`) bounds regardless of data volume.
  * At 100 TB the data is petascale but the retained chain is a few hundred
  * manifests; none of these reads touches a data file except the optional
  * `size_bytes` stat (one filesystem stat per live file, same cost class as
  * the footer harvest the commit path already does).
  *
  * Reference analog: the ETL's run-report queries over its audit tables
  * (/root/reference/etl/fact_changed.py:676-694) — generalized here to the
  * full table-format metadata surface.
  */
class Inspect(spark: SparkSession, table: IceliteTable) {
  import Inspect._
  import spark.implicits._

  private def chain: List[Icelite.Snapshot] = table.snapshotChain

  private def kindOf(s: Icelite.Snapshot, parentEff: Option[Int]): String =
    if (s.restoreOf >= 0) "restore"
    // the persisted marker survives chain re-roots (a re-rooted rebucket
    // commit has no parent to compare against); the adjacency fallback
    // classifies legacy manifests written before the marker existed
    else if (s.rebucket || parentEff.exists(_ != table.effectiveBuckets(s)))
      "rebucket"
    else if (s.batchEpoch >= 0) "merge"
    else "maintenance" // compaction and other epoch-less service commits

  /** One row per snapshot on the main chain, root first (Iceberg
    * `table.snapshots`). `kind` distinguishes merge commits (batch epochs)
    * from maintenance (compaction), restores and bucket evolution;
    * `touched_buckets`/`listed_files` expose the DELTA manifest size — the
    * per-commit metadata cost — while `full_manifest` marks re-roots. */
  def snapshots: DataFrame = {
    val c = chain
    val rows = c.zip(None :: c.map(s => Some(table.effectiveBuckets(s)))).map {
      case (s, parentEff) =>
        SnapshotRow(
          committed_at = new Timestamp(s.commitMillis),
          snapshot_id = s.snapshotId,
          parent_id = if (s.parentId < 0) None else Some(s.parentId),
          epoch = if (s.batchEpoch < 0) None else Some(s.batchEpoch),
          kind = kindOf(s, parentEff),
          schema_id = s.schemaId,
          effective_buckets = table.effectiveBuckets(s),
          touched_buckets = s.bucketDelta.size,
          listed_files = s.bucketDelta.valuesIterator.map(_.size).sum,
          applied_events = s.totalRows,
          full_manifest = s.full,
          restore_of = if (s.restoreOf < 0) None else Some(s.restoreOf),
          carried_epochs = s.carriedEpochs.size,
          carried_watermark =
            if (s.carriedWatermark < 0) None else Some(s.carriedWatermark))
    }
    rows.toDF()
  }

  /** Iceberg `table.history`: when each snapshot became reachable and from
    * which ref. Main-chain snapshots are current ancestors; snapshots held
    * by a tag or an unpublished branch lane are listed with
    * `is_current_ancestor = false`. Reachability is BY REF: a snapshot
    * rolled away by `rollbackTo` reappears here only while a tag or branch
    * still points at it — otherwise it is unreferenced garbage awaiting
    * vacuum, not history (narrower than Iceberg, whose metadata log also
    * retains ref-less rolled-back entries). `made_current_at` is the commit
    * time — exact for main, and for branch lanes the moment the lane head
    * advanced. Refs whose manifest a concurrent drop+vacuum already
    * reclaimed are skipped, mirroring vacuum's own existence guards. */
  def history: DataFrame = {
    val main = chain
    val onMain = main.map(_.snapshotId).toSet
    val mainRows = main.map(s => HistoryRow(
      new Timestamp(s.commitMillis), s.snapshotId,
      if (s.parentId < 0) None else Some(s.parentId), "main",
      is_current_ancestor = true))
    val branchRows = table.branches.toList.sortBy(_._1)
      .filter { case (_, head) => table.hasSnapshot(head) }
      .flatMap { case (name, head) =>
        table.chainFrom(head).filterNot(s => onMain(s.snapshotId)).map(s =>
          HistoryRow(new Timestamp(s.commitMillis), s.snapshotId,
            if (s.parentId < 0) None else Some(s.parentId), name,
            is_current_ancestor = false))
      }
    val tagRows = table.tags.toList.sortBy(_._1).collect {
      case (name, id) if !onMain(id) && table.hasSnapshot(id) =>
        val s = table.snapshot(id)
        HistoryRow(new Timestamp(s.commitMillis), s.snapshotId,
          if (s.parentId < 0) None else Some(s.parentId), name,
          is_current_ancestor = false)
    }
    (mainRows ++ branchRows ++ tagRows).toDF()
  }

  /** Iceberg `table.refs`: every named pointer — `main`, tags, branches. */
  def refs: DataFrame = {
    val main =
      if (table.currentSnapshotId < 0) Nil
      else List(RefRow("main", "branch", table.currentSnapshotId))
    val branches = table.branches.toList.sortBy(_._1)
      .map { case (n, id) => RefRow(n, "branch", id) }
    val tags = table.tags.toList.sortBy(_._1)
      .map { case (n, id) => RefRow(n, "tag", id) }
    (main ++ branches ++ tags).toDF()
  }

  /** Iceberg `table.files`: one row per LIVE data file at a snapshot
    * (default: current) — bucket, manifest stats (rows, last-writer-LSN
    * bounds, key-fingerprint presence), on-disk size, and `origin`, the
    * commit kind that wrote the file (parsed from the data-dir layout:
    * `e<epoch>-*` ingest, `compact-*`, `rebucket-*`). Time travel: pass any
    * chain snapshot id. */
  def files(snapshotId: Long = -1L): DataFrame = {
    val resolved =
      if (snapshotId >= 0) Some(table.snapshot(snapshotId))
      else table.currentSnapshot
    resolved match {
      case None => spark.emptyDataset[FileRow].toDF()
      case Some(s) => filesOf(s)
    }
  }

  private def filesOf(s: Icelite.Snapshot): DataFrame = {
    val rows = table.bucketFilesOf(s).toList
      .map { case (b, fs) => (b.toInt, fs) }.sortBy(_._1)
      .flatMap { case (bucket, fs) =>
        fs.map { f =>
          val abs = table.root.resolve(f.path)
          FileRow(
            snapshot_id = s.snapshotId,
            bucket = bucket,
            file_path = f.path,
            origin = originOf(f.path),
            rows = f.rows,
            live_rows = if (f.liveRows >= 0) Some(f.liveRows) else None,
            size_bytes =
              if (Files.isRegularFile(abs)) Some(Files.size(abs)) else None,
            schema_id = f.schemaId,
            min_lsn = if (f.minLsn == Long.MinValue) None else Some(f.minLsn),
            max_lsn = if (f.maxLsn == Long.MaxValue) None else Some(f.maxLsn),
            has_key_fp = f.keyFp.nonEmpty,
            merged = f.merged,
            col_stats = f.colStats.getOrElse(Map.empty)
              .map { case (c, b) => c -> (b: Seq[String]) })
        }
      }
    rows.toDF()
  }

  /** Iceberg `table.partitions`: per-bucket rollup of `files` — file and
    * delta-file counts, physical rows and bytes, LSN coverage. The skew
    * dashboard: a hot bucket shows up as the row with the outlier
    * `rows`/`files` before it becomes a straggler. */
  def partitions(snapshotId: Long = -1L): DataFrame =
    partitionsOf(files(snapshotId))

  private def partitionsOf(fileTable: DataFrame): DataFrame =
    fileTable.groupBy("bucket").agg(
      count(lit(1)).as("files"),
      sum("rows").as("rows"),
      sum(coalesce(col("size_bytes"), lit(0L))).as("bytes"),
      sum(when(col("has_key_fp"), 1).otherwise(0)).as("delta_files"),
      min("min_lsn").as("min_lsn"),
      max("max_lsn").as("max_lsn"))
      .orderBy("bucket")

  /** The per-commit metrics journal (`metrics.jsonl` — epoch, snapshot,
    * events, affected buckets, wall millis, events/sec, phase timings) as a
    * queryable DataFrame: the throughput dashboard over a replay. Unlike the
    * manifest-backed tables, this reads the journal through Spark's JSON
    * source, so a 10^5-commit journal scans distributed. Empty (correctly
    * schemaless-empty) when no commit has run. */
  def metrics: DataFrame = {
    val p = table.root.resolve("metrics.jsonl")
    // spark.read paths are Hadoop GLOBS: escape metacharacters that are
    // legal in directory names, or a table rooted at e.g. .../run[3]/t
    // silently matches nothing
    if (Files.isRegularFile(p)) spark.read.json(globEscape(p.toString))
    else spark.emptyDataFrame
  }

  /** Vacuum DRY-RUN (Iceberg's `remove_orphan_files(dry_run => true)`): every
    * file `vacuum(graceMillis)` would reclaim right now — data files no
    * retained snapshot, tag, or branch references, and dead off-chain
    * manifests — with size and age, so retention policy can be audited
    * before any delete. Shares the live-set computation with `vacuum`
    * itself (one code path, they cannot disagree). */
  def orphans(graceMillis: Long = 0L, asOfMillis: Long = -1L): DataFrame = {
    val rows = table.vacuumDryRun(graceMillis, asOfMillis).toList.map { case (rel, kind) =>
      val abs = table.root.resolve(rel)
      OrphanRow(
        file_path = rel,
        kind = kind,
        size_bytes =
          if (Files.isRegularFile(abs)) Some(Files.size(abs)) else None,
        modified_at =
          if (Files.isRegularFile(abs))
            Some(new Timestamp(Files.getLastModifiedTime(abs).toMillis))
          else None)
    }
    rows.toDF()
  }

  /** Register every inspection table as a temp view —
    * `<prefix>_snapshots`, `_history`, `_refs`, `_files`, `_partitions`,
    * `_lineage`, `_metrics`, `_orphans` — so the whole metadata surface is
    * one `spark.sql` away (Iceberg's `db.table.snapshots` idiom, spelled as
    * views because this table format lives outside any catalog). Views are
    * materialized AT registration (driver-built local frames); re-register
    * after commits to see newer metadata. */
  def register(prefix: String): Unit = {
    snapshots.createOrReplaceTempView(s"${prefix}_snapshots")
    history.createOrReplaceTempView(s"${prefix}_history")
    refs.createOrReplaceTempView(s"${prefix}_refs")
    // one manifest walk + per-file stat pass serves both file-level views
    // (files() is a driver-built local relation — reusing the DataFrame
    // reuses the materialized rows)
    val f = files()
    f.createOrReplaceTempView(s"${prefix}_files")
    partitionsOf(f).createOrReplaceTempView(s"${prefix}_partitions")
    lineage.createOrReplaceTempView(s"${prefix}_lineage")
    metrics.createOrReplaceTempView(s"${prefix}_metrics")
    orphans().createOrReplaceTempView(s"${prefix}_orphans")
  }

  /** Per-partition source lineage, flattened across the chain: which source
    * LSN range each commit applied to each bucket, with event and row
    * counts. This is the engine's `source offset range -> snapshot id`
    * mandate as a queryable table — `GROUP BY bucket` gives per-partition
    * applied watermarks, `WHERE snapshot_id = X` audits one commit. */
  def lineage: DataFrame = {
    val rows = chain.flatMap { s =>
      s.lineage.map(l => LineageRow(
        snapshot_id = s.snapshotId,
        epoch = if (s.batchEpoch < 0) None else Some(s.batchEpoch),
        committed_at = new Timestamp(s.commitMillis),
        bucket = l.bucket,
        lsn_min = l.lsnMin,
        lsn_max = l.lsnMax,
        events = l.events,
        rows = l.rows))
    }
    rows.toDF()
  }
}

object Inspect {
  /** Escape Hadoop-glob metacharacters so a literal filesystem path stays
    * literal when handed to `spark.read` (which globs its input paths). */
  private[engine] def globEscape(path: String): String =
    path.replaceAll("([\\[\\]{}*?])", "\\\\$1")

  /** Commit kind that wrote a data file, from the data-dir naming scheme. */
  private[engine] def originOf(relPath: String): String = {
    val seg = relPath.split('/') match {
      case a if a.length >= 2 && a(0) == "data" => a(1)
      case _ => ""
    }
    if (seg.startsWith("compact-")) "compact"
    else if (seg.startsWith("rebucket-")) "rebucket"
    else if (seg.length > 1 && seg(0) == 'e' && seg(1).isDigit) "ingest"
    else "unknown"
  }

  case class SnapshotRow(
      committed_at: Timestamp,
      snapshot_id: Long,
      parent_id: Option[Long],
      epoch: Option[Long],
      kind: String,
      schema_id: Int,
      effective_buckets: Int,
      touched_buckets: Int,
      listed_files: Int,
      // cumulative source events applied by merge commits up to this
      // snapshot (the manifest's running counter; maintenance commits
      // contribute 0) — an events-applied watermark, not a physical row count
      applied_events: Long,
      full_manifest: Boolean,
      restore_of: Option[Long],
      carried_epochs: Int,
      carried_watermark: Option[Long])

  case class HistoryRow(
      made_current_at: Timestamp,
      snapshot_id: Long,
      parent_id: Option[Long],
      ref: String,
      is_current_ancestor: Boolean)

  case class RefRow(name: String, ref_type: String, snapshot_id: Long)

  case class FileRow(
      snapshot_id: Long,
      bucket: Int,
      file_path: String,
      origin: String,
      rows: Long,
      // rows VISIBLE to readers (rows minus retained tombstones); None =
      // footer-undecidable or a pre-liveRows manifest — the same stat
      // metadata-only count(*) sums (CdcEngine.metaCount)
      live_rows: Option[Long],
      size_bytes: Option[Long],
      schema_id: Int,
      min_lsn: Option[Long],
      max_lsn: Option[Long],
      has_key_fp: Boolean,
      // merged final-state file (stats-prunable) vs merge-on-read delta
      merged: Boolean,
      // harvested [min, max] bounds per stats column (canonical strings)
      col_stats: Map[String, Seq[String]])

  case class OrphanRow(
      file_path: String,
      kind: String,
      size_bytes: Option[Long],
      modified_at: Option[Timestamp])

  case class LineageRow(
      snapshot_id: Long,
      epoch: Option[Long],
      committed_at: Timestamp,
      bucket: Int,
      lsn_min: Long,
      lsn_max: Long,
      events: Long,
      rows: Long)
}
