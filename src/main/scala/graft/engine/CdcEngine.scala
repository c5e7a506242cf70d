package graft.engine

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.icelite.{Icelite, IceliteTable}
import graft.model.ChangeEvent

/** Engine configuration.
  *
  * @param buckets        hash buckets of the table (pmod(xxhash64(repo,path), buckets)).
  *                       At 100 TB this would be 2^14..2^16; tests use small values.
  * @param saltBuckets    >1 enables two-phase salted LWW aggregation: phase 1
  *                       groups by (key, salt) so a hot key (hot repo) spreads
  *                       over `saltBuckets` reducers, phase 2 finalizes per key.
  *                       0/1 = single-phase (Catalyst partial aggregation already
  *                       combines map-side, which defuses most skew for algebraic
  *                       aggregates — see docs/DESIGN notes in README).
  * @param writeSaltPerBucket  parallel writer tasks per affected bucket — a hot
  *                       bucket writes multiple data files instead of one big one.
  * @param mergeShufflePartitions  shuffle partitions for the merge aggregation;
  *                       0 = leave session setting.
  */
case class EngineConf(
    buckets: Int = 64,
    saltBuckets: Int = 0,
    writeSaltPerBucket: Int = 1,
    mergeShufflePartitions: Int = 0)

case class CommitResult(
    epoch: Long,
    snapshotId: Long,
    skipped: Boolean,
    events: Long,
    affectedBuckets: Int,
    millis: Long) {
  def eventsPerSec: Double = if (millis <= 0) 0.0 else events * 1000.0 / millis
}

/** The CDC/incremental-ingest engine: applies micro-batches of change events
  * to an icelite table with per-key, per-COLUMN last-writer-wins semantics.
  *
  * Semantics contract (replay equivalence, BASELINE.json north_rule):
  * the table state after applying any partition of the event stream into
  * batches, in any delivery order, with any duplication, equals the state of
  * a sequential fold of the events sorted by (commit_lsn, seq). That holds
  * because each payload column is stored as a *cell* struct
  * `(l: last-set lsn, s: last-set seq, v: value)` and merge = max(cell) per
  * column — an associative, commutative, idempotent (ACI) reduction, so
  * batch boundaries and delivery order cannot change the result.
  *
  * This generalizes the reference's carry-forward window
  * (`last(col, ignorenulls=True)` over snapshot order,
  * /root/reference/spark_etl/spark_batched.py:623-648) and its as-of base-row
  * MERGE (/root/reference/etl/fact_changed.py:600-633) into a single
  * shuffle-once hash aggregation — no window sort, no per-row RPC.
  *
  * Deletes are revocable tombstones kept in the table (filtered out of
  * `currentState`), mirroring revoked cancellations
  * (/root/reference/etl/fact_changed.py:339-356).
  */
class CdcEngine(
    val spark: SparkSession,
    val table: IceliteTable,
    val conf: EngineConf = EngineConf()) {

  import CdcEngine._

  private val keyCols = ChangeEvent.keyCols
  private def keyColumns: Seq[Column] = keyCols.map(col)

  /** Table bucket of a key — the engine's physical partitioning function. */
  def bucketCol: Column =
    pmod(xxhash64(keyColumns: _*), lit(conf.buckets)).cast(IntegerType)

  // ---------------------------------------------------------------- schema

  /** Payload fields of an incoming flat batch (everything not envelope).
    * Reserved names would silently collide with the engine's internal
    * columns (cell envelope, bucket/salt partitioners) — reject loudly. */
  private def payloadOf(df: DataFrame): StructType = {
    val reserved = Set(OpCell, TsCell, "__b", SaltCol)
    val bad = df.schema.fieldNames.filter(reserved.contains)
    require(bad.isEmpty,
      s"batch uses reserved column name(s): ${bad.mkString(", ")}")
    val missing = ChangeEvent.envelopeCols.filterNot(df.schema.fieldNames.contains)
    require(missing.isEmpty,
      s"batch is missing envelope column(s): ${missing.mkString(", ")} " +
        s"(required: ${ChangeEvent.envelopeCols.mkString(", ")})")
    StructType(df.schema.fields.filterNot(f => ChangeEvent.envelopeCols.contains(f.name)))
  }

  /** Payload fields recorded in the table's current (cell-form) schema. */
  private def tablePayload: StructType = table.currentSchema match {
    case None => StructType(Nil)
    case Some(st) => StructType(st.fields.collect {
      case f if !keyCols.contains(f.name) && f.name != OpCell && f.name != TsCell =>
        StructField(f.name, f.dataType.asInstanceOf[StructType]("v").dataType, nullable = true)
    })
  }

  // ---------------------------------------------------------------- cells

  /** Flat events -> cell form. Each payload column c becomes
    * struct(l=commit_lsn, s=seq, v=c) when c is set, else NULL (null cells
    * are ignored by max(), which is exactly "absent field = carry forward"). */
  private def batchToCells(batch: DataFrame, targetPayload: StructType): DataFrame = {
    val lsn = col("commit_lsn")
    val seqC = col("seq")
    val batchCols = batch.columns.toSet
    val cells = targetPayload.fields.toSeq.map { f =>
      if (batchCols.contains(f.name))
        when(col(f.name).isNotNull,
          struct(lsn.as("l"), seqC.as("s"), col(f.name).cast(f.dataType).as("v"))).as(f.name)
      else lit(null).cast(cellType(f.dataType)).as(f.name)
    }
    val envelope = Seq(
      struct(lsn.as("l"), seqC.as("s"), col("op").as("v")).as(OpCell),
      struct(lsn.as("l"), seqC.as("s"), col("ts").cast(TimestampType).as("v")).as(TsCell))
    batch
      .filter(keyColumns.map(_.isNotNull).reduce(_ && _) &&
        col("op").isNotNull && lsn.isNotNull && seqC.isNotNull)
      .select((keyColumns ++ envelope ++ cells): _*)
  }

  /** Read current state (cell form) for some buckets, aligned (cast/null-fill)
    * to the target payload schema. Groups files by their writer schema id so
    * widened columns are up-cast explicitly — old data files are never
    * rewritten on schema evolution. */
  private def readStateCells(buckets: Option[Set[Int]], targetPayload: StructType,
      asOfSnapshot: Option[Long] = None): DataFrame = {
    val groups = asOfSnapshot match {
      case Some(id) => table.fileGroupsAt(id, buckets)
      case None => table.currentFileGroups(buckets)
    }
    val cellCols = Seq(OpCell, TsCell) ++ targetPayload.fieldNames
    val target = stateSchema(targetPayload)
    val aligned = groups.toSeq.map { case (sid, files) =>
      val written = table.schema(sid)
      val writtenNames = written.fieldNames.toSet
      val cols = target.fields.toSeq.map { f =>
        if (writtenNames.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }
      spark.read.schema(written).parquet(files: _*).select(cols: _*)
    }
    aligned.reduceOption(_ unionByName _).getOrElse {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], target)
    }
  }

  /** The ACI last-writer-wins reduction: per key, per cell column, keep the
    * struct with the greatest (l, s) — null cells (column absent = carry
    * forward) are skipped by max(). Optionally two-phase over a salt to
    * spread hot keys (north-rule skew handling).
    *
    * Plan note: this is a SortAggregate by necessity, and that is the right
    * plan. HashAggregateExec only supports fixed-size primitive aggregation
    * buffers; any latest-row aggregate whose buffer carries a string/struct
    * (max(struct), max_by, window row_number alike) sorts per partition.
    * What matters at scale is preserved: ONE shuffle on the key, map-side
    * partial aggregation before it, no per-row lookups. (max_by was tried:
    * same SortAggregate, with a second buffer column for the ordering —
    * strictly fatter than max(struct).) */
  private def lwwAgg(df: DataFrame, cellCols: Seq[String]): DataFrame = {
    def aggs = cellCols.map(c => max(col(c)).as(c))
    if (conf.saltBuckets > 1) {
      val salted = df.withColumn(SaltCol,
        pmod(xxhash64(col(s"$OpCell.l"), col(s"$OpCell.s")), lit(conf.saltBuckets)))
      val phase1 = salted.groupBy((keyColumns :+ col(SaltCol)): _*)
        .agg(aggs.head, aggs.tail: _*)
      phase1.groupBy(keyColumns: _*).agg(aggs.head, aggs.tail: _*)
    } else {
      df.groupBy(keyColumns: _*).agg(aggs.head, aggs.tail: _*)
    }
  }

  // ---------------------------------------------------------------- apply

  /** Apply one micro-batch. Idempotent: a re-delivered epoch is a no-op.
    * The batch DataFrame is flat ChangeEvent-shaped (envelope + payload);
    * payload columns may be a superset/widening of the table schema
    * (schema evolution) or a subset (old producers). */
  def applyBatch(epoch: Long, batchRaw: DataFrame): CommitResult = {
    val t0 = System.nanoTime()
    def ms(since: Long): Long = (System.nanoTime() - since) / 1000000
    if (table.committedEpochs.contains(epoch)) {
      return CommitResult(epoch, table.currentSnapshotId, skipped = true, 0, 0, 0)
    }
    if (conf.mergeShufflePartitions > 0)
      spark.conf.set("spark.sql.shuffle.partitions", conf.mergeShufflePartitions)

    val targetPayload = SchemaEvolve.reconcile(tablePayload, payloadOf(batchRaw))
    val cellCols = Seq(OpCell, TsCell) ++ targetPayload.fieldNames

    // Per-bucket source-offset lineage straight off the raw batch (one cheap
    // aggregation; also yields the affected-bucket set for manifest pruning).
    // same validity predicate as batchToCells so lineage counts exactly the
    // applied events (a null-op row must not inflate lineage)
    val lineageRows = batchRaw
      .filter(keyColumns.map(_.isNotNull).reduce(_ && _) &&
        col("op").isNotNull && col("commit_lsn").isNotNull && col("seq").isNotNull)
      .groupBy(bucketCol.as("__b"))
      .agg(min("commit_lsn").as("lmin"), max("commit_lsn").as("lmax"), count(lit(1)).as("n"))
      .collect()
    val lineageMs = ms(t0)
    if (lineageRows.isEmpty) { // empty batch: still commit the epoch (exactly-once bookkeeping)
      val sid = table.ensureSchema(stateSchema(targetPayload))
      val snap = table.commit(epoch, sid, Map.empty, Nil, 0)
      return CommitResult(epoch, snap.snapshotId, skipped = false, 0, 0,
        (System.nanoTime() - t0) / 1000000)
    }
    val affected = lineageRows.map(_.getInt(0)).toSet
    val events = lineageRows.map(_.getLong(3)).sum

    // MERGE = union(batch cells, affected state cells) -> one LWW reduction.
    val batchCells = batchToCells(batchRaw, targetPayload)
    val stateCells = readStateCells(Some(affected), targetPayload)
    val merged = lwwAgg(batchCells.unionByName(stateCells), cellCols)

    // Write affected buckets copy-on-write; salt the repartition so a hot
    // bucket is written by several tasks (multiple files per bucket is fine —
    // the manifest lists files, not "the file").
    val tw0 = System.nanoTime()
    val outDir = table.root.resolve("data").resolve(f"e$epoch%d-${System.nanoTime()}%x")
    val writeTasks = math.max(1, affected.size * math.max(1, conf.writeSaltPerBucket))
    val toWrite = merged.withColumn("__b", bucketCol)
    val repartitioned =
      if (conf.writeSaltPerBucket > 1)
        toWrite.withColumn(SaltCol, pmod(xxhash64(col("path")), lit(conf.writeSaltPerBucket)))
          .repartition(writeTasks, col("__b"), col(SaltCol)).drop(SaltCol)
      else toWrite.repartition(writeTasks, col("__b"))
    repartitioned.write.partitionBy("__b").parquet(outDir.toString)
    val mergeWriteMs = ms(tw0)

    // Manifest entries + per-bucket state row counts. Counts come from the
    // parquet FOOTERS of the files just written (driver-side metadata reads,
    // ~ms per file) — NOT a Spark job: at 4 jobs/batch the driver's serial
    // job-planning time becomes the Amdahl term that caps scaling efficiency.
    val tm0 = System.nanoTime()
    val bucketFiles: Map[Int, List[String]] = listBucketFiles(outDir, table)
    val hadoopConf = spark.sessionState.newHadoopConf()
    val bucketRows: Map[Int, Long] = bucketFiles.map { case (b, files) =>
      b -> files.map { rel =>
        val p = new org.apache.hadoop.fs.Path(table.root.resolve(rel).toString)
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, hadoopConf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
    }
    val manifestMs = ms(tm0)
    val lineage = lineageRows.map { r =>
      val b = r.getInt(0)
      Icelite.BucketLineage(b, r.getLong(1), r.getLong(2), r.getLong(3),
        bucketRows.getOrElse(b, 0L))
    }.toList

    val sid = table.ensureSchema(stateSchema(targetPayload))
    val snap = table.commit(epoch, sid, bucketFiles, lineage, rowDelta = events)
    val totalMs = ms(t0)
    appendMetrics(epoch, snap.snapshotId, events, affected.size, totalMs,
      s""","lineageMs":$lineageMs,"mergeWriteMs":$mergeWriteMs,"manifestMs":$manifestMs""")
    CommitResult(epoch, snap.snapshotId, skipped = false, events, affected.size, totalMs)
  }

  // ---------------------------------------------------------------- read

  /** Current table state, flat: key cols, payload cols, envelope (_op, _lsn,
    * _seq, _ts) and the per-row content invariant sha256. Tombstoned keys are
    * excluded. `buckets` enables manifest-level pruning. */
  def currentState(buckets: Option[Set[Int]] = None): DataFrame =
    stateOf(buckets, asOfSnapshot = None)

  /** Time-travel read: the visible state AS OF a past snapshot id
    * (Iceberg `VERSION AS OF`). The payload schema is the one pinned by
    * that snapshot, not the current one. */
  def stateAt(snapshotId: Long, buckets: Option[Set[Int]] = None): DataFrame =
    stateOf(buckets, asOfSnapshot = Some(snapshotId))

  private def stateOf(buckets: Option[Set[Int]], asOfSnapshot: Option[Long]): DataFrame = {
    val schemaAt = asOfSnapshot match {
      case Some(id) => Some(table.schema(table.snapshot(id).schemaId))
      case None => table.currentSchema
    }
    val payload = StructType(schemaAt.map(_.fields).getOrElse(Array.empty).collect {
      case f if !keyCols.contains(f.name) && f.name != OpCell && f.name != TsCell =>
        StructField(f.name, f.dataType.asInstanceOf[StructType]("v").dataType, nullable = true)
    })
    val cells = readStateCells(buckets, payload, asOfSnapshot)
    val flat = payload.fieldNames.toSeq.map(c => col(s"$c.v").as(c))
    val base = cells
      .filter(col(s"$OpCell.v") =!= lit("D"))
      .select((keyColumns ++ flat ++ Seq(
        col(s"$OpCell.v").as("_op"), col(s"$OpCell.l").as("_lsn"),
        col(s"$OpCell.s").as("_seq"), col(s"$TsCell.v").as("_ts"))): _*)
    if (payload.fieldNames.contains("content"))
      base.withColumn("content_sha256", sha2(col("content"), 256))
    else base
  }

  /** Raw cell-form state (for tests / debugging). */
  def currentCells(buckets: Option[Set[Int]] = None): DataFrame =
    readStateCells(buckets, tablePayload)

  /** Highest source LSN applied up to and including `snapshotId` (from the
    * per-bucket lineage records; -1 for an empty chain prefix). */
  def highWatermark(snapshotId: Long): Long = {
    var id = snapshotId
    var hwm = -1L
    while (id >= 0) {
      val s = table.snapshot(id)
      for (l <- s.lineage) if (l.lsnMax > hwm) hwm = l.lsnMax
      id = s.parentId
    }
    hwm
  }

  /** Incremental change feed: rows whose last-writer LSN is beyond the high
    * watermark of `sinceSnapshotId` — i.e. every key inserted, updated or
    * tombstoned after that snapshot, in current (merged) form. Unlike
    * `currentState`, deletes ARE included (`_op = "D"`) so a downstream
    * consumer can apply them; `_lsn` orders the feed. The LSN predicate
    * lands on the `_op.l` parquet column, so row-group stats skip files
    * whose whole range predates the watermark. */
  def changesSince(sinceSnapshotId: Long, buckets: Option[Set[Int]] = None): DataFrame = {
    val hwm = highWatermark(sinceSnapshotId)
    val payload = tablePayload
    val cells = readStateCells(buckets, payload)
    val flat = payload.fieldNames.toSeq.map(c => col(s"$c.v").as(c))
    cells
      .filter(col(s"$OpCell.l") > hwm)
      .select((keyColumns ++ flat ++ Seq(
        col(s"$OpCell.v").as("_op"), col(s"$OpCell.l").as("_lsn"),
        col(s"$OpCell.s").as("_seq"), col(s"$TsCell.v").as("_ts"))): _*)
  }

  // ---------------------------------------------------------------- maintenance

  /** Compaction: rewrite each selected bucket's file list into one file
    * (Iceberg's rewrite_data_files). The MERGE is copy-on-write per bucket,
    * so multiple files per bucket arise from salted hot-bucket writes
    * (`writeSaltPerBucket` > 1) — compaction folds them back to one file per
    * bucket for cheaper state reads. Commits a new snapshot (batchEpoch=-1 —
    * not an ingest epoch); older snapshots keep referencing the old files,
    * so time travel is unaffected and `vacuum` (which walks the whole chain)
    * keeps them until snapshots are expired. Returns the new snapshot id. */
  def compact(buckets: Option[Set[Int]] = None): Long = {
    val payload = tablePayload
    val groups = table.currentFileGroups(buckets)
    if (groups.isEmpty) return table.currentSnapshotId
    val selected: Set[Int] = buckets.getOrElse(
      table.currentSnapshot.map(_.bucketFiles.keySet.map(_.toInt)).getOrElse(Set.empty))
    val cells = readStateCells(Some(selected), payload)
    val outDir = table.root.resolve("data").resolve(f"compact-${System.nanoTime()}%x")
    cells.withColumn("__b", bucketCol)
      .repartition(selected.size, col("__b"))
      .write.partitionBy("__b").parquet(outDir.toString)
    val bucketFiles = CdcEngine.listBucketFiles(outDir, table)
    val sid = table.ensureSchema(stateSchema(payload))
    table.commit(-1L, sid, bucketFiles, Nil, rowDelta = 0).snapshotId
  }

  // ---------------------------------------------------------------- misc

  private def appendMetrics(epoch: Long, snapId: Long, events: Long, buckets: Int,
      ms: Long, extra: String = ""): Unit = {
    val line = s"""{"epoch":$epoch,"snapshotId":$snapId,"events":$events,""" +
      s""""buckets":$buckets,"millis":$ms,"eventsPerSec":${if (ms > 0) events * 1000.0 / ms else 0.0}$extra}"""
    val p = table.root.resolve("metrics.jsonl")
    Files.writeString(p, line + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }
}

object CdcEngine {
  val OpCell = "_op"
  val TsCell = "_ts"
  private val SaltCol = "__salt"

  def cellType(v: DataType): StructType = StructType(Seq(
    StructField("l", LongType, nullable = true),
    StructField("s", IntegerType, nullable = true),
    StructField("v", v, nullable = true)))

  /** On-disk (cell-form) state schema for a payload schema. */
  def stateSchema(payload: StructType): StructType = StructType(
    Seq(
      StructField("repo", StringType, nullable = true),
      StructField("path", StringType, nullable = true),
      StructField(OpCell, cellType(StringType), nullable = true),
      StructField(TsCell, cellType(TimestampType), nullable = true)) ++
      payload.fields.map(f => StructField(f.name, cellType(f.dataType), nullable = true)))

  /** List parquet files written under `dir/__b=N/` as bucket -> table-relative paths. */
  private[engine] def listBucketFiles(dir: Path, table: IceliteTable): Map[Int, List[String]] = {
    val stream = Files.walk(dir)
    try {
      stream.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .toList
        .groupBy { p =>
          val seg = p.getParent.getFileName.toString // "__b=N"
          seg.stripPrefix("__b=").toInt
        }
        .map { case (b, ps) => b -> ps.map(p => table.relativize(p)).sorted }
    } finally stream.close()
  }
}
