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
    mergeShufflePartitions: Int = 0,
    // merge-on-read tables only: auto-compact a bucket back to one file
    // once its delta-file count reaches this (0 = manual compaction only).
    // Write-mode guidance for sustained ingest: on a GROWING table (new
    // keys keep arriving) copy-on-write rewrites O(state) per batch —
    // quadratic over a long replay — while merge-on-read writes O(batch)
    // plus amortized compaction; measured 64M-event curves are in
    // BENCH.md's sustained-ingest section. COW fits update-heavy tables
    // with a bounded key set and read-hot workloads.
    morCompactThreshold: Int = 0,
    // opt-in SIZE-TIERED auto-maintenance (LSM leveling): when a bucket
    // crosses morCompactThreshold, fold ONLY its delta pile
    // (compactDeltas — write work O(pile)) while the pile is small next
    // to the merged base, and run the full rewrite only when combined
    // delta rows reach this fraction of base rows — or when the bucket
    // has no base yet to fold against. Bounds maintenance write work per
    // crossing at ~ratio × base instead of (1 + ratio) × base, at the
    // cost that tombstone GC (tombstonePurgeLagLsn) only runs on the
    // full-rewrite rounds. 0.0 = off: every crossing is a full rewrite
    // (the previous behavior).
    morMinorRatio: Double = 0.0,
    // tombstone GC (the Kafka log-compaction / Iceberg delete-file-expiry
    // analog): >= 0 makes every AUTO-compaction also drop tombstone rows
    // whose delete LSN is below highWatermark - lag. Deletes are retained
    // as revocable tombstones by default, which under sustained churn
    // accumulates rows that are invisible yet rewritten by every
    // compaction forever — unbounded at 10^10 events. The lag is the
    // source's replay lower bound: the caller contracts that no event
    // with an LSN below (highWatermark - lag) will EVER arrive; a
    // sub-line event delivered after a purge would meet no tombstone to
    // lose against and resurrect the key. -1 = keep tombstones forever
    // (explicit compact(purgeTombstonesBelowLsn=...) still available).
    tombstonePurgeLagLsn: Long = -1L,
    // snapshot retention: once the chain exceeds 2x this, expire down to
    // this many (0 = keep all history). Bounds manifest accumulation over
    // long replays (10^5 micro-batches must not mean 10^5 manifest files);
    // exactly-once bookkeeping and the high watermark survive expiration
    // via carriedEpochs/carriedWatermark. The 2x hysteresis keeps the
    // re-rooting write amortized O(1) per batch.
    retainSnapshots: Int = 0,
    // pair every auto-expiry with a vacuum (Iceberg's expire_snapshots +
    // remove_orphan_files): without it a long replay's superseded data
    // files — every compaction and copy-on-write rewrite leaves a full
    // older copy on disk — accumulate without bound (measured: a
    // 1000-micro-batch merge-on-read replay with periodic compaction
    // filled 73 GB of superseded files; see BENCH.md). Grace excludes
    // recently-written uncommitted files (in-flight writers).
    vacuumAfterExpire: Boolean = false,
    vacuumGraceMillis: Long = 3600000L,
    // multi-writer optimistic concurrency: how many consecutive commit
    // races (CommitConflictException) a copy-on-write applyBatch re-merges
    // through before giving up. Each retry recomputes the merge against
    // the fresh snapshot; the loser's data files are vacuum-grace orphans.
    maxCommitRetries: Int = 8,
    // key-fingerprint bitmap width (bits) stored per merge-on-read delta
    // file in the manifest (Iceberg Puffin-bloom analog; 0 = disabled).
    // Computed INSIDE the existing per-bucket lineage aggregation — zero
    // extra Spark jobs, and the per-bucket transfer is bounded at
    // `keyFpBits` ints no matter the batch size (fingerprints, not keys,
    // are collected). Point lookups use it to open only the delta files
    // that may contain the key: O(1) file opens per lookup instead of
    // O(delta files in the bucket). Bitmaps are dropped when a bucket's
    // batch-key load would push the false-positive rate past 25%.
    keyFpBits: Int = 4096,
    // payload columns whose per-file [min, max] bounds are harvested into
    // the manifest whenever MERGED (final-state) files are written — the
    // copy-on-write rewrite, compact(), rebucket() — from the same parquet
    // footer pass that yields the LSN stats (no extra Spark job), and used
    // by scanRange for manifest-level file skipping. Key columns gain
    // nothing here (buckets hash-partition the key domain, so key ranges
    // never prune — that job belongs to keyFp); this is for PAYLOAD
    // predicates, and it bites once compact(sortBy = <col>) clusters the
    // column so per-file ranges are tight and disjoint. Merge-on-read
    // DELTA files are never harvested or pruned: a payload predicate
    // cannot soundly skip a file whose rows other files' carry-forward
    // merges depend on. Empty = no column stats.
    statsCols: Seq[String] = Nil,
    // Opt-in WRITE-TIME clustering (Iceberg's write sort order): sort each
    // copy-on-write bucket rewrite by these payload columns (then key) and
    // split it into files of at most writeMaxFileRows rows, so statsCols
    // bounds are tight and range-disjoint on FRESH files — selective scans
    // prune without waiting for a sort-rewrite compaction. Costs a
    // per-partition sort on the ingest hot path (no extra shuffle: the
    // sort rides the existing per-bucket repartition); leave empty for
    // pure-throughput ingest and cluster at compaction instead.
    // Merge-on-read deltas ignore both knobs at WRITE time (deltas are
    // never stats-pruned — see statsCols), but threshold auto-compaction
    // applies them as the table's DECLARED sort order (the Iceberg
    // table-sort-order contract), so a MOR table gets clustered,
    // stats-prunable files from its normal maintenance with zero hot-path
    // cost. A column absent from a batch's
    // payload (pre-evolution writers) is skipped for that write. With
    // writeSaltPerBucket > 1 the salt files sort independently, so their
    // ranges overlap — pruning stays sound, just less selective.
    writeSortCols: Seq[String] = Nil,
    writeMaxFileRows: Long = 0L,
    // Declared Z-ORDER clustering (Delta's OPTIMIZE ZORDER BY / Iceberg's
    // z-order rewrite strategy), applied ONLY at maintenance time —
    // threshold auto-compaction and explicit compact() — never on the
    // ingest hot path (matching Delta/Iceberg, where z-order is an
    // OPTIMIZE-time rewrite: the interleave needs global column bounds a
    // hot batch write should not pay to learn). 2-4 payload columns;
    // files come out clustered on the Z-curve of ALL of them, so a
    // predicate on ANY named column prunes files via its statsCols
    // bounds — the multi-column answer to writeSortCols' lexicographic
    // bias, where only the leading column's bounds are tight. Takes
    // precedence over writeSortCols at auto-compaction when set. See
    // compact(zorderBy = ...).
    zorderCols: Seq[String] = Nil,
    // dead-letter quarantine: non-empty = malformed events (null key
    // column, op, lsn or seq — rows the merge's validity predicate would
    // silently drop) are written to `<dlqDir>/epoch=N` parquet with a
    // `_reason` column before the merge runs, and their count is surfaced
    // on the CommitResult and in metrics.jsonl. A CDC source that emits
    // garbage must be VISIBLE, not silently thinner; the quarantine rides
    // the batch's own Spark job budget (one extra filtered write, only
    // when enabled) and counts come from parquet footers driver-side.
    dlqDir: String = "")

case class CommitResult(
    epoch: Long,
    snapshotId: Long,
    skipped: Boolean,
    events: Long,
    affectedBuckets: Int,
    millis: Long,
    // malformed events quarantined to the dead-letter dir (0 when the DLQ
    // is disabled — they are then dropped by the validity predicate)
    rejected: Long = 0L) {
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

  // The bucket count is PHYSICAL table layout: every manifest prune, point
  // lookup and write partition derives from it. An engine configured with a
  // different count than the table's CURRENT layout (creation-time, or the
  // last rebucket) would write rows into the wrong buckets and prune reads
  // incorrectly — fail construction loudly instead of corrupting silently.
  require(table.currentBuckets == conf.buckets,
    s"engine buckets (${conf.buckets}) != table buckets (${table.currentBuckets}) " +
      s"for table ${table.root}")

  /** Layout guard re-checked on every bucket-dependent operation: a
    * rebucket (possibly by another engine instance) invalidates this
    * instance's pruning and write partitioning. */
  private def checkLayout(): Unit = {
    val cur = table.currentBuckets
    require(cur == conf.buckets,
      s"table ${table.root} is bucketed at $cur but this engine was built " +
        s"for ${conf.buckets} (rebucketed?); construct a new CdcEngine for the current layout")
  }

  private val keyCols = ChangeEvent.keyCols
  private def keyColumns: Seq[Column] = keyCols.map(col)

  /** Table bucket of a key — the engine's physical partitioning function. */
  def bucketCol: Column =
    pmod(xxhash64(keyColumns: _*), lit(conf.buckets)).cast(IntegerType)

  /** Key fingerprint for the manifest bitmap stats. Salted with a leading
    * literal so it is INDEPENDENT of `bucketCol`'s hash: with the same hash,
    * a power-of-two bucket count dividing `keyFpBits` would leave only
    * `keyFpBits / buckets` reachable fingerprints inside any one bucket,
    * collapsing the bitmap's resolution. */
  private def keyFpCol: Column =
    pmod(xxhash64((lit("kfp") +: keyColumns): _*), lit(conf.keyFpBits)).cast(IntegerType)

  // ---------------------------------------------------------------- schema

  /** Payload fields of an incoming flat batch (everything not envelope).
    * Reserved names would silently collide with the engine's internal
    * columns (cell envelope, bucket/salt partitioners) — reject loudly. */
  private def payloadOf(df: DataFrame): StructType = {
    // _lsn/_seq/_op/_ts are the flat-read envelope and content_sha256 the
    // derived invariant column — a payload under any of these names would
    // silently collide with (or be replaced by) engine output on every read
    val reserved = Set(OpCell, TsCell, "__b", SaltCol,
      "_op", "_ts", "_lsn", "_seq", "content_sha256")
    val bad = df.schema.fieldNames.filter(reserved.contains)
    require(bad.isEmpty,
      s"batch uses reserved column name(s): ${bad.mkString(", ")}")
    val missing = ChangeEvent.envelopeCols.filterNot(df.schema.fieldNames.contains)
    require(missing.isEmpty,
      s"batch is missing envelope column(s): ${missing.mkString(", ")} " +
        s"(required: ${ChangeEvent.envelopeCols.mkString(", ")})")
    // envelope TYPES are load-bearing, not just presence: commit_lsn/seq
    // drive LWW ordering as struct fields — a string lsn would coerce the
    // whole cell envelope to string and order "9" above "10" with no error
    // anywhere. Reject loudly; only ts may arrive as a castable string
    // (routed through the fallible-cast quarantine).
    // NullType (an all-null literal column) is always acceptable: it casts
    // losslessly and every such row is quarantined per-row as null_*
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    def ok(c: String, accept: DataType => Boolean, want: String): Unit =
      require(types(c) == NullType || accept(types(c)),
        s"envelope column $c must be $want, got ${types(c).sql}")
    def integral(dt: DataType): Boolean =
      dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType
    ok("op", _ == StringType, "STRING")
    ok("commit_lsn", integral, "an integral type")
    ok("seq", integral, "an integral type")
    ok("ts", t => t == TimestampType || t == StringType,
      "TIMESTAMP (or a castable STRING)")
    keyCols.foreach(k => ok(k, _ == StringType, "STRING"))
    StructType(df.schema.fields.filterNot(f => ChangeEvent.envelopeCols.contains(f.name)))
  }

  /** Payload fields of a (cell-form) table schema. */
  private def payloadOfSchema(schema: Option[StructType]): StructType =
    StructType(schema.map(_.fields).getOrElse(Array.empty[StructField]).collect {
      case f if !keyCols.contains(f.name) && f.name != OpCell && f.name != TsCell =>
        StructField(f.name, f.dataType.asInstanceOf[StructType]("v").dataType, nullable = true)
    })

  /** Payload fields recorded in the table's current (cell-form) schema. */
  private def tablePayload: StructType = payloadOfSchema(table.currentSchema)

  // ---------------------------------------------------------------- cells

  /** Batch columns whose cast to the reconciled schema is FALLIBLE — able
    * to null (or, under ANSI, throw on) a non-null source value. Payload
    * casts are widen-only by SchemaEvolve.reconcile, so in practice this is
    * the `ts` envelope when a caller ships it as a string; the payload scan
    * is kept general so the quarantine stays correct if the legal-evolution
    * set ever loosens. Returns column -> target type. */
  private def fallibleCasts(batch: DataFrame,
      targetPayload: StructType): Map[String, DataType] = {
    val bt = batch.schema.fields.map(f => f.name -> f.dataType).toMap
    val payload = targetPayload.fields.toSeq.collect {
      case f if bt.get(f.name).exists(b => b != f.dataType &&
          !SchemaEvolve.widen(b, f.dataType).contains(f.dataType)) =>
        f.name -> f.dataType
    }
    val ts: Seq[(String, DataType)] =
      if (bt.get("ts").contains(StringType)) Seq("ts" -> TimestampType) else Nil
    (payload ++ ts).toMap
  }

  private def tryCastCol(c: String, t: DataType): Column =
    expr(s"try_cast(`$c` AS ${t.sql})")

  /** TRUE on rows where any fallible cast would turn a non-null source
    * value into a null cell — such rows are quarantined (`cast_error`), not
    * silently null-merged. lit(false) when nothing is fallible (the normal
    * case: zero per-row cost). */
  private def castFailPred(fallible: Map[String, DataType]): Column =
    fallible.toSeq.sortBy(_._1).map { case (c, t) =>
      col(c).isNotNull && tryCastCol(c, t).isNull
    }.reduceOption(_ || _).getOrElse(lit(false))

  /** Flat events -> cell form. Each payload column c becomes
    * struct(l=commit_lsn, s=seq, v=c) when c is set, else NULL (null cells
    * are ignored by max(), which is exactly "absent field = carry forward").
    * `applyPred` gates the rows (validity + no fallible-cast failure);
    * fallible casts project through try_cast so ANSI mode cannot throw on a
    * quarantined row before the filter lands. */
  private def batchToCells(batch: DataFrame, targetPayload: StructType,
      fallible: Map[String, DataType], applyPred: Column): DataFrame = {
    val lsn = col("commit_lsn")
    val seqC = col("seq")
    val batchCols = batch.columns.toSet
    def castOf(c: String, t: DataType): Column =
      if (fallible.contains(c)) tryCastCol(c, t) else col(c).cast(t)
    val cells = targetPayload.fields.toSeq.map { f =>
      if (batchCols.contains(f.name))
        when(col(f.name).isNotNull,
          struct(lsn.as("l"), seqC.as("s"), castOf(f.name, f.dataType).as("v"))).as(f.name)
      else lit(null).cast(cellType(f.dataType)).as(f.name)
    }
    val envelope = Seq(
      struct(lsn.as("l"), seqC.as("s"), col("op").as("v")).as(OpCell),
      struct(lsn.as("l"), seqC.as("s"), castOf("ts", TimestampType).as("v")).as(TsCell))
    batch
      .filter(applyPred)
      .select((keyColumns ++ envelope ++ cells): _*)
  }

  /** Read (sid -> files) groups in cell form, each group aligned
    * (cast/null-fill) to the target payload schema — files are grouped by
    * writer schema id so widened columns are up-cast explicitly and old
    * data files are never rewritten on schema evolution. */
  private def readAligned(groups: Map[Int, Seq[String]], targetPayload: StructType): DataFrame = {
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

  /** Flatten merged cell rows to the feed shape: keys, payload values, and
    * the (_op, _lsn, _seq, _ts) envelope. */
  private def flattenCells(cells: DataFrame, payload: StructType): DataFrame = {
    val flat = payload.fieldNames.toSeq.map(c => col(s"$c.v").as(c))
    cells.select((keyColumns ++ flat ++ Seq(
      col(s"$OpCell.v").as("_op"), col(s"$OpCell.l").as("_lsn"),
      col(s"$OpCell.s").as("_seq"), col(s"$TsCell.v").as("_ts"))): _*)
  }

  /** Read current state (cell form) for some buckets, aligned to the target
    * payload schema.
    *
    * Merge-on-read tables: bucket file lists hold per-batch DELTA files, so
    * the visible state is the LWW cell merge across them — the same ACI
    * reduction the write path uses, applied at read time (Hudi/Iceberg MOR
    * semantics). The merge (a shuffle) is paid ONLY for buckets that
    * actually hold more than one file: a single-file bucket is the output
    * of one batch's reduction or of compaction, both key-unique, so it is
    * read raw — after compaction a merge-on-read table reads exactly as
    * cheaply as copy-on-write. A multi-file bucket whose files are ALL
    * `merged` (a compaction split by maxFileRows) is equally key-disjoint
    * and reads raw too; any un-merged (delta) file forces the LWW merge. */
  private def readStateCells(buckets: Option[Set[Int]], targetPayload: StructType,
      asOfSnapshot: Option[Long] = None): DataFrame = {
    val snapOpt = asOfSnapshot.map(id => Some(table.snapshot(id)))
      .getOrElse(table.currentSnapshot)
    def groupsFor(sel: Option[Set[Int]]) = (asOfSnapshot, sel) match {
      case (Some(id), s) => table.fileGroupsAt(id, s)
      case (None, s) => table.currentFileGroups(s)
    }
    if (!table.meta.mergeOnRead) return readAligned(groupsFor(buckets), targetPayload)
    val snapFiles = snapOpt.map(table.bucketFilesOf).getOrElse(Map.empty)
    val multiFile: Set[Int] = snapFiles.collect {
      case (b, files) if files.size > 1 && !files.forall(_.merged) &&
        buckets.forall(_.contains(b.toInt)) => b.toInt
    }.toSet
    val singleSel = buckets match {
      case Some(bs) => Some(bs -- multiFile)
      case None => Some(snapFiles.keySet.map(_.toInt) -- multiFile)
    }
    val singles = readAligned(groupsFor(singleSel), targetPayload)
    if (multiFile.isEmpty) singles
    else {
      val merged = lwwAgg(readAligned(groupsFor(Some(multiFile)), targetPayload),
        Seq(OpCell, TsCell) ++ targetPayload.fieldNames)
      singles.unionByName(merged)
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
  def applyBatch(epoch: Long, batchRaw: DataFrame): CommitResult =
    applyBatchImpl(epoch, batchRaw, stage = false)

  /** Write-audit-publish step 1: run the full MERGE and write the snapshot
    * STAGED — data files and manifest on disk, pointer untouched. The batch
    * is invisible to every reader (state, change feeds, mirrors, views)
    * until [[publishStaged]]; a failed audit discards it with
    * [[dropStaged]] and the table is as if the batch never arrived. The
    * returned `snapshotId` is the staged id to audit/publish/drop. */
  def stageBatch(epoch: Long, batchRaw: DataFrame): CommitResult =
    applyBatchImpl(epoch, batchRaw, stage = true)

  /** Apply a micro-batch onto a BRANCH (writable ref lane): the merge runs
    * against the branch head's state and the commit advances the branch
    * ref, never the main pointer — an ingest lane of several batches stays
    * invisible to main's readers/feeds/views until [[publishBranch]]
    * fast-forwards it in one atomic pointer write. Exactly-once is scoped
    * to the branch chain (which shares main's history below the fork, so
    * re-delivering a batch main already has is still a no-op). */
  def applyBatchToBranch(epoch: Long, batchRaw: DataFrame, branch: String): CommitResult =
    applyBatchImpl(epoch, batchRaw, stage = false, branch = Some(branch))

  private def applyBatchImpl(epoch: Long, batchRaw: DataFrame, stage: Boolean,
      branch: Option[String] = None): CommitResult = {
    branch match {
      case Some(n) =>
        // branch lanes inherit their layout from the branch head, which may
        // predate a main-side rebucket — same loud-failure rule as main
        val head = table.snapshot(table.branchHead(n))
        require(table.effectiveBuckets(head) == conf.buckets,
          s"branch '$n' is bucketed at ${table.effectiveBuckets(head)} but this " +
            s"engine was built for ${conf.buckets}")
        if (table.branchEpochs(n).contains(epoch))
          return CommitResult(epoch, table.branchHead(n), skipped = true, 0, 0, 0)
      case None =>
        checkLayout()
        if (table.committedEpochs.contains(epoch))
          return CommitResult(epoch, table.currentSnapshotId, skipped = true, 0, 0, 0)
    }
    // Optimistic-concurrency retry: a copy-on-write merge pins the snapshot
    // it merged against and commits CAS-style (expectedParentId); a
    // concurrent writer advancing the table between the pin and the commit
    // raises CommitConflictException, and the whole merge re-runs against
    // the fresh state (the loser's data files are orphans, reclaimed by the
    // vacuum grace — Iceberg's standard optimistic-commit protocol).
    // Merge-on-read appends and branch commits don't need it: an append
    // folds the PARENT's file lists inside the commit lock, and a branch
    // commit validates its own head.
    def attempt(): CommitResult = {
      if (conf.mergeShufflePartitions <= 0) return applyBatchInner(epoch, batchRaw, stage, branch)
      // merge-width override is scoped to this batch: leaking it into the
      // shared session would silently re-plan every later query on it
      val saved = spark.conf.getOption("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", conf.mergeShufflePartitions)
      try applyBatchInner(epoch, batchRaw, stage, branch)
      finally saved match {
        case Some(v) => spark.conf.set("spark.sql.shuffle.partitions", v)
        case None => spark.conf.unset("spark.sql.shuffle.partitions")
      }
    }
    // The CAS pin has a second loss mode besides the conflict at commit
    // time: the merge READS the pinned snapshot unprotected, so a
    // concurrent winner whose commit triggers retention/vacuum can expire
    // that snapshot and reclaim its manifest or data files MID-merge. That
    // surfaces as FileNotFound deep inside the read job, not as a
    // CommitConflictException — attributable to the race only when the
    // head actually moved during the attempt, in which case the correct
    // response is the same re-merge against the fresh state.
    def vanishedRead(e: Throwable): Boolean = {
      var t = e
      while (t != null) {
        val msg = t.getMessage
        if (t.isInstanceOf[java.io.FileNotFoundException] ||
          t.isInstanceOf[java.nio.file.NoSuchFileException] ||
          (msg != null && (msg.contains("FileNotFoundException") ||
            msg.contains("NoSuchFileException")))) return true
        t = t.getCause
      }
      false
    }
    val casProtected = branch.isEmpty && !stage && !table.meta.mergeOnRead
    var conflicts = 0
    while (true) {
      val headBefore = table.currentSnapshotId
      def loseRace(detail: String): Option[CommitResult] = {
        conflicts += 1
        if (conflicts > conf.maxCommitRetries)
          throw new Icelite.CommitConflictException(
            s"epoch $epoch lost ${conflicts} consecutive commit races " +
              s"(maxCommitRetries=${conf.maxCommitRetries}): $detail")
        // the winner may have BEEN this epoch (re-delivery race):
        // exactly-once resolves it as a skip, not a re-merge
        if (branch.isEmpty && table.committedEpochs.contains(epoch))
          Some(CommitResult(epoch, table.currentSnapshotId, skipped = true, 0, 0, 0))
        else None
      }
      try return attempt()
      catch {
        case e: Icelite.CommitConflictException =>
          loseRace(e.getMessage).foreach(return _)
        case scala.util.control.NonFatal(e)
            if casProtected && table.currentSnapshotId != headBefore &&
              vanishedRead(e) =>
          loseRace(s"pinned read vanished under concurrent expire: ${e.getMessage}")
            .foreach(return _)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def applyBatchInner(epoch: Long, batchRaw: DataFrame, stage: Boolean,
      branch: Option[String] = None): CommitResult = {
    val t0 = System.nanoTime()
    def ms(since: Long): Long = (System.nanoTime() - since) / 1000000

    // the state (and schema) a branch commit merges against is the BRANCH
    // head's, not main's — the lane may have evolved the schema on its own
    val asOfHead: Option[Long] = branch.map(table.branchHead)
    // multi-writer CAS pin (main-chain copy-on-write only): the snapshot
    // this merge reads is the snapshot the commit must still be on top of —
    // committing a merge computed against snapshot S onto a parent != S
    // would silently drop the intervening writer's changes to the rewritten
    // buckets. The conflict raises and applyBatchImpl re-merges fresh.
    val observedParent: Long =
      if (branch.isEmpty) table.currentSnapshotId else -2L
    val basePayload = asOfHead match {
      case Some(id) => payloadOfSchema(Some(table.schema(table.snapshot(id).schemaId)))
      case None => tablePayload
    }
    val targetPayload = SchemaEvolve.reconcile(basePayload, payloadOf(batchRaw))
    val cellCols = Seq(OpCell, TsCell) ++ targetPayload.fieldNames

    // Per-bucket source-offset lineage straight off the raw batch (one cheap
    // aggregation; also yields the affected-bucket set for manifest pruning
    // AND the malformed-row count, so a clean batch pays no quarantine
    // write). Same apply predicate as batchToCells, so lineage counts
    // exactly the applied events: a null-envelope row must not inflate
    // lineage, and a row whose fallible cast would silently null a non-null
    // source value is quarantined (`cast_error`), never merged.
    // Merge-on-read tables piggyback the delta files' key-fingerprint SET on
    // the same aggregation (no extra job; map-side dedup bounds the transfer
    // at keyFpBits ints per bucket).
    val mor = table.meta.mergeOnRead
    val fpEnabled = mor && conf.keyFpBits > 0
    val validPred = keyColumns.map(_.isNotNull).reduce(_ && _) &&
      col("op").isNotNull && col("commit_lsn").isNotNull && col("seq").isNotNull
    val fallible = fallibleCasts(batchRaw, targetPayload)
    val applyPred = validPred && !castFailPred(fallible)
    val baseAggs = Seq(
      min(when(applyPred, col("commit_lsn"))).as("lmin"),
      max(when(applyPred, col("commit_lsn"))).as("lmax"),
      count(when(applyPred, lit(1))).as("n"),
      count(when(!applyPred, lit(1))).as("nbad"))
    val lineageAggs = // collect_set skips the nulls the when() leaves on bad rows
      if (fpEnabled) baseAggs :+ collect_set(when(applyPred, keyFpCol)).as("fps")
      else baseAggs
    val lineageRows = batchRaw
      .groupBy(bucketCol.as("__b"))
      .agg(lineageAggs.head, lineageAggs.tail: _*)
      .collect()
    val lineageMs = ms(t0)
    val badTotal = lineageRows.map(_.getLong(4)).sum
    // dead-letter quarantine BEFORE the merge: malformed rows written with
    // their reason. Skipped entirely when the batch is clean (the common
    // case must not pay a second full-batch pass + parquet write).
    val rejected: Long =
      if (conf.dlqDir.isEmpty || badTotal == 0) 0L
      else {
        val reason = when(keyColumns.map(_.isNull).reduce(_ || _), "null_key")
          .when(col("op").isNull, "null_op")
          .when(col("commit_lsn").isNull, "null_lsn")
          .when(col("seq").isNull, "null_seq")
          .otherwise("cast_error")
        val dlqPath = Paths.get(conf.dlqDir).resolve(s"epoch=$epoch")
        batchRaw.filter(!applyPred).withColumn("_reason", reason)
          .write.mode("overwrite").parquet(dlqPath.toString)
        badTotal
      }
    val appliedRows = lineageRows.filter(_.getLong(3) > 0)
    if (appliedRows.isEmpty) { // no applicable rows: still commit the epoch (exactly-once bookkeeping)
      val sid = table.ensureSchema(stateSchema(targetPayload))
      val snap = table.commit(epoch, sid, Map.empty, Nil, 0, stage = stage,
        toBranch = branch)
      return CommitResult(epoch, snap.snapshotId, skipped = false, 0, 0,
        (System.nanoTime() - t0) / 1000000, rejected = rejected)
    }
    val affected = appliedRows.map(_.getInt(0)).toSet
    val events = appliedRows.map(_.getLong(3)).sum

    // Copy-on-write: MERGE = union(batch cells, affected state cells) ->
    // one LWW reduction -> rewrite affected buckets (write work O(bucket
    // rows)). Merge-on-read: reduce WITHIN the batch only and append the
    // result as delta files (write work O(batch rows) — the sparse-batch
    // write-amplification fix); the cross-batch merge happens at read time.
    val batchCells = batchToCells(batchRaw, targetPayload, fallible, applyPred)
    val merged =
      if (mor) lwwAgg(batchCells, cellCols)
      else lwwAgg(batchCells.unionByName(
        readStateCells(Some(affected), targetPayload,
          asOfSnapshot = asOfHead.orElse(
            if (observedParent >= 0) Some(observedParent) else None))), cellCols)

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
    // bloom filters on the key columns: point lookups prune to a bucket via
    // the manifest, then the parquet reader's bloom check skips row groups
    // inside multi-file/multi-group buckets (free at read: Spark consults
    // blooms automatically for pushed-down equality predicates)
    val sortNow = if (mor) Nil
      else conf.writeSortCols.filter(targetPayload.fieldNames.contains)
    val ordered =
      if (sortNow.isEmpty) repartitioned
      else repartitioned.sortWithinPartitions(
        (col("__b") +: (sortNow.map(c => col(s"$c.v")) ++ keyColumns)): _*)
    val writer = ordered.write
      .option("parquet.bloom.filter.enabled#repo", "true")
      .option("parquet.bloom.filter.enabled#path", "true")
    (if (!mor && conf.writeMaxFileRows > 0)
       writer.option("maxRecordsPerFile", conf.writeMaxFileRows)
     else writer)
      .partitionBy("__b").parquet(outDir.toString)
    val mergeWriteMs = ms(tw0)

    // Manifest entries + per-bucket state row counts + file-level LSN
    // stats, all from the parquet FOOTERS of the files just written
    // (driver-side metadata reads, ~ms per file) — NOT a Spark job: at
    // 4 jobs/batch the driver's serial job-planning time becomes the
    // Amdahl term that caps scaling efficiency.
    val tm0 = System.nanoTime()
    val sid = table.ensureSchema(stateSchema(targetPayload))
    // COW rewrites hold merged final state (stats-prunable); MOR deltas are
    // neither merged nor harvested (see EngineConf.statsCols).
    val bucketFiles = collectBucketFiles(outDir, table, sid,
      spark.sessionState.newHadoopConf(), merged = !mor,
      statsCols = if (mor) Nil else typedStatsCols(targetPayload))
    val bucketRows: Map[Int, Long] =
      bucketFiles.map { case (b, files) => b -> files.map(_.rows).sum }
    val manifestMs = ms(tm0)
    val lineage = appliedRows.map { r =>
      val b = r.getInt(0)
      Icelite.BucketLineage(b, r.getLong(1), r.getLong(2), r.getLong(3),
        bucketRows.getOrElse(b, 0L))
    }.toList

    // Attach each bucket's key-fingerprint bitmap to its delta files (all
    // files of a salted multi-file bucket share the bucket bitmap — a safe
    // over-approximation). Dropped when the set bits would exceed 25% load
    // (false positives make the stat useless before it makes it wrong).
    val fpByBucket: Map[Int, String] =
      if (!fpEnabled) Map.empty
      else appliedRows.iterator
        .map(r => r.getInt(0) -> r.getSeq[Int](5))
        .collect { case (b, fps) if fps.size <= conf.keyFpBits / 4 =>
          b -> Icelite.fpBitmap(fps, conf.keyFpBits)
        }.toMap
    val manifestFiles = bucketFiles.map { case (b, fs) =>
      b -> fpByBucket.get(b).map(bm => fs.map(_.copy(keyFp = Some(bm)))).getOrElse(fs)
    }

    val tc0 = System.nanoTime()
    val snap = table.commit(epoch, sid, manifestFiles, lineage, rowDelta = events,
      append = mor, stage = stage, toBranch = branch,
      // CAS only where staleness loses data: a COW main commit rewrites
      // whole buckets from the pinned read; MOR appends fold the fresh
      // parent inside the commit lock, staged commits move no pointer,
      // branch commits validate their own head
      expectedParentId = if (branch.isEmpty && !mor && !stage) observedParent else -2L)
    val commitMs = ms(tc0)
    // maintenance acts on the PUBLISHED chain — a staged snapshot defers
    // both to publishStaged, a branch commit to publishBranch (dropping
    // either must leave the table untouched)
    val tp0 = System.nanoTime()
    if (!stage && branch.isEmpty) {
      if (mor && conf.morCompactThreshold > 0) {
        // the delta manifest lists exactly the touched buckets (with their
        // complete post-append lists) — the only ones that can newly cross
        // the threshold, so no full-map resolution is needed here
        val overFiles = snap.bucketDelta.collect {
          case (b, files) if files.size >= conf.morCompactThreshold =>
            b.toInt -> files
        }
        // a compaction losing a commit race is NOT a batch failure — the
        // batch is committed; the still-over-threshold buckets re-trigger
        // on the next batch
        if (overFiles.nonEmpty)
          try {
            if (conf.morMinorRatio > 0) {
              // size-tiered: fold the pile while it is small next to the
              // base; full rewrite (with purge) only when it rivals the
              // base or there is no base yet to fold against
              val (major, minor) = overFiles.keySet.partition { b =>
                val fs = overFiles(b)
                val base = fs.filter(_.merged).map(_.rows).sum
                base == 0 || fs.filterNot(_.merged).map(_.rows).sum >=
                  conf.morMinorRatio * base
              }
              if (minor.nonEmpty) compactDeltas(Some(minor))
              if (major.nonEmpty) autoCompact(major)
            } else autoCompact(overFiles.keySet)
          } catch { case _: Icelite.CommitConflictException => }
      }
      maybeExpire(newSnapshots = if (mor && conf.morCompactThreshold > 0) 2 else 1)
    }
    val maintMs = ms(tp0)
    val totalMs = ms(t0)
    appendMetrics(epoch, snap.snapshotId, events, affected.size, totalMs,
      s""","lineageMs":$lineageMs,"mergeWriteMs":$mergeWriteMs,"manifestMs":$manifestMs""" +
        s""","commitMs":$commitMs,"maintMs":$maintMs""" +
        (if (stage) ""","staged":true""" else "") +
        (if (rejected > 0) s""","rejected":$rejected""" else "") +
        branch.map(n => s""","branch":"$n"""").getOrElse(""))
    CommitResult(epoch, snap.snapshotId, skipped = false, events, affected.size, totalMs,
      rejected = rejected)
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

  /** Tag the current (or a given ancestor) snapshot under `name`; tagged
    * snapshots stay readable past `expireSnapshots` and their files past
    * `vacuum` until the tag is dropped (Iceberg tag refs). */
  def tagSnapshot(name: String, snapshotId: Long = -1L): Long =
    table.tag(name, snapshotId)

  /** Time-travel read by tag name — works even after the tagged snapshot
    * was expired out of the chain (its manifest is retained and
    * self-contained). */
  def stateAtTag(name: String, buckets: Option[Set[Int]] = None): DataFrame =
    stateAt(table.snapshotForTag(name).snapshotId, buckets)

  private def stateOf(buckets: Option[Set[Int]], asOfSnapshot: Option[Long]): DataFrame = {
    // Pin a head read to the CONCRETE current snapshot, so the plan's file
    // list, its schema, and the metadata-aggregate tag all describe the
    // same table version — a held DataFrame must not answer count(*) from
    // a snapshot newer than the files it scans (None = empty table).
    val pinned = asOfSnapshot.orElse {
      val id = table.currentSnapshotId
      if (id >= 0) Some(id) else None
    }
    val schemaAt = pinned.map(id => table.schema(table.snapshot(id).schemaId))
    val payload = payloadOfSchema(schemaAt)
    val cells = readStateCells(buckets, payload, pinned)
    val base = flattenCells(cells.filter(col(s"$OpCell.v") =!= lit("D")), payload)
    val out =
      if (payload.fieldNames.contains("content"))
        base.withColumn("content_sha256", sha2(col("content"), 256))
      else base
    // full-table reads advertise themselves to the metadata-only aggregate
    // rewrite (bucket-pruned reads don't: manifest sums cover ALL buckets);
    // the tag carries the PINNED snapshot, not "head"
    if (buckets.isEmpty)
      out.queryExecution.analyzed.setTagValue(CdcEngine.MetaScanTag, (this, pinned))
    out
  }

  /** Inspection metadata tables (Iceberg's `table.snapshots` / `.history` /
    * `.files` / `.partitions` / `.refs`, plus queryable per-partition
    * lineage) — see [[Inspect]]. */
  def inspect: Inspect = new Inspect(spark, table)

  /** Raw cell-form state (for tests / debugging). */
  def currentCells(buckets: Option[Set[Int]] = None): DataFrame =
    readStateCells(buckets, tablePayload)

  // ------------------------------------------- metadata-only aggregates

  /** Exact visible-row count at `asOfSnapshot` (-1 = head) from MANIFEST
    * metadata alone — no file is opened, no Spark job runs (the Iceberg
    * `SupportsPushDownAggregates` count analog; at 100 TB this turns
    * `SELECT count(*)` from a full scan into a metadata read). Answerable
    * — `Some(n)` — only when every live file holds merged state with a
    * footer-decided live-row count ([[Icelite.DataFile.liveRows]]); a
    * merge-on-read table with pending deltas, or a file whose row groups
    * interleave tombstones with live rows, returns None and the caller
    * falls back to the scan. `Some(0)` for an empty table. */
  def metaCount(asOfSnapshot: Long = -1L): Option[Long] = {
    val snap = if (asOfSnapshot >= 0) Some(table.snapshot(asOfSnapshot))
      else table.currentSnapshot
    snap match {
      case None => Some(0L)
      case Some(s) =>
        val allMerged = !table.meta.mergeOnRead // COW files are merged state
        var sum = 0L
        val ok = table.bucketFilesOf(s).valuesIterator.forall(_.forall { f =>
          val usable = (allMerged || f.merged) && f.liveRows >= 0L
          if (usable) sum += f.liveRows
          usable
        })
        if (ok) Some(sum) else None
    }
  }

  /** Exact global (min, max) of payload column `column` over the VISIBLE
    * state at `asOfSnapshot` (-1 = head), from manifest column stats alone
    * (Iceberg's lower/upper_bounds). Answerable only when every live file
    * is merged state carrying bounds for the column AND is tombstone-free
    * (`liveRows == rows`) — a retained tombstone's preimage values sit in
    * the file's footer stats but are invisible to readers, so any
    * tombstone poisons the metadata answer. `Some((None, None))` = the
    * column is null everywhere (SQL min/max of nothing). Values are the
    * external types `currentState` exposes. */
  def metaBounds(column: String, asOfSnapshot: Long = -1L)
      : Option[(Option[Any], Option[Any])] = {
    val snap = if (asOfSnapshot >= 0) Some(table.snapshot(asOfSnapshot))
      else table.currentSnapshot
    snap match {
      case None => Some((None, None))
      case Some(s) =>
        val schemaAt =
          if (asOfSnapshot >= 0) Some(table.schema(s.schemaId)) else table.currentSchema
        val payload = payloadOfSchema(schemaAt)
        val field = payload.fields.find(_.name == column).getOrElse(return None)
        val dt = field.dataType
        if (!StatsSkip.supported(dt)) return None
        val allMerged = !table.meta.mergeOnRead
        var lo: Option[String] = None
        var hi: Option[String] = None
        val ok = table.bucketFilesOf(s).valuesIterator.forall(_.forall { f =>
          if (!(allMerged || f.merged) || f.liveRows != f.rows) false
          else f.colStats.flatMap(_.get(column)) match {
            case Some(mn :: mx :: Nil) =>
              if (lo.forall(StatsSkip.cmp(dt, mn, _) < 0)) lo = Some(mn)
              if (hi.forall(StatsSkip.cmp(dt, mx, _) > 0)) hi = Some(mx)
              true
            case Some(Nil) => true // column all-null in this file
            case _ => false // no stats harvested: unknown
          }
        })
        if (ok) Some((lo.map(StatsSkip.decode(dt, _)), hi.map(StatsSkip.decode(dt, _))))
        else None
    }
  }

  // ------------------------------------------------------ write-audit-publish

  /** WAP step 2: evaluate data-quality invariants against the STAGED state —
    * exactly what the table would expose if published — in ONE aggregation
    * pass. Built-in checks re-prove key uniqueness and key non-nullness from
    * the data (not assumed from the merge); `rowChecks` are caller row-level
    * predicates (content bounds, lang whitelists, ...) that must hold on
    * EVERY visible row (a null predicate counts as failed; an empty state
    * passes). Returns check name -> passed. Iceberg's WAP audit slot. */
  def auditStaged(stagedId: Long,
      rowChecks: Map[String, Column] = Map.empty): Map[String, Boolean] = {
    val st = stateAt(stagedId)
    def everyRow(pred: Column): Column =
      coalesce(min(when(pred, 1).otherwise(0)), lit(1)) === 1
    val checks: Seq[(String, Column)] =
      Seq(
        "keys_unique" ->
          (count(lit(1)) === count_distinct(keyColumns.head, keyColumns.tail: _*)),
        "no_null_keys" -> everyRow(keyColumns.map(_.isNotNull).reduce(_ && _))) ++
        rowChecks.toSeq.map { case (n, pred) => n -> everyRow(pred) }
    val aggs = checks.map { case (n, c) => c.as(n) }
    val row = st.agg(aggs.head, aggs.tail: _*).collect()(0)
    checks.indices.map(i => checks(i)._1 -> row.getBoolean(i)).toMap
  }

  /** WAP step 3: make the staged snapshot the table head. Exactly-once and
    * the optimistic-concurrency parent are re-checked at publish time (the
    * table may have moved while the audit ran — see [[IceliteTable.publish]];
    * on conflict re-stage against the new head, the staged MERGE is stale).
    * Then runs the maintenance the stage deferred (merge-on-read threshold
    * compaction, auto-retention). Returns the published snapshot id. */
  def publishStaged(stagedId: Long): Long = {
    val snap = table.publish(stagedId)
    val morMaint = table.meta.mergeOnRead && conf.morCompactThreshold > 0
    if (morMaint) {
      val over = snap.bucketDelta.collect {
        case (b, files) if files.size >= conf.morCompactThreshold => b.toInt
      }.toSet
      if (over.nonEmpty) autoCompact(over)
    }
    maybeExpire(newSnapshots = if (morMaint) 2 else 1)
    snap.snapshotId
  }

  /** Remove `<dlqDir>/epoch=N` for epochs whose commit was discarded
    * (dropped staged snapshot / abandoned branch): the quarantine mirrors
    * the commit, so an uncommitted epoch must not leave a stale quarantine
    * directory behind. A corrected re-delivery rewrites it. */
  private def dropDlqEpochs(epochs: Iterable[Long]): Unit =
    if (conf.dlqDir.nonEmpty) epochs.foreach { e =>
      val dir = Paths.get(conf.dlqDir).resolve(s"epoch=$e")
      if (Files.exists(dir)) {
        val stream = Files.walk(dir)
        try stream.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
        finally stream.close()
      }
    }

  /** Audit failed: discard the staged snapshot — manifest and the data files
    * only it references — leaving the table as if the batch never arrived.
    * The batch's epoch stays UNcommitted, so a corrected re-delivery under
    * the same epoch is applied, not skipped; its quarantine directory is
    * removed with it. */
  def dropStaged(stagedId: Long): Seq[String] = {
    val epoch = scala.util.Try(table.snapshot(stagedId).batchEpoch).toOption
    val removed = table.dropStaged(stagedId)
    dropDlqEpochs(epoch.filter(_ >= 0))
    removed
  }

  // ---------------------------------------------------------------- branches

  /** Fork a writable branch at the current snapshot (or a given ancestor).
    * Apply batches to it with [[applyBatchToBranch]]; read it with
    * [[stateAtBranch]]; audit it with [[auditBranch]]; make it main with
    * [[publishBranch]] or discard it with [[abandonBranch]]. The multi-batch
    * generalization of write-audit-publish: a WHOLE ingest lane is audited
    * and published (or dropped) as a unit. */
  def createBranch(name: String, snapshotId: Long = -1L): Long =
    table.createBranch(name, snapshotId)

  /** Visible state at a branch head — exactly what main would expose if the
    * branch were published now. */
  def stateAtBranch(name: String, buckets: Option[Set[Int]] = None): DataFrame =
    stateAt(table.branchHead(name), buckets)

  /** Run the WAP audit pass against a branch head (same built-in checks +
    * caller row predicates as [[auditStaged]], over the branch's state). */
  def auditBranch(name: String,
      rowChecks: Map[String, Column] = Map.empty): Map[String, Boolean] =
    auditStaged(table.branchHead(name), rowChecks)

  /** Publish a branch: fast-forward main to the branch head (one atomic
    * pointer write — every lane batch becomes visible at once, with change
    * feeds/mirrors/views seeing an ordinary chain extension). Conflicts if
    * main advanced since the fork (see [[IceliteTable.fastForward]]). Then
    * runs the maintenance the lane deferred: merge-on-read threshold
    * compaction over every bucket the lane touched, and auto-retention. */
  def publishBranch(name: String): Long = {
    val head = table.branchHead(name)
    // buckets the lane touched = manifest deltas strictly above the fork
    // (walk stops at the first snapshot main can already see)
    val laneBuckets = scala.collection.mutable.Set.empty[Int]
    var id = head
    val mainId = table.currentSnapshotId
    var laneLen = 0
    while (id >= 0 && id != mainId && !table.isAncestor(id)) {
      val s = table.snapshot(id)
      laneBuckets ++= s.bucketDelta.keysIterator.map(_.toInt)
      laneLen += 1
      id = s.parentId
    }
    val snap = table.fastForward(name)
    val morMaint = table.meta.mergeOnRead && conf.morCompactThreshold > 0
    if (morMaint) {
      val over = laneBuckets.filter(b =>
        table.bucketListOf(snap, b).size >= conf.morCompactThreshold).toSet
      if (over.nonEmpty) autoCompact(over)
    }
    maybeExpire(newSnapshots = laneLen + (if (morMaint) 1 else 0))
    table.currentSnapshotId
  }

  /** Audit failed: drop the branch ref and reclaim the lane's data files
    * (manifests become inert, files are vacuumed unless another ref still
    * needs them). Main is untouched; the lane's epochs stay uncommitted on
    * main, so corrected re-deliveries apply normally.
    *
    * `vacuumGraceMillis` defaults to the engine's configured grace period
    * (negative = use conf): vacuum's contract warns that a zero-grace run
    * can reclaim the data files of in-flight writers and un-published
    * staged (WAP) snapshots, so immediate reclamation must be an explicit
    * caller decision (pass 0), never the default in a multi-writer or
    * concurrent-audit setup. */
  def abandonBranch(name: String, vacuumGraceMillis: Long = -1L): Seq[String] = {
    // lane-only epochs (strictly above the fork): their quarantine dirs go
    // with the lane — collected BEFORE the ref is dropped. "Lane-only"
    // means reachable from NO other ref: a branch forked from another
    // branch shares its parent lane's snapshots, and abandoning the child
    // must not delete quarantine dirs the still-live parent lane needs for
    // replay-after-fix — so every other branch head and tag bounds the
    // walk, not just the main chain.
    val laneEpochs = scala.util.Try {
      val otherHeads =
        table.branches.collect { case (n, h) if n != name => h } ++
          table.tags.values
      def sharedElsewhere(id: Long): Boolean =
        table.isAncestor(id) || otherHeads.exists(table.isAncestorFrom(id, _))
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var id = table.branchHead(name)
      while (id >= 0 && !sharedElsewhere(id)) {
        val s = table.snapshot(id)
        if (s.batchEpoch >= 0) out += s.batchEpoch
        id = s.parentId
      }
      out.toList
    }.getOrElse(Nil)
    if (!table.dropBranch(name)) return Seq.empty
    dropDlqEpochs(laneEpochs)
    table.vacuum(
      if (vacuumGraceMillis >= 0) vacuumGraceMillis else conf.vacuumGraceMillis)
  }

  /** Highest source LSN applied up to and including `snapshotId` (from the
    * per-bucket lineage records plus any watermark carried across
    * expireSnapshots re-roots; -1 for an empty chain prefix). */
  def highWatermark(snapshotId: Long): Long = {
    var id = snapshotId
    var hwm = -1L
    while (id >= 0) {
      val s = table.snapshot(id)
      if (s.carriedWatermark > hwm) hwm = s.carriedWatermark
      for (l <- s.lineage) if (l.lsnMax > hwm) hwm = l.lsnMax
      id = s.parentId
    }
    hwm
  }

  /** Buckets whose values may have changed after `sinceSnapshotId`, from the
    * lineage of the chain segment (since, current]; None when the set cannot
    * be proven complete — the chain was re-rooted past `since` (expired), OR
    * the walk ran to a root that carries expired history (carriedEpochs /
    * carriedWatermark): buckets written only by the expired commits are
    * absent from the surviving lineage, so a bootstrap walk
    * (sinceSnapshotId < 0) over such a chain would silently under-prune.
    * Compaction snapshots carry no lineage and rewrite values 1:1, so they
    * add nothing to the set. */
  private[engine] def bucketsTouchedSince(sinceSnapshotId: Long,
      toSnapshotId: Long): Option[Set[Int]] = {
    // a bucket-count change inside the window puts the segment's lineage
    // ids in a different hash regime than the window end's layout — no
    // consistent bucket set exists, so pruning must be abandoned entirely
    if (toSnapshotId >= 0 && table.windowCrossesRebucket(sinceSnapshotId, toSnapshotId))
      return None
    var id = toSnapshotId
    val b = Set.newBuilder[Int]
    var rootCarries = false
    while (id >= 0 && id != sinceSnapshotId) {
      val s = table.snapshot(id)
      b ++= s.lineage.map(_.bucket)
      if (s.parentId < 0) rootCarries = s.carriedEpochs.nonEmpty || s.carriedWatermark >= 0
      id = s.parentId
    }
    if (id >= 0 && id == sinceSnapshotId) Some(b.result()) // reached `since`: segment complete
    else if (sinceSnapshotId < 0 && !rootCarries) Some(b.result()) // full-chain walk, no expired history
    else None // `since` expired / not an ancestor, or bootstrap over a re-rooted chain
  }

  /** Does the chain segment (since, to] contain a commit that can REMOVE
    * keys from the cell-level state without any added file carrying them —
    * a RESTORE (reverts values, adds nothing) or a tombstone-GC PURGE
    * (drops tombstone rows)? Both suspend two shortcuts `changesSince`
    * otherwise relies on, and both require synthesizing deletes for
    * vanished keys (see there). */
  private def windowRemovesKeys(sinceSnapshotId: Long, toSnapshotId: Long): Boolean = {
    var id = toSnapshotId
    while (id >= 0 && id != sinceSnapshotId) {
      val s = table.snapshot(id)
      if (s.restoreOf >= 0 || s.purge) return true
      id = s.parentId
    }
    false
  }

  /** Shared pruning resolution for the incremental readers over a window
    * (since, to]. Returns (crosses, bsel, unbounded):
    *   - crosses — the window straddles a rebucket: same keys and cells,
    *     relocated files, MIXED hash regimes, so bucket pruning must be
    *     abandoned entirely (the caller's `buckets`, interpreted in the
    *     window-END layout, is re-applied as a row filter downstream);
    *   - bsel — effective bucket selection: lineage-touched ∩ the caller's;
    *   - unbounded — the touched set could not be proven complete (`since`
    *     expired / re-rooted chain): readers must fall back to conservative
    *     full redelivery. */
  private def diffPruning(sinceSnapshotId: Long, buckets: Option[Set[Int]],
      toId: Long): (Boolean, Option[Set[Int]], Boolean) = {
    val crosses = sinceSnapshotId >= 0 && toId >= 0 &&
      table.isAncestorFrom(sinceSnapshotId, toId) &&
      table.windowCrossesRebucket(sinceSnapshotId, toId)
    val touched = if (crosses) None else bucketsTouchedSince(sinceSnapshotId, toId)
    val bsel = if (crosses) None
      else (touched, buckets) match {
        case (Some(t), Some(u)) => Some(t intersect u)
        case (Some(t), None) => Some(t)
        case (None, u) => u
      }
    (crosses, bsel, touched.isEmpty)
  }

  /** Incremental change feed as a SNAPSHOT DIFF: every row whose visible
    * merged cells differ between `sinceSnapshotId` and now — inserts,
    * updates (any cell, not just the op cell) and tombstones (`_op = "D"`
    * rows ARE included so a consumer can apply deletes); `_lsn` orders the
    * feed. Defined on snapshot ORDER, not on LSNs: a late-arriving batch
    * whose LSNs all precede the old high watermark still commits a new
    * snapshot, so its rows diff and are delivered — an LSN-watermark filter
    * (the previous design) silently dropped exactly those rows under the
    * out-of-order delivery the engine's replay contract guarantees.
    *
    * Cost control: both sides are pruned to the buckets the segment's
    * lineage actually touched (manifest metadata, no scan), and the diff is
    * ONE anti-join on (key, all cells) — null-safe struct equality, so it
    * plans as a hash join on the key+cell tuple. If `since` was expired the
    * whole current state is conservatively re-delivered (Iceberg's
    * incremental read makes the same call).
    *
    * Windows crossing a RESTORE (rollbackTo) additionally emit synthetic
    * `_op = "D"` rows for keys the restore removed (inserted inside the
    * rolled-back span — no tombstone cell exists for them), so a feed
    * consumer's mirror follows the rollback. Caveat: if `since` was ALSO
    * expired, the conservative full redelivery cannot express removals — a
    * consumer whose checkpoint predates the retained chain must rebuild its
    * mirror after a restore. */
  def changesSince(sinceSnapshotId: Long, buckets: Option[Set[Int]] = None,
      toSnapshotId: Long = -1L): DataFrame = {
    checkLayout()
    // window end: current by default, or any chain snapshot (Iceberg's
    // incremental scan (from, to]) — feeds become replayable history steps
    // and a consumer can pin `to` to the snapshot it observed, making the
    // read race-free against concurrent commits
    val toId = if (toSnapshotId >= 0) toSnapshotId else table.currentSnapshotId
    // a reversed window (live `since` that is NOT an ancestor of `to`)
    // would silently diff in the wrong direction — fail loudly instead;
    // an EXPIRED `since` stays legal (conservative full redelivery below)
    if (sinceSnapshotId >= 0 && toSnapshotId >= 0)
      require(table.isAncestorFrom(sinceSnapshotId, toId) ||
          !table.isAncestor(sinceSnapshotId),
        s"changesSince window is reversed or crosses branches: " +
          s"snapshot $sinceSnapshotId is not an ancestor of $toSnapshotId")
    val (crosses, bsel, unbounded) = diffPruning(sinceSnapshotId, buckets, toId)
    // payload schema is the one pinned by the window END, not the current
    // one — a windowed feed to a pre-evolution snapshot has no later columns
    val payload = payloadOfSchema(
      if (toId >= 0) Some(table.schema(table.snapshot(toId).schemaId)) else None)
    val cellCols = Seq(OpCell, TsCell) ++ payload.fieldNames
    val cur = readStateCells(bsel, payload,
      if (toId >= 0) Some(toId) else None)
    val changed =
      if (sinceSnapshotId < 0 || (unbounded && !crosses)) cur
      else {
        val old = readStateCells(bsel, payload, Some(sinceSnapshotId))
        // A restore (or tombstone purge) in the window suspends two
        // invariants of normal CDC operation: changed keys need NOT appear
        // in any added file (a restore reverts values while adding none; a
        // purge only removes rows), and keys CAN vanish outright (inserted
        // in the rolled-back window, or tombstone rows GC'd — no tombstone
        // cell remains for them, so one is synthesized below).
        val removes = windowRemovesKeys(sinceSnapshotId, toId)
        // Merge-on-read: files are append-only, so any key whose merged
        // value changed after `since` MUST appear in a file added after
        // `since` (delta or compaction). Reading JUST those files' keys
        // (change-proportional I/O) and semi-joining both sides shrinks
        // the diff from bucket-size to change-size — the key-level
        // refinement of the bucket-level lineage pruning above. (Not
        // applied on copy-on-write, where added files are whole rewritten
        // buckets and the semi-join would prune nothing.)
        val (curSel, oldSel) =
          if (!table.meta.mergeOnRead || removes || crosses) (cur, old)
          else table.fileGroupsAddedSince(sinceSnapshotId, bsel, toId) match {
            case Some(groups) =>
              val deltaKeys = readAligned(groups, payload)
                .select(keyColumns: _*).distinct()
              (cur.join(deltaKeys, keyCols, "left_semi"),
                old.join(deltaKeys, keyCols, "left_semi"))
            case None => (cur, old)
          }
        val cond = keyCols.map(k => col(s"c.$k") === col(s"o.$k")).reduce(_ && _) &&
          cellCols.map(c => col(s"c.$c") <=> col(s"o.$c")).reduce(_ && _)
        val diff = curSel.as("c").join(oldSel.as("o"), cond, "left_anti")
        if (!removes) diff
        else {
          // synthetic tombstones for vanished keys: their old payload cells
          // ride along (a delete is an op-cell overwrite), only _op flips
          val vanished = old
            .join(cur.select(keyColumns: _*), keyCols, "left_anti")
            .withColumn(OpCell, struct(col(s"$OpCell.l").as("l"),
              col(s"$OpCell.s").as("s"), lit("D").as("v")))
          diff.unionByName(vanished)
        }
      }
    val out = flattenCells(changed, payload)
    if (crosses && buckets.nonEmpty) {
      // the caller's bucket restriction, re-expressed as a row predicate in
      // the window-END layout (consistent with the payload schema pinning)
      val toBuckets = table.effectiveBuckets(table.snapshot(toId))
      out.filter(pmod(xxhash64(keyColumns: _*), lit(toBuckets)).cast(IntegerType)
        .isin(buckets.get.toSeq: _*))
    } else out
  }

  /** Change-data-feed view of the window (since, to]: [[changesSince]]'s
    * snapshot diff CLASSIFIED into `_change_type` rows — the Delta CDF /
    * Iceberg changelog-view shape. Per changed key:
    *   - `insert` — the key was not visible at `since`;
    *   - `delete` — visible at `since`, tombstoned at the window end; the
    *     row carries the PREIMAGE payload (what was deleted);
    *   - `update_preimage` + `update_postimage` — a PAIR per updated key.
    * Every row carries the `_change_lsn` / `_ts` of the change itself
    * (both images of a pair share them, so a consumer can re-pair images;
    * the feed orders by `_change_lsn`). A key created AND deleted inside
    * the window nets to no rows — nothing a consumer of `since` ever saw
    * changed.
    *
    * Cost is ONE hash join past [[changesSince]]: the post side IS the
    * snapshot diff (change-proportional under merge-on-read); the pre side
    * is the `since` state read under the SAME lineage bucket pruning, and
    * only diff keys survive the join. The classification itself is a
    * codegen'd projection (array of image structs + explode), no second
    * shuffle. Bootstrap (`since < 0`) and an expired `since` degrade to
    * all-`insert` redelivery of the visible window-end state, exactly as
    * [[changesSince]] conservatively redelivers — a consumer behind the
    * retention horizon rebuilds its mirror. */
  def changelogSince(sinceSnapshotId: Long, buckets: Option[Set[Int]] = None,
      toSnapshotId: Long = -1L): DataFrame = {
    checkLayout()
    // pin the window end NOW so the post diff and the preimage read cannot
    // straddle a concurrent commit
    val toId = if (toSnapshotId >= 0) toSnapshotId else table.currentSnapshotId
    val post = changesSince(sinceSnapshotId, buckets, toId)
    val payload = payloadOfSchema(
      if (toId >= 0) Some(table.schema(table.snapshot(toId).schemaId)) else None)
    val pcols = payload.fieldNames.toSeq
    val (crosses, bsel, unbounded) = diffPruning(sinceSnapshotId, buckets, toId)
    if (sinceSnapshotId < 0 || (unbounded && !crosses))
      return post.filter(col("_op") =!= lit("D")).select(
        (keyColumns ++ pcols.map(col) ++ Seq(lit("insert").as("_change_type"),
          col("_lsn").as("_change_lsn"), col("_ts"))): _*)
    // preimages: rows visible at `since`, bucket-pruned like the diff's own
    // old side; the left join below keeps only the diff's keys
    val oldCells = readStateCells(bsel, payload, Some(sinceSnapshotId))
    val preVis = flattenCells(oldCells.filter(col(s"$OpCell.v") =!= lit("D")), payload)
    val preR = preVis.select((keyColumns ++ pcols.map(c => col(c).as(s"__pre_$c")) :+
      lit(true).as("__pre")): _*)
    val j = post.join(preR, keyCols, "left_outer")
    val pre = col("__pre") <=> lit(true)
    val del = col("_op") === lit("D")
    def img(tpe: String, of: String => Column): Column =
      struct((lit(tpe).as("_change_type") +: pcols.map(c => of(c).as(c))): _*)
    val variants = array(
      when(!pre && !del, img("insert", col)),
      when(pre && del, img("delete", c => col(s"__pre_$c"))),
      when(pre && !del, img("update_preimage", c => col(s"__pre_$c"))),
      when(pre && !del, img("update_postimage", col)))
    j.select((keyColumns ++ Seq(explode(array_compact(variants)).as("__img"),
        col("_lsn").as("_change_lsn"), col("_ts"))): _*)
      .select((keyColumns ++ pcols.map(c => col(s"__img.$c").as(c)) ++ Seq(
        col("__img._change_type").as("_change_type"),
        col("_change_lsn"), col("_ts"))): _*)
  }

  /** Offset-range audit scan: stored change rows whose last-writer LSN falls
    * in [lo, hi], merged per key WITHIN the pruned file set. File skipping
    * happens at the MANIFEST level before any plan is built — files whose
    * footer-derived [minLsn, maxLsn] misses the range are never listed
    * (tightest on merge-on-read delta files, each covering one batch's LSN
    * range); the residual per-row predicate lands on the parquet `_op.l`
    * column for row-group pruning. */
  def scanLsnRange(lo: Long, hi: Long, buckets: Option[Set[Int]] = None): DataFrame = {
    checkLayout()
    val payload = tablePayload
    val unioned = readAligned(table.currentFileGroups(buckets, lsnRange = Some((lo, hi))), payload)
    val cellCols = Seq(OpCell, TsCell) ++ payload.fieldNames
    val merged = if (table.meta.mergeOnRead) lwwAgg(unioned, cellCols) else unioned
    flattenCells(merged.filter(col(s"$OpCell.l").between(lo, hi)), payload)
  }

  /** Data files the current snapshot would read for an LSN-range scan after
    * manifest-level stats pruning (exposed for tests/inspection). */
  def prunedFilesForLsnRange(lo: Long, hi: Long): Seq[String] =
    table.currentFileGroups(None, lsnRange = Some((lo, hi))).values.flatten.toSeq

  /** `conf.statsCols` resolved against a payload schema: (name, type) for
    * the columns that exist and whose type [[StatsSkip.supported]]. */
  private def typedStatsCols(payload: StructType)
      : Seq[(String, org.apache.spark.sql.types.DataType)] =
    conf.statsCols.flatMap(c => payload.fields.find(_.name == c))
      .filter(f => StatsSkip.supported(f.dataType))
      .map(f => f.name -> f.dataType)

  /** How scanRange would plan a predicate: total data files in the
    * snapshot, files skipped by the harvested bounds, and buckets read
    * whole because a live delta file makes payload pruning unsound there
    * (see [[scanRange]]). Metadata-only — no Spark job. */
  case class ScanPlan(filesTotal: Int, filesSkipped: Int, unprunableBuckets: Int)

  /** Manifest-level stats-pruned scan (Iceberg scan planning on
    * lower/upper bounds): the current visible state restricted to rows
    * whose final merged `column` value lies in [lo, hi] (either bound
    * optional; pass the same value twice for equality), opening only the
    * data files whose per-file bounds (`EngineConf.statsCols`, harvested
    * at merged-file write time) can satisfy the predicate. Sound by the
    * per-bucket rule documented on `DataFile.merged`: a file is skippable
    * only when every file in its bucket holds merged final state — on a
    * merge-on-read bucket with live deltas a matching key's row is
    * assembled from cells ACROSS files (carry-forward), so skipping any
    * one of them could null out unrelated columns of a surviving row;
    * such buckets are read whole (pruning resumes after compaction).
    * Tight when compaction sorted by the column: `compact(sortBy,
    * maxFileRows)` makes per-file ranges disjoint, so selectivity
    * translates directly into files never opened. */
  def scanRange(column: String, lo: Option[Any], hi: Option[Any],
      buckets: Option[Set[Int]] = None): DataFrame =
    scanWhere(Seq((column, lo, hi)), buckets)

  /** Multi-predicate [[scanRange]]: the conjunction of several column
    * ranges. A file is skipped when ANY predicate's bounds rule it out
    * (conjunction semantics), so each extra stats column can only shrink
    * the file set further. `asOfSnapshot` prunes a time-travel read the
    * same way — bounds live on the (immutable) manifest entries, so any
    * snapshot's file list carries its own skip index. */
  def scanWhere(preds: Seq[(String, Option[Any], Option[Any])],
      buckets: Option[Set[Int]] = None,
      asOfSnapshot: Option[Long] = None): DataFrame = {
    checkLayout()
    val payload = asOfSnapshot match {
      case Some(id) => payloadOfSchema(Some(table.schema(table.snapshot(id).schemaId)))
      case None => tablePayload
    }
    val (groups, mergeBuckets, _) = planScan(preds, buckets, payload, asOfSnapshot)
    val pruned = readAligned(groups, payload) // merged files: final state, key-disjoint
    val cells =
      if (mergeBuckets.isEmpty) pruned
      else pruned.unionByName(
        readStateCells(Some(mergeBuckets), payload, asOfSnapshot))
    val base = flattenCells(cells.filter(col(s"$OpCell.v") =!= lit("D")), payload)
    val resid = preds.flatMap { case (column, lo, hi) =>
      val dt = payload.fields.find(_.name == column).get.dataType
      Seq(lo.map(v => col(column) >= lit(v).cast(dt)),
        hi.map(v => col(column) <= lit(v).cast(dt))).flatten
    }.reduceOption(_ && _).getOrElse(lit(true))
    val out = base.filter(resid)
    if (payload.fieldNames.contains("content"))
      out.withColumn("content_sha256", sha2(col("content"), 256))
    else out
  }

  /** The [[ScanPlan]] scanRange would use (for tests and observability). */
  def scanRangePlan(column: String, lo: Option[Any], hi: Option[Any],
      buckets: Option[Set[Int]] = None): ScanPlan =
    planScan(Seq((column, lo, hi)), buckets, tablePayload, None)._3

  /** The [[ScanPlan]] scanWhere would use. */
  def scanWherePlan(preds: Seq[(String, Option[Any], Option[Any])],
      buckets: Option[Set[Int]] = None,
      asOfSnapshot: Option[Long] = None): ScanPlan =
    planScan(preds, buckets, asOfSnapshot match {
      case Some(id) => payloadOfSchema(Some(table.schema(table.snapshot(id).schemaId)))
      case None => tablePayload
    }, asOfSnapshot)._3

  private def planScan(preds: Seq[(String, Option[Any], Option[Any])],
      buckets: Option[Set[Int]], payload: StructType,
      asOfSnapshot: Option[Long])
      : (Map[Int, Seq[String]], Set[Int], ScanPlan) = {
    require(preds.nonEmpty, "scanWhere: at least one predicate")
    // (column, type, canonical lo, canonical hi)
    val canon = preds.map { case (column, lo, hi) =>
      val field = payload.fields.find(_.name == column).getOrElse(
        throw new IllegalArgumentException(s"scanWhere: no payload column '$column'"))
      val dt = field.dataType
      (column, dt, lo.map(v => StatsSkip.canon(dt, v)), hi.map(v => StatsSkip.canon(dt, v)))
    }
    val snap = asOfSnapshot.map(id => Some(table.snapshot(id)))
      .getOrElse(table.currentSnapshot).getOrElse(
        return (Map.empty, Set.empty, ScanPlan(0, 0, 0)))
    val byBucket = table.bucketFilesOf(snap).iterator
      .filter { case (b, _) => buckets.forall(_.contains(b.toInt)) }.toSeq
    // A COW table's files are all merged state by construction (every
    // commit rewrites whole buckets), including files from manifests
    // written before the `merged` flag existed.
    val allMerged = !table.meta.mergeOnRead
    var skipped = 0
    val kept = scala.collection.mutable.ListBuffer.empty[Icelite.DataFile]
    val mergeBuckets = scala.collection.mutable.Set.empty[Int]
    byBucket.foreach { case (b, files) =>
      if (allMerged || files.forall(_.merged)) {
        files.foreach { f =>
          val overlap = canon.forall { case (column, dt, loC, hiC) =>
            f.colStats.flatMap(_.get(column)) match {
              case Some(bounds) => StatsSkip.overlaps(dt, bounds, loC, hiC)
              case None => true // no stats for this column: cannot rule out
            }
          }
          if (overlap) kept += f else skipped += 1
        }
      } else mergeBuckets += b.toInt
    }
    val groups = kept.toSeq.groupBy(_.schemaId)
      .map { case (sid, fs) => sid -> fs.map(f => table.root.resolve(f.path).toString) }
    val total = byBucket.iterator.map(_._2.size).sum
    (groups, mergeBuckets.toSet, ScanPlan(total, skipped, mergeBuckets.size))
  }

  /** Incremental APPEND feed: the cell versions physically written after
    * `sinceSnapshotId`, merged per key within that file set — reads ONLY the
    * manifest-diff files (Iceberg's incremental read). On merge-on-read
    * tables those are the intervening batches' delta files, so feed I/O is
    * proportional to change volume, not table size; on copy-on-write they
    * are whole rewritten buckets (use `changesSince` there — the value-level
    * snapshot diff). Falls back to the full current state when `since` was
    * expired. Unlike `changesSince`, a late event that LOSES the LWW merge
    * against pre-existing state still appears here (it was written) — this
    * is the physical change-log view, `changesSince` is the logical one.
    * `toSnapshotId` bounds the window like `changesSince`'s; being the
    * physical view, columns stay aligned to the CURRENT schema (old files
    * up-cast) rather than pinned to the window end. */
  def appendedSince(sinceSnapshotId: Long, buckets: Option[Set[Int]] = None,
      toSnapshotId: Long = -1L): DataFrame = {
    checkLayout() // caller-supplied bucket ids are meaningless across a rebucket
    val payload = tablePayload
    val groups = table.fileGroupsAddedSince(sinceSnapshotId, buckets, toSnapshotId)
      .getOrElse(table.currentFileGroups(buckets))
    val merged = lwwAgg(readAligned(groups, payload), Seq(OpCell, TsCell) ++ payload.fieldNames)
    flattenCells(merged, payload)
  }

  /** Files `appendedSince(sinceSnapshotId)` would read (tests/inspection). */
  def filesAddedSince(sinceSnapshotId: Long): Seq[String] = {
    checkLayout()
    table.fileGroupsAddedSince(sinceSnapshotId, None)
      .getOrElse(table.currentFileGroups(None)).values.flatten.toSeq
  }

  /** Point read of ONE key, pruned at three levels before any row is read:
    * the manifest prunes to the key's hash BUCKET (computed driver-side with
    * the same xxhash64 the write path uses — no Spark job), the per-file
    * key-fingerprint bitmaps then skip every merge-on-read delta file that
    * provably misses the key (O(1) file opens per lookup instead of O(delta
    * files); see `EngineConf.keyFpBits`), and the equality predicates push
    * down to the parquet scan where the key-column bloom filters skip
    * non-matching row groups inside the surviving files. The LWW merge runs
    * only over this key's surviving cells. Tombstoned keys return zero rows,
    * like `currentState`. */
  def pointLookup(repo: String, path: String): DataFrame = {
    checkLayout()
    val payload = tablePayload
    val groups = keyLookupGroups(repo, path)
    // key filter BEFORE the merge: equality lands on the parquet scan
    val cells = readAligned(groups, payload)
      .filter(col("repo") === repo && col("path") === path)
    val nFiles = groups.valuesIterator.map(_.size).sum
    // >1 surviving merge-on-read file => cross-delta LWW merge; a single
    // file is one batch's in-batch reduction or a compaction output, both
    // key-unique (same fast path readStateCells takes). Copy-on-write never
    // merges: each key lives in exactly one file of its bucket.
    val cellCols = Seq(OpCell, TsCell) ++ payload.fieldNames
    val merged = if (table.meta.mergeOnRead && nFiles > 1) lwwAgg(cells, cellCols) else cells
    val base = flattenCells(merged.filter(col(s"$OpCell.v") =!= lit("D")), payload)
    if (payload.fieldNames.contains("content"))
      base.withColumn("content_sha256", sha2(col("content"), 256))
    else base
  }

  /** Manifest file selection for a point lookup: the key's hash bucket minus
    * every file whose fingerprint bitmap proves the key absent. Bitmaps have
    * no false negatives, so a file containing the key always survives;
    * fingerprint-less files (copy-on-write, compaction outputs, over-full
    * batches) are always read. Driver-side metadata only. */
  private def keyLookupFiles(repo: String, path: String): Seq[Icelite.DataFile] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal => CatLit, XxHash64}
    // seed 42 = the fixed seed of the SQL xxhash64 function (bucketCol)
    val h = XxHash64(Seq(CatLit.create(repo, StringType), CatLit.create(path, StringType)), 42L)
      .eval(null).asInstanceOf[Long]
    val bucket = (((h % conf.buckets) + conf.buckets) % conf.buckets).toInt
    val fp: Int = if (conf.keyFpBits <= 0) 0 else {
      // must replicate keyFpCol exactly: xxhash64('kfp', repo, path) % bits
      val hf = XxHash64(Seq(CatLit.create("kfp", StringType),
        CatLit.create(repo, StringType), CatLit.create(path, StringType)), 42L)
        .eval(null).asInstanceOf[Long]
      (((hf % conf.keyFpBits) + conf.keyFpBits) % conf.keyFpBits).toInt
    }
    table.currentSnapshot.toSeq
      .flatMap(s => table.bucketListOf(s, bucket)) // targeted: no full-map walk
      .filter(f => conf.keyFpBits <= 0 || f.keyFp.forall(Icelite.fpMayContain(_, fp)))
  }

  private def keyLookupGroups(repo: String, path: String): Map[Int, Seq[String]] =
    keyLookupFiles(repo, path).groupBy(_.schemaId)
      .map { case (sid, fs) => sid -> fs.map(f => table.root.resolve(f.path).toString) }

  /** Files `pointLookup(repo, path)` would open after bucket + fingerprint
    * pruning (tests/inspection, like `prunedFilesForLsnRange`). */
  def prunedFilesForKey(repo: String, path: String): Seq[String] =
    keyLookupGroups(repo, path).values.flatten.toSeq

  // ---------------------------------------------------------------- maintenance

  // Maintained chain-length estimate for auto-retention: walking the chain
  // per batch would be O(chain) manifest reads — the exact serial cost the
  // committed-epoch cache eliminated. Initialized with one walk, then
  // incremented per commit; reset to the retained count after each expiry.
  // (Conservative: commits this engine instance did not see only DELAY the
  // next expiry by that many batches — the bound stays amortized.)
  private var chainLenEstimate: Long = -1L

  private def maybeExpire(newSnapshots: Int): Unit = {
    if (conf.retainSnapshots <= 0) return
    if (chainLenEstimate < 0) chainLenEstimate = table.snapshotChain.size.toLong
    else chainLenEstimate += newSnapshots
    if (chainLenEstimate > 2L * conf.retainSnapshots) {
      table.expireSnapshots(conf.retainSnapshots)
      if (conf.vacuumAfterExpire) table.vacuum(conf.vacuumGraceMillis)
      chainLenEstimate = conf.retainSnapshots.toLong
    }
  }

  /** Compaction: rewrite each selected bucket's file list into one file
    * (Iceberg's rewrite_data_files). The MERGE is copy-on-write per bucket,
    * so multiple files per bucket arise from salted hot-bucket writes
    * (`writeSaltPerBucket` > 1) — compaction folds them back to one file per
    * bucket for cheaper state reads. Commits a new snapshot (batchEpoch=-1 —
    * not an ingest epoch); older snapshots keep referencing the old files,
    * so time travel is unaffected and `vacuum` (which walks the whole chain)
    * keeps them until snapshots are expired. Returns the new snapshot id.
    *
    * `sortBy` (Iceberg's rewrite with a SORT ORDER): cluster each bucket's
    * rows by the named payload columns (then key, for stable output) before
    * writing, and `maxFileRows` splits the sorted bucket into several files
    * of at most that many rows — consecutive, so their `sortBy` value
    * ranges are DISJOINT. Combined with `EngineConf.statsCols` covering the
    * same columns, that turns the harvested per-file bounds into a tight
    * skip index: `scanRange` on the sorted column opens ~selectivity
    * × files instead of all of them. The split files are all `merged`
    * (key-unique and key-disjoint — a sequential cut of one key-unique
    * sorted partition), so reads stay raw (no LWW re-merge) and point
    * lookups still prune by bucket + parquet key blooms.
    *
    * `zorderBy` (mutually exclusive with `sortBy`): cluster on the MORTON
    * key of 2-4 payload columns instead — see [[zorderKey]] — so after the
    * maxFileRows split a predicate on ANY named column prunes files, not
    * just the lexicographic leading one. */
  /** Threshold auto-compaction ([[EngineConf.morCompactThreshold]]):
    * [[compact]] restricted to the over-threshold buckets, applying the
    * table's DECLARED sort order (`writeSortCols`/`writeMaxFileRows` —
    * the Iceberg table-sort-order contract): a merge-on-read table never
    * pays the sort on its delta hot path, yet every file that survives
    * maintenance comes out clustered and stats-prunable. */
  private def autoCompact(buckets: Set[Int]): Long =
    compact(Some(buckets),
      sortBy =
        if (conf.zorderCols.nonEmpty) Nil
        else conf.writeSortCols.filter(tablePayload.fieldNames.contains),
      zorderBy = conf.zorderCols.filter(tablePayload.fieldNames.contains),
      maxFileRows = conf.writeMaxFileRows,
      purgeTombstonesBelowLsn =
        if (conf.tombstonePurgeLagLsn < 0) -1L
        else math.max(0L,
          highWatermark(table.currentSnapshotId) - conf.tombstonePurgeLagLsn))

  /** The Z-order (Morton) clustering key for `compact(zorderBy = cols)` —
    * Delta's OPTIMIZE ZORDER / Iceberg's z-order rewrite strategy. Each
    * column is mapped by a monotone "rank proxy" onto a 65536-cell grid
    * (linear min-max scaling — one small aggregate over the compaction
    * input learns the bounds; maintenance-time only, never the ingest hot
    * path), and the per-column cells are bit-interleaved by the codegen'd
    * [[graft.functions.InterleaveBits]] expression into one long sort key.
    * Sorting by it clusters every named dimension ~sqrt-tight, so after
    * the maxFileRows split a predicate on ANY of the columns prunes files
    * through its harvested statsCols bounds — where a lexicographic
    * `sortBy(a, b)` leaves `b`'s per-file bounds full-width.
    *
    * Monotone proxies per type: numerics/timestamps cast to double;
    * strings take their first 7 UTF-8 bytes as a left-justified big-endian
    * integer (preserves lexicographic order on that prefix — the same
    * bounded-prefix trade Iceberg makes truncating string bounds). Linear
    * scaling is skew-sensitive (a heavy hitter crowds one cell); Delta's
    * range-id variant resists skew at the cost of a per-column sample
    * pass — linear is the deterministic choice and the statsCols pruning
    * it feeds stays SOUND either way (bounds never lie; skew only costs
    * selectivity). Nulls map to cell 0 (they carry no bound anyway). */
  private def zorderKey(cells: DataFrame, cols: Seq[String],
      payload: StructType): Column = {
    graft.functions.VecOps.register(spark)
    def proxy(c: String): Column = payload(c).dataType match {
      case StringType =>
        // left-justified 6.5-byte prefix value: hex preserves byte order,
        // rpad keeps short strings below their extensions, and 13 hex
        // digits span 2^52 — inside a double's 2^53 exact-integer range,
        // so the conv result is exact and near-equal prefixes never tie
        // from rounding (14 digits would exceed it and round the low bits)
        conv(rpad(substring(hex(encode(col(s"$c.v"), "UTF-8")), 1, 13),
          13, "0"), 16, 10).cast("double")
      case _ => col(s"$c.v").cast("double")
    }
    val aggs = cols.flatMap(c =>
      Seq(min(proxy(c)).as(s"__zmn_$c"), max(proxy(c)).as(s"__zmx_$c")))
    // one driver row of 2k doubles — the bounds-learning pass
    val bounds = cells.agg(aggs.head, aggs.tail: _*).collect()(0)
    val codes = cols.zipWithIndex.map { case (c, i) =>
      val mn = Option(bounds.get(2 * i)).fold(0.0)(_.asInstanceOf[Double])
      val mx = Option(bounds.get(2 * i + 1)).fold(mn)(_.asInstanceOf[Double])
      val scaled =
        if (mx > mn) (proxy(c) - lit(mn)) / lit(mx - mn) * lit(65535.0)
        else lit(0.0)
      least(greatest(coalesce(scaled, lit(0.0)), lit(0.0)), lit(65535.0))
        .cast("int")
    }
    graft.functions.VecOps.interleaveBits(codes)
  }

  /** Rewrite buckets back to one merged file each (all of them by default).
    * `purgeTombstonesBelowLsn` >= 0 additionally DROPS tombstone rows whose
    * delete LSN is below the line — visible state is unchanged (tombstoned
    * keys were already hidden) and value-level change feeds diff states so
    * they are unaffected, but the key's revival-by-late-event contract
    * narrows: an event with an LSN below the line arriving later meets no
    * tombstone and resurrects the key. Only purge below the source's
    * replay lower bound (see `EngineConf.tombstonePurgeLagLsn`). */
  def compact(buckets: Option[Set[Int]] = None, sortBy: Seq[String] = Nil,
      maxFileRows: Long = 0L, purgeTombstonesBelowLsn: Long = -1L,
      zorderBy: Seq[String] = Nil): Long = {
    checkLayout()
    require(sortBy.isEmpty || zorderBy.isEmpty,
      "compact: sortBy and zorderBy are mutually exclusive cluster orders")
    // CAS pin: compaction is a read-modify-write of whole buckets, so a
    // concurrent append between the read and the replace-commit would be
    // silently folded away — conflict instead (caller/auto-compact simply
    // re-runs later; the orphaned output is vacuum-reclaimable)
    val observedParent = table.currentSnapshotId
    val payload = tablePayload
    val groups = table.currentFileGroups(buckets)
    if (groups.isEmpty) return table.currentSnapshotId
    val selected: Set[Int] = buckets.getOrElse(
      table.currentSnapshot.map(s => table.bucketFilesOf(s).keySet.map(_.toInt))
        .getOrElse(Set.empty))
    // read pinned to the SAME snapshot the CAS expects (read + commit form
    // one atomic unit or conflict)
    val allCells = readStateCells(Some(selected), payload,
      asOfSnapshot = Some(observedParent))
    // tombstone GC: coalesce(false) so a (theoretical) null op cell is
    // KEPT, never silently purged
    val cells =
      if (purgeTombstonesBelowLsn < 0) allCells
      else allCells.filter(!coalesce(
        col(s"$OpCell.v") === lit("D") &&
          col(s"$OpCell.l") < lit(purgeTombstonesBelowLsn),
        lit(false)))
    val outDir = table.root.resolve("data").resolve(f"compact-${System.nanoTime()}%x")
    // compaction output is SORTED by key (Iceberg sort-compaction): ingest
    // writes stay sort-free (the hot path never pays it), but the files
    // that live longest are key-clustered — parquet page min/max stats on
    // (repo, path) become tight, so point lookups prune pages inside big
    // compacted files, and runs of one repo dictionary/RLE-compress better.
    // A caller sort order goes FIRST (stats clustering beats key pages for
    // the columns it names); key blooms are sort-independent, so lookups
    // keep their row-group pruning either way.
    val badSort = (sortBy ++ zorderBy).filterNot(payload.fieldNames.contains)
    require(badSort.isEmpty, s"compact sortBy: not payload columns: $badSort")
    val clusterCols: Seq[Column] =
      if (zorderBy.size >= 2) Seq(zorderKey(cells, zorderBy, payload))
      // one z column degenerates to a plain range sort on it
      else (sortBy ++ zorderBy).map(c => col(s"$c.v"))
    val sortCols = col("__b") +: (clusterCols ++ keyColumns)
    val writer = cells.withColumn("__b", bucketCol)
      .repartition(selected.size, col("__b"))
      .sortWithinPartitions(sortCols: _*)
      .write
      .option("parquet.bloom.filter.enabled#repo", "true")
      .option("parquet.bloom.filter.enabled#path", "true")
    (if (maxFileRows > 0) writer.option("maxRecordsPerFile", maxFileRows)
     else writer)
      .partitionBy("__b").parquet(outDir.toString)
    val sid = table.ensureSchema(stateSchema(payload))
    val collected =
      collectBucketFiles(outDir, table, sid, spark.sessionState.newHadoopConf(),
        merged = true, statsCols = typedStatsCols(payload))
    // A bucket whose rows ALL purged away writes no parquet output, but the
    // replace-commit only replaces buckets present in the map — an absent
    // bucket would silently KEEP its old (tombstone-only) files. Emit an
    // explicit empty file list for every SELECTED bucket that had files at
    // the pinned snapshot and produced none. (`groups` is schemaId-keyed —
    // using it here once wiped an unselected bucket.)
    val oldSelected: Map[Int, List[Icelite.DataFile]] =
      table.bucketFilesOf(table.snapshot(observedParent))
        .collect { case (b, fs) if selected.contains(b.toInt) && fs.nonEmpty =>
          b.toInt -> fs }
    val bucketFiles =
      if (purgeTombstonesBelowLsn < 0) collected
      else collected ++ oldSelected.keySet
        .filterNot(collected.contains).map(_ -> List.empty[Icelite.DataFile])
    // Was anything ACTUALLY purged? The purge flag makes every change-feed
    // window crossing this commit synthesize vanished-key deletes and (on
    // merge-on-read) abandon the added-files key refinement — flagging a
    // no-op purge would degrade incremental reads forever. Manifest math
    // decides: no old file's LSN range reaches below the line => nothing
    // could drop; all-merged inputs are key-disjoint final rows, so a
    // row-count delta IS the purge count; live deltas collapse under the
    // merge, so a no-op cannot be proven — stay conservative there.
    val purgedSomething = purgeTombstonesBelowLsn >= 0 && {
      val oldFiles = oldSelected.values.flatten
      oldFiles.exists(_.minLsn < purgeTombstonesBelowLsn) && {
        val allMerged = !table.meta.mergeOnRead || oldFiles.forall(_.merged)
        if (allMerged)
          oldFiles.map(_.rows).sum != collected.values.flatten.map(_.rows).sum
        else true
      }
    }
    // replace-commit (append=false) even on merge-on-read tables: compaction
    // folds a bucket's delta pile back into one merged file. A purging
    // compaction is flagged on the snapshot: change-feed windows spanning
    // it must synthesize deletes for vanished keys (Snapshot.purge).
    table.commit(-1L, sid, bucketFiles, Nil, rowDelta = 0,
      expectedParentId = observedParent,
      purge = purgedSomething).snapshotId
  }

  /** MINOR compaction (LSM "minor"/Iceberg-binpack analog of [[compact]]):
    * fold each selected bucket's DELTA files into ONE combined delta file,
    * leaving merged (base) files untouched. The per-column cell merge is
    * associative, commutative and idempotent, so pre-reducing any subset
    * of deltas is exact — read-time LWW over {base, combined} equals LWW
    * over {base, d1..dk}. The point is the cost class: maintenance write
    * work is O(delta rows), not O(bucket rows). At 10^10 events a table's
    * base dwarfs its churn window, so the full rewrite grows with the
    * TABLE while this grows with the CHANGE volume — use it to bound read
    * fan-in (and the per-read LWW width) between much rarer full rewrites,
    * which stay the only way to fold cells into key-unique rows, purge
    * tombstones, or produce stats-prunable merged files.
    *
    * Only buckets holding at least `minInputFiles` delta files are
    * touched. The combined delta keeps everything a delta carries:
    * tombstone cells survive (revival semantics unchanged), LSN stats are
    * re-harvested from the new footer, and the key-fingerprint bitmap is
    * the driver-side OR of the inputs' bitmaps (a union of
    * no-false-negative single-hash blooms is one; dropped if any input
    * lacks one or the union crosses the write path's 25% load cap).
    * Commits CAS-style against the snapshot it read (a concurrent append
    * between read and replace-commit would otherwise be silently folded
    * away — same protection as [[compact]]). Merge-on-read tables only.
    * Returns the new snapshot id (the current one when nothing
    * qualified). */
  def compactDeltas(buckets: Option[Set[Int]] = None,
      minInputFiles: Int = 2): Long = {
    checkLayout()
    require(table.meta.mergeOnRead, "compactDeltas: merge-on-read tables only")
    require(minInputFiles >= 2, s"minInputFiles must be >= 2, got $minInputFiles")
    val observedParent = table.currentSnapshotId
    if (observedParent < 0) return observedParent
    val payload = tablePayload
    val selected: Map[Int, List[Icelite.DataFile]] =
      table.bucketFilesOf(table.snapshot(observedParent)).collect {
        case (b, fs) if buckets.forall(_.contains(b.toInt)) &&
          fs.count(!_.merged) >= minInputFiles => b.toInt -> fs
      }
    if (selected.isEmpty) return observedParent
    val deltas: Map[Int, List[Icelite.DataFile]] =
      selected.map { case (b, fs) => b -> fs.filterNot(_.merged) }
    // (schemaId -> absolute paths) over JUST the delta files — the read
    // never opens a base file
    val groups: Map[Int, Seq[String]] = deltas.values.flatten.toSeq
      .groupBy(_.schemaId)
      .map { case (sid, fs) =>
        sid -> fs.map(f => table.root.resolve(f.path).toString) }
    val cells = lwwAgg(readAligned(groups, payload),
      Seq(OpCell, TsCell) ++ payload.fieldNames)
    val outDir =
      table.root.resolve("data").resolve(f"minor-${System.nanoTime()}%x")
    // key-sorted like every other maintenance output: combined deltas live
    // until the next rewrite, so they earn page stats + dictionary runs
    cells.withColumn("__b", bucketCol)
      .repartition(selected.size, col("__b"))
      .sortWithinPartitions((col("__b") +: keyColumns): _*)
      .write
      .option("parquet.bloom.filter.enabled#repo", "true")
      .option("parquet.bloom.filter.enabled#path", "true")
      .partitionBy("__b").parquet(outDir.toString)
    val sid = table.ensureSchema(stateSchema(payload))
    val collected = collectBucketFiles(outDir, table, sid,
      spark.sessionState.newHadoopConf(), merged = false, statsCols = Nil)
    val bucketFiles: Map[Int, List[Icelite.DataFile]] =
      selected.map { case (b, fs) =>
        val fp = fpUnionOf(deltas(b))
        b -> (fs.filter(_.merged) ++
          collected.getOrElse(b, Nil).map(_.copy(keyFp = fp)))
      }
    table.commit(-1L, sid, bucketFiles, Nil, rowDelta = 0,
      expectedParentId = observedParent).snapshotId
  }

  /** OR-union of delta files' key-fingerprint bitmaps (see
    * [[Icelite.fpBitmap]]): sound because each input has no false
    * negatives, so neither does the union. None when any input lacks a
    * bitmap (unknown stays unknown), widths disagree (mixed keyFpBits
    * configs), or the union's load crosses the write path's 25% cap
    * (useless before wrong). */
  private def fpUnionOf(inputs: Seq[Icelite.DataFile]): Option[String] = {
    val bms = inputs.map(_.keyFp)
    if (bms.isEmpty || bms.exists(_.isEmpty)) return None
    val arrs = bms.flatten.map(java.util.Base64.getDecoder.decode)
    if (arrs.map(_.length).distinct.size != 1) return None
    val out = new Array[Byte](arrs.head.length)
    arrs.foreach { a =>
      var i = 0
      while (i < out.length) { out(i) = (out(i) | a(i)).toByte; i += 1 }
    }
    val setBits = out.iterator.map(b => Integer.bitCount(b & 0xff)).sum
    if (setBits > out.length * 8 / 4) None
    else Some(java.util.Base64.getEncoder.encodeToString(out))
  }

  /** Bucket-count EVOLUTION (Iceberg's partition evolution): rewrite the
    * whole table under `newBuckets` and flip the layout ATOMICALLY with the
    * snapshot pointer — the new count rides on the snapshot itself and
    * propagates to every descendant, so there is no second metadata file
    * whose update could race a crash (table.json is refreshed only as a
    * load-time hint). The scale lever this exists for: a table created at
    * 2^10 buckets that grew 100× has multi-GB buckets — too coarse for
    * pruning and hot for writes — and the fix must be a single online
    * commit, not a new table + consumer migration.
    *
    * Everything downstream keeps working across the boundary: old snapshots
    * still read/time-travel under their own layout (the rebucket manifest
    * is `full`, so old-layout bucket ids never leak through the parent
    * walk); `changesSince` windows that span the rebucket diff exactly —
    * values did not change, so a pure rebucket feeds NOTHING — with bucket
    * pruning suspended (mixed hash regimes) and the caller's bucket
    * restriction re-applied in the window-end layout; incremental views
    * and mirrors follow via the same suspension (`bucketsTouchedSince`
    * returns None across the boundary).
    *
    * One COW-style rewrite of the full state, O(table) once — the same
    * cost class as Iceberg's rewrite_data_files after a partition-spec
    * change. Tombstones ride along (they are state). Returns a NEW engine
    * bound to the new layout; THIS instance becomes invalid and every
    * bucket-dependent operation on it fails loudly (checkLayout). */
  def rebucket(newBuckets: Int): CdcEngine = {
    checkLayout()
    require(newBuckets > 0, "bucket count must be positive")
    if (newBuckets == conf.buckets) return this
    val newConf = conf.copy(buckets = newBuckets)
    if (table.currentSnapshotId < 0) { // empty chain: creation meta is the layout
      table.updateBucketsHint(newBuckets)
      return new CdcEngine(spark, table, newConf)
    }
    val payload = tablePayload
    // CAS pin: the rewrite reads the WHOLE table at this snapshot and its
    // commit replaces the entire bucket map (manifest forced full), so a
    // concurrent commit landing between the read and the commit would be
    // silently erased — its epoch stays marked committed while its rows
    // vanish. Same protection compact() and rollbackTo carry.
    val observedParent = table.currentSnapshotId
    val cells = readStateCells(None, payload) // merged cells, tombstones included
    val newBucketCol =
      pmod(xxhash64(keyColumns: _*), lit(newBuckets)).cast(IntegerType)
    val outDir = table.root.resolve("data").resolve(f"rebucket-${System.nanoTime()}%x")
    cells.withColumn("__b", newBucketCol)
      .repartition(newBuckets, col("__b"))
      .sortWithinPartitions((col("__b") +: keyColumns): _*) // clustered, like compaction
      .write
      .option("parquet.bloom.filter.enabled#repo", "true")
      .option("parquet.bloom.filter.enabled#path", "true")
      .partitionBy("__b").parquet(outDir.toString)
    val sid = table.ensureSchema(stateSchema(payload))
    val bucketFiles =
      collectBucketFiles(outDir, table, sid, spark.sessionState.newHadoopConf(),
        merged = true, statsCols = typedStatsCols(payload))
    table.commit(-1L, sid, bucketFiles, Nil, rowDelta = 0, rebucketTo = newBuckets,
      expectedParentId = observedParent)
    new CdcEngine(spark, table, newConf)
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

  /** Marks a FULL (un-bucket-pruned) state read — current or time-travel —
    * as a candidate for metadata-only global aggregates: [[IceliteMetaAggRule
    * graft.sql.IceliteMetaAggRule]] rewrites `count(*)` / `min` / `max`
    * directly over a tagged read into a precomputed one-row relation when
    * the manifest can answer exactly (see [[CdcEngine.metaCount]]).
    * Carries the engine and the pinned snapshot (None = head). Set by
    * `stateOf` itself, so both SQL reads and `currentState().count()`
    * qualify. */
  val MetaScanTag =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[
      (CdcEngine, Option[Long])]("icelite.metaScan")

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

  /** List parquet files written under `dir/__b=N/` as bucket -> manifest
    * entries, harvesting row count and `_op.l` (last-writer LSN) min/max
    * from each parquet FOOTER. Driver-side metadata reads, NOT a Spark job
    * — the same footer pass that produces the read-back row counts yields
    * the file-skipping stats for free. The per-file reads run on a small
    * thread pool: sequential they cost ~10 ms x file count per commit, a
    * SERIAL (Amdahl) term that visibly caps replay scaling efficiency at
    * high parallelism. */
  /** Total row count of every parquet file under `dir`, from footers only
    * (driver-side metadata reads — no Spark job). */
  private[engine] def footerRows(dir: Path,
      hadoopConf: org.apache.hadoop.conf.Configuration): Long = {
    if (!Files.exists(dir)) return 0L
    val stream = Files.walk(dir)
    val paths =
      try stream.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .toList
      finally stream.close()
    paths.map { p =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toString), hadoopConf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  private[engine] def collectBucketFiles(dir: Path, table: IceliteTable, schemaId: Int,
      hadoopConf: org.apache.hadoop.conf.Configuration,
      merged: Boolean = false,
      statsCols: Seq[(String, org.apache.spark.sql.types.DataType)] = Nil)
      : Map[Int, List[Icelite.DataFile]] = {
    val stream = Files.walk(dir)
    val paths =
      try stream.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .toList
      finally stream.close()
    def statsOf(p: Path): Icelite.DataFile = {
      val hp = new org.apache.hadoop.fs.Path(p.toString)
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hp, hadoopConf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val rows = r.getRecordCount
        val lsnStats = r.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .filter(_.getPath.toDotString == s"$OpCell.l")
          .map(_.getStatistics)
        val usable = lsnStats.nonEmpty &&
          lsnStats.forall(s => s != null && !s.isEmpty && s.hasNonNullValue)
        val (mn, mx) =
          if (usable)
            (lsnStats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min,
              lsnStats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max)
          else (Long.MinValue, Long.MaxValue) // unknown => never skipped
        // visible-row count, same footer, free: a row group whose op-column
        // minimum is above "D" has no tombstones (D orders first among
        // D/I/U), one whose maximum IS "D" is all tombstones; a group that
        // interleaves the two leaves the file undecidable (-1 — readers
        // fall back to scanning). Exact for the common cases metadata-only
        // count needs: delete-free files, and key-sorted compaction output
        // where deletes cluster into their own groups.
        val liveRows: Long = {
          var total = 0L
          var decidable = true
          r.getFooter.getBlocks.asScala.foreach { blk =>
            val op = blk.getColumns.asScala
              .find(_.getPath.toDotString == s"$OpCell.v").map(_.getStatistics)
            op match {
              // a null op cell would be filtered by readers but counted by
              // the bounds alone — require a known zero null count
              case Some(s) if s != null && !s.isEmpty && s.hasNonNullValue &&
                  s.isNumNullsSet && s.getNumNulls == 0 =>
                val mn = StatsSkip.binToString(s.genericGetMin)
                val mx = StatsSkip.binToString(s.genericGetMax)
                if (mn > "D") total += blk.getRowCount
                else if (mx == "D") () // whole group tombstoned: adds 0
                else decidable = false
              case _ => decidable = false
            }
          }
          if (decidable) total else -1L
        }
        // payload-column bounds (cell leaf `<col>.v`), same footer, free.
        // Per column: every chunk must carry usable statistics or the
        // column is left unknown; all chunks null-only => empty bounds
        // ("no values in this file"); a column absent from this writer
        // schema is all-null by definition (schema evolution null-fill).
        val colStats: Map[String, List[String]] =
          if (statsCols.isEmpty) Map.empty
          else {
            val chunksByPath = r.getFooter.getBlocks.asScala
              .flatMap(_.getColumns.asScala)
              .groupBy(_.getPath.toDotString)
            statsCols.flatMap { case (name, dt) =>
              chunksByPath.get(s"$name.v") match {
                case None => Some(name -> Nil) // column not in this file
                case Some(chunks) =>
                  val st = chunks.map(_.getStatistics)
                  if (st.exists(s => s == null || s.isEmpty)) None // unknown
                  else {
                    val nonNull = st.filter(_.hasNonNullValue)
                    if (nonNull.isEmpty) Some(name -> Nil) // all null
                    else {
                      val enc = nonNull.map(s =>
                        StatsSkip.encode(dt, s.genericGetMin, s.genericGetMax))
                      if (enc.exists(_.isEmpty)) None // e.g. over-long string
                      else {
                        val pairs = enc.map(_.get)
                        val lo = pairs.map(_.head)
                          .reduceLeft((a, b) => if (StatsSkip.cmp(dt, a, b) <= 0) a else b)
                        val hi = pairs.map(_.last)
                          .reduceLeft((a, b) => if (StatsSkip.cmp(dt, a, b) >= 0) a else b)
                        Some(name -> List(lo, hi))
                      }
                    }
                  }
              }
            }.toMap
          }
        Icelite.DataFile(table.relativize(p), schemaId, rows, mn, mx,
          merged = merged, liveRows = liveRows,
          colStats = if (colStats.isEmpty) None else Some(colStats))
      } finally r.close()
    }
    val byPath: Map[Path, Icelite.DataFile] =
      if (paths.size <= 1) paths.map(p => p -> statsOf(p)).toMap
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(16, paths.size))
        try paths.map(p => p -> pool.submit(new java.util.concurrent.Callable[Icelite.DataFile] {
            override def call(): Icelite.DataFile = statsOf(p)
          })).map { case (p, f) => p -> f.get() }.toMap
        finally pool.shutdown()
      }
    paths
      .groupBy { p =>
        val seg = p.getParent.getFileName.toString // "__b=N"
        seg.stripPrefix("__b=").toInt
      }
      .map { case (b, ps) => b -> ps.sortBy(_.toString).map(byPath) }
  }
}
