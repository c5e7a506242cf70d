package graft.sql

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.AliasIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, InsertStarAction, LogicalPlan, MergeAction, SubqueryAlias, UpdateAction, UpdateStarAction}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{coalesce, col, lit, not}
import org.apache.spark.sql.types.LongType

import graft.engine.CdcEngine
import graft.model.ChangeEvent

/** Row-level SQL DML over icelite tables — `UPDATE` / `DELETE FROM` /
  * `MERGE INTO` / `INSERT INTO` on `ice.<name>`, the Delta/Iceberg
  * row-level-operation surface, re-expressed on the engine's own MERGE:
  * each statement derives a change-event batch (op I/U/D + the LWW stamp)
  * from its row set and commits it through `applyBatch`, so EVERYTHING the
  * engine guarantees — per-key LWW, bucket-local rewrite, lineage,
  * snapshot isolation, feeds/changelogs/views seeing the change, time
  * travel to before it — holds for SQL writes with zero new write-path
  * code. The commit uses the reserved non-batch epoch (-1), so it can
  * never collide with (or replay-skip) a streaming writer's epoch ledger.
  *
  * Semantics notes (all spec'd in SqlDmlSpec):
  *   - The statement's row set is determined when it starts executing
  *     (the engine state pinned at that moment) — read-committed DML, the
  *     same contract an Iceberg/Delta COW operation makes.
  *   - `UPDATE ... SET c = NULL` does NOT null the cell: a null payload
  *     column on a CDC update means "unchanged — carry forward"
  *     (ChangeEvent contract). This is the engine's wire semantics, kept
  *     deliberately; to blank a cell, write a sentinel value.
  *   - `INSERT INTO` a key that already exists is an UPSERT (the table is
  *     key-unique by construction; append-duplicate semantics cannot
  *     exist here).
  *   - Key columns are the MERGE identity: assigning them in UPDATE /
  *     MERGE-UPDATE is rejected (re-key = DELETE + INSERT). New columns
  *     are rejected too — schema evolves through batch reconciliation.
  *   - A MERGE whose source matches the same target key twice fails
  *     loudly (the Delta cardinality-violation rule): both rows would
  *     carry the same LWW stamp and the survivor would be nondeterministic.
  *
  * Scale: DELETE/UPDATE read the (bucket-pruned only by Catalyst filter
  * pushdown) current state once and commit O(affected buckets) like any
  * other batch; MERGE adds one hash join of the source against the state.
  * The extra full pass each statement pays over `applyBatch` is the
  * per-key duplicate guard on MERGE/INSERT event sets.
  */
object IceliteDml {
  /** currentState envelope columns — never DML-assignable, never payload. */
  private val Envelope = Set("_op", "_lsn", "_seq", "_ts", "content_sha256")
  private val TMark = "__ice_tgt"
  private val SMark = "__ice_src"

  private[sql] def output: Seq[Attribute] =
    Seq(AttributeReference("num_affected_rows", LongType, nullable = false)())

  private def engineOf(spark: SparkSession, name: String): CdcEngine =
    IceliteSql.lookup(spark, name)
      .map(IceliteSql.effective(spark, _))
      .getOrElse(IceliteSql.fail(
        s"${IceliteSql.Catalog}.$name is no longer registered"))

  /** Current visible state, qualified so `<alias>.col` (or `ice.<name>.col`
    * when unaliased) resolves in conditions/assignments. */
  private def aliasedState(spark: SparkSession, engine: CdcEngine,
      name: String, alias: Option[String]): DataFrame = {
    val st = engine.currentState()
    val id = alias.map(AliasIdentifier(_))
      .getOrElse(AliasIdentifier(name, Seq(IceliteSql.Catalog)))
    GraftSqlBridge.dataFrameOf(spark, SubqueryAlias(id, st.queryExecution.analyzed))
  }

  private def payloadCols(state: DataFrame): Seq[String] =
    state.columns.toSeq.filterNot(c =>
      Envelope.contains(c) || ChangeEvent.keyCols.contains(c))

  private def bridge(e: Expression): Column = GraftSqlBridge.column(e)

  private def nameOf(key: Expression): String = key match {
    case a: UnresolvedAttribute => a.nameParts.last
    case other => IceliteSql.fail(s"cannot assign to ${other.sql}")
  }

  /** Assignment list -> (payload-name -> value column), validated against
    * the live payload set: keys and envelope are engine identity, unknown
    * columns are schema evolution (a batch-reconciliation concern). */
  private def assignMap(name: String, assigns: Seq[Assignment],
      payload: Seq[String], allowKeys: Boolean): Map[String, Column] =
    assigns.map { a =>
      val n = nameOf(a.key)
      val canonical = payload.find(_.equalsIgnoreCase(n))
        .orElse(ChangeEvent.keyCols.find(_.equalsIgnoreCase(n)).filter(_ => allowKeys))
      canonical.getOrElse {
        if (ChangeEvent.keyCols.exists(_.equalsIgnoreCase(n)))
          IceliteSql.fail(s"${IceliteSql.Catalog}.$name: key column $n is the MERGE " +
            "identity and cannot be assigned — re-keying is DELETE + INSERT")
        else if (Envelope.exists(_.equalsIgnoreCase(n)) ||
            ChangeEvent.envelopeCols.exists(_.equalsIgnoreCase(n)))
          IceliteSql.fail(s"${IceliteSql.Catalog}.$name: $n is an engine-managed " +
            "envelope column")
        else
          IceliteSql.fail(s"${IceliteSql.Catalog}.$name has no column $n — new " +
            "columns arrive through CdcEngine batch reconciliation, not DML")
      } -> bridge(a.value)
    }.toMap

  /** Stamp an event frame and commit it as one non-batch engine epoch.
    * LSN = table high watermark + 1: strictly above every applied change,
    * so the DML wins LWW against all history and loses to the next one.
    * `ts` is DERIVED from that LSN (epoch-millis = lsn), not wall clock:
    * a DML statement has no source event time, and stamping `now()` was
    * the one nondeterministic write in an otherwise seed-deterministic
    * engine — replaying the same statements against the same table must
    * produce a byte-identical table (SqlDmlSpec pins it). LWW order is
    * decided by the LSN anyway; ts is carried payload. */
  private def commit(engine: CdcEngine, events: DataFrame,
      guardKeyDups: Boolean, what: String): Long = {
    val lsn = engine.highWatermark(engine.table.currentSnapshotId) + 1L
    val stamped = events
      .withColumn("commit_lsn", lit(lsn))
      .withColumn("seq", lit(0))
      .withColumn("ts", lit(new java.sql.Timestamp(lsn)))
      .persist()
    try {
      if (guardKeyDups) {
        val dup = stamped.groupBy(ChangeEvent.keyCols.map(col): _*).count()
          .filter(col("count") > 1).limit(1).collect()
        if (dup.nonEmpty) IceliteSql.fail(s"$what touches target key " +
          s"(${dup.head.toSeq.dropRight(1).mkString(", ")}) more than once — " +
          "the survivor would be nondeterministic (cardinality violation)")
      }
      if (stamped.isEmpty) 0L
      else engine.applyBatch(-1L, stamped).events
    } finally stamped.unpersist()
  }

  private def asRows(n: Long): Seq[Row] = Seq(Row(n))

  // -------------------------------------------------------------- ALTER

  private[sql] def runAlter(spark: SparkSession, c: IceliteAlterCommand): Seq[Row] = {
    val engine = engineOf(spark, c.name)
    val state = engine.currentState()
    def existing(n: String): Option[String] =
      state.columns.find(_.equalsIgnoreCase(n))
    def guardEngineCol(n: String): Unit = {
      if (ChangeEvent.keyCols.exists(_.equalsIgnoreCase(n)))
        IceliteSql.fail(s"${IceliteSql.Catalog}.${c.name}: key column $n is the " +
          "MERGE identity and cannot be altered")
      if (Envelope.exists(_.equalsIgnoreCase(n)) ||
          ChangeEvent.envelopeCols.exists(_.equalsIgnoreCase(n)))
        IceliteSql.fail(s"${IceliteSql.Catalog}.${c.name}: $n is an " +
          "engine-managed envelope column")
    }
    val added = c.adds.value.map { qc =>
      if (qc.path.exists(_.name.nonEmpty))
        IceliteSql.fail(s"${IceliteSql.Catalog}.${c.name}: nested columns are " +
          "not supported — payload columns are flat")
      if (qc.default.nonEmpty)
        IceliteSql.fail(s"${IceliteSql.Catalog}.${c.name}: column DEFAULTs are " +
          "not supported — absent cells read as null (CDC carry-forward)")
      guardEngineCol(qc.colName)
      if (existing(qc.colName).nonEmpty)
        IceliteSql.fail(s"${IceliteSql.Catalog}.${c.name}: column ${qc.colName} " +
          "already exists")
      org.apache.spark.sql.types.StructField(qc.colName, qc.dataType, nullable = true)
    }
    val widened = c.alters.value.map { sp =>
      if (sp.column.name.size != 1)
        IceliteSql.fail(s"${IceliteSql.Catalog}.${c.name}: nested columns are " +
          "not supported — payload columns are flat")
      val n = sp.column.name.head
      guardEngineCol(n)
      val cur = existing(n).getOrElse(IceliteSql.fail(
        s"${IceliteSql.Catalog}.${c.name} has no column $n"))
      val target = sp.newDataType.getOrElse(IceliteSql.fail(
        s"${IceliteSql.Catalog}.${c.name}: only ALTER COLUMN ... TYPE " +
          "(widening) is supported"))
      val curType = state.schema(state.schema.fieldIndex(cur)).dataType
      // reconcile() would also reject a narrow, but failing here names the
      // statement instead of surfacing a batch-reconciliation error
      if (!graft.engine.SchemaEvolve.widen(curType, target).contains(target))
        IceliteSql.fail(s"${IceliteSql.Catalog}.${c.name}: illegal type change " +
          s"for $cur: ${curType.simpleString} -> ${target.simpleString} " +
          "(only widening byte/short/int/long, float/double)")
      org.apache.spark.sql.types.StructField(cur, target, nullable = true)
    }
    // the evolved columns ride an EMPTY batch: reconcile() keeps every
    // existing payload column and adds/widens exactly these
    val envelope = ChangeEvent.schema.fields.filter(f =>
      ChangeEvent.envelopeCols.contains(f.name)).toSeq
    val ddlSchema = org.apache.spark.sql.types.StructType(
      envelope ++ added ++ widened)
    engine.applyBatch(-1L,
      spark.createDataFrame(java.util.Collections.emptyList[Row](), ddlSchema))
    Nil
  }

  // ------------------------------------------------------------- DELETE

  private[sql] def runDelete(spark: SparkSession, c: IceliteDeleteCommand): Seq[Row] = {
    val engine = engineOf(spark, c.name)
    val state = aliasedState(spark, engine, c.name, c.alias)
    val payload = payloadCols(state)
    val hit = state.filter(bridge(c.cond.value))
    // tombstone events: old payload rides along (a delete is an op-cell
    // overwrite; the engine ignores tombstone payload for visibility)
    val events = hit.select(
      (ChangeEvent.keyCols ++ payload).map(col) :+ lit("D").as("op"): _*)
    asRows(commit(engine, events, guardKeyDups = false, "DELETE"))
  }

  // ------------------------------------------------------------- UPDATE

  private[sql] def runUpdate(spark: SparkSession, c: IceliteUpdateCommand): Seq[Row] = {
    val engine = engineOf(spark, c.name)
    val state = aliasedState(spark, engine, c.name, c.alias)
    val payload = payloadCols(state)
    val types = state.schema.fields.map(f => f.name -> f.dataType).toMap
    val set = assignMap(c.name, c.assigns.value, payload, allowKeys = false)
    val hit = c.cond.map(r => state.filter(bridge(r.value))).getOrElse(state)
    // cast assignments to the column's live type: a NULL (or narrower)
    // value must arrive as the column's type, not as void
    val events = hit.select(
      ChangeEvent.keyCols.map(col) ++
        payload.map(p => set.get(p).map(_.cast(types(p))).getOrElse(col(p)).as(p)) :+
        lit("U").as("op"): _*)
    asRows(commit(engine, events, guardKeyDups = false, "UPDATE"))
  }

  // ------------------------------------------------------------- INSERT

  private[sql] def runInsert(spark: SparkSession, c: IceliteInsertCommand): Seq[Row] = {
    val engine = engineOf(spark, c.name)
    val state = aliasedState(spark, engine, c.name, None)
    val payload = payloadCols(state)
    val tableCols = ChangeEvent.keyCols ++ payload
    val src = GraftSqlBridge.dataFrameOf(spark, c.query.value)
    // resolve the source's columns onto table columns: BY NAME, through an
    // explicit column list (positional into those names), or positional
    // over the full (keys ++ payload) order
    val mapped: Map[String, Column] =
      if (c.byName || c.cols.nonEmpty) {
        val names = if (c.cols.nonEmpty) c.cols else src.columns.toSeq
        if (c.cols.nonEmpty && c.cols.length != src.columns.length)
          IceliteSql.fail(s"INSERT column list has ${c.cols.length} columns " +
            s"but the query produces ${src.columns.length}")
        names.zip(src.columns).map { case (n, sc) =>
          tableCols.find(_.equalsIgnoreCase(n)).getOrElse(
            IceliteSql.fail(s"${IceliteSql.Catalog}.${c.name} has no column $n")) ->
            src(sc)
        }.toMap
      } else {
        if (src.columns.length != tableCols.length)
          IceliteSql.fail(s"${IceliteSql.Catalog}.${c.name} expects " +
            s"${tableCols.length} columns (${tableCols.mkString(", ")}), the " +
            s"query produces ${src.columns.length} — use INSERT INTO ... (cols) " +
            "or BY NAME for partial inserts")
        tableCols.zip(src.columns.toSeq).map { case (t, s) => t -> src(s) }.toMap
      }
    ChangeEvent.keyCols.find(!mapped.contains(_)).foreach(k =>
      IceliteSql.fail(s"INSERT must provide key column $k"))
    val types = state.schema.fields.map(f => f.name -> f.dataType).toMap
    val events = src.select(
      ChangeEvent.keyCols.map(k => mapped(k).cast(types(k)).as(k)) ++
        payload.map(p => mapped.getOrElse(p, lit(null)).cast(types(p)).as(p)) :+
        lit("I").as("op"): _*)
    asRows(commit(engine, events, guardKeyDups = true, "INSERT"))
  }

  // -------------------------------------------------------------- MERGE

  private[sql] def runMerge(spark: SparkSession, c: IceliteMergeCommand): Seq[Row] = {
    val engine = engineOf(spark, c.name)
    val state = aliasedState(spark, engine, c.name, c.alias)
    val payload = payloadCols(state)
    val types = state.schema.fields.map(f => f.name -> f.dataType).toMap
    val srcDf = GraftSqlBridge.dataFrameOf(spark, c.source.value)
    Seq(TMark, SMark).foreach(m => require(!srcDf.columns.contains(m),
      s"MERGE source may not carry a $m column"))

    val tgt = state.withColumn(TMark, lit(true))
    val src = srcDf.withColumn(SMark, lit(true))
    val matched = c.matchedActions.value
    val notMatched = c.notMatchedActions.value
    val bySource = c.notMatchedBySourceActions.value
    val joinType = (notMatched.nonEmpty, bySource.nonEmpty) match {
      case (true, true) => "full_outer"
      case (true, false) => "right_outer"
      case (false, true) => "left_outer"
      case (false, false) => "inner"
    }
    val joined = tgt.join(src, bridge(c.cond.value), joinType).persist()
    try {
      val isT = coalesce(tgt(TMark), lit(false))
      val isS = coalesce(src(SMark), lit(false))
      val sCols = srcDf.columns.map(c0 => c0 -> src(c0)).toMap
      def sCol(n: String): Option[Column] =
        sCols.collectFirst { case (k, v) if k.equalsIgnoreCase(n) => v }

      def condOf(a: MergeAction): Column =
        a.condition.map(e => coalesce(bridge(e), lit(false))).getOrElse(lit(true))
      // SQL MERGE action lists are first-match-wins within each category
      def guarded(base: DataFrame, actions: Seq[MergeAction], i: Int): DataFrame =
        base.filter(actions.take(i).map(a => not(condOf(a)))
          .foldLeft(condOf(actions(i)))(_ && _))

      def updateEvents(row: DataFrame, set: Map[String, Column]): DataFrame =
        row.select(
          ChangeEvent.keyCols.map(k => tgt(k).as(k)) ++
            payload.map(p => set.get(p).map(_.cast(types(p))).getOrElse(tgt(p)).as(p)) :+
            lit("U").as("op"): _*)
      def deleteEvents(row: DataFrame): DataFrame =
        row.select(
          ChangeEvent.keyCols.map(k => tgt(k).as(k)) ++
            payload.map(p => tgt(p).as(p)) :+ lit("D").as("op"): _*)

      def onTarget(base: DataFrame, actions: Seq[MergeAction], label: String): Seq[DataFrame] =
        actions.zipWithIndex.map {
          case (UpdateAction(_, assigns, _), i) =>
            updateEvents(guarded(base, actions, i),
              assignMap(c.name, assigns, payload, allowKeys = false))
          case (_: UpdateStarAction, i) =>
            val set = payload.map(p => p -> sCol(p).getOrElse(IceliteSql.fail(
              s"UPDATE SET * needs source column $p"))).toMap
            updateEvents(guarded(base, actions, i), set)
          case (_: DeleteAction, i) => deleteEvents(guarded(base, actions, i))
          case (other, _) => IceliteSql.fail(
            s"$label does not support ${other.getClass.getSimpleName}")
        }

      val insertFrames = notMatched.zipWithIndex.map { case (a, i) =>
        val set = a match {
          case InsertAction(_, assigns) =>
            assignMap(c.name, assigns, payload, allowKeys = true)
          case _: InsertStarAction =>
            (ChangeEvent.keyCols ++ payload).flatMap(n => sCol(n).map(n -> _)).toMap
          case other => IceliteSql.fail(
            s"WHEN NOT MATCHED does not support ${other.getClass.getSimpleName}")
        }
        ChangeEvent.keyCols.find(!set.contains(_)).foreach(k =>
          IceliteSql.fail(s"MERGE INSERT must provide key column $k"))
        guarded(joined.filter(!isT && isS), notMatched, i).select(
          ChangeEvent.keyCols.map(k => set(k).cast(types(k)).as(k)) ++
            payload.map(p => set.getOrElse(p, lit(null)).cast(types(p)).as(p)) :+
            lit("I").as("op"): _*)
      }

      val frames =
        onTarget(joined.filter(isT && isS), matched, "WHEN MATCHED") ++
          insertFrames ++
          onTarget(joined.filter(isT && !isS), bySource, "WHEN NOT MATCHED BY SOURCE")
      val events = frames.reduce(_.unionByName(_))
      asRows(commit(engine, events, guardKeyDups = true, "MERGE"))
    } finally joined.unpersist()
  }
}

/** Opaque holder: parser expressions / plans / merge actions ride through
  * analysis untouched. A bare Expression field would be collected by
  * `QueryPlan.expressions` and tripped CheckAnalysis's resolution sweep;
  * wrapping hides it — resolution happens in run(), by name, against the
  * live table frame. */
case class Raw[T](value: T)

/** `ALTER TABLE ice.t ADD COLUMN(S) ...` / `ALTER TABLE ice.t ALTER COLUMN
  * c TYPE <wider>` — the two legal evolutions, routed through the SAME
  * [[graft.engine.SchemaEvolve]] reconciliation the batch path uses: the
  * DDL derives an EMPTY change batch whose payload schema carries exactly
  * the added/widened columns and commits it as a non-batch engine epoch,
  * so the evolved schema rides an ordinary snapshot commit — atomic with
  * the pointer, and every older snapshot keeps its own schema id and still
  * time-travels under it. Everything else (DROP / RENAME / REPLACE /
  * narrowing / nested fields / defaults) stays loudly rejected, exactly as
  * the batch reconciliation would reject it. */
case class IceliteAlterCommand(name: String,
    adds: Raw[Seq[org.apache.spark.sql.catalyst.plans.logical.QualifiedColType]],
    alters: Raw[Seq[org.apache.spark.sql.catalyst.plans.logical.AlterColumnSpec]])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = IceliteDml.runAlter(spark, this)
}

case class IceliteDeleteCommand(name: String, alias: Option[String],
    cond: Raw[Expression]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = IceliteDml.output
  override def run(spark: SparkSession): Seq[Row] = IceliteDml.runDelete(spark, this)
}

case class IceliteUpdateCommand(name: String, alias: Option[String],
    assigns: Raw[Seq[Assignment]], cond: Option[Raw[Expression]])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = IceliteDml.output
  override def run(spark: SparkSession): Seq[Row] = IceliteDml.runUpdate(spark, this)
}

case class IceliteInsertCommand(name: String, cols: Seq[String],
    query: Raw[LogicalPlan], byName: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = IceliteDml.output
  override def run(spark: SparkSession): Seq[Row] = IceliteDml.runInsert(spark, this)
}

/** `DESCRIBE [EXTENDED] ice.<name>`: the read schema annotated with each
  * column's engine role (key / payload / envelope); EXTENDED appends the
  * table facts a lakehouse DESCRIBE shows — location, layout, write mode,
  * snapshot head, retained-chain length, high-watermark LSN — all from
  * driver-side metadata. `output` reuses the parser's own attributes, so
  * the result shape is exactly Spark's DESCRIBE contract. */
case class IceliteDescribeCommand(name: String, isExtended: Boolean,
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val engine = IceliteSql.lookup(spark, name)
      .map(IceliteSql.effective(spark, _))
      .getOrElse(IceliteSql.fail(s"${IceliteSql.Catalog}.$name is no longer registered"))
    val keySet = ChangeEvent.keyCols.toSet
    val cols = engine.currentState().schema.fields.toSeq.map { f =>
      val role =
        if (keySet(f.name)) "key column (MERGE identity)"
        else if (f.name.startsWith("_") || f.name == "content_sha256")
          "engine envelope (read-only)"
        else "payload (per-cell LWW)"
      Row(f.name, f.dataType.simpleString, role)
    }
    if (!isExtended) cols
    else {
      val t = engine.table
      val chain = t.snapshotChain
      cols ++ Seq(
        Row("", "", ""),
        Row("# Detailed Table Information", "", ""),
        Row("Name", s"${IceliteSql.Catalog}.$name", ""),
        Row("Location", t.root.toString, ""),
        Row("Key Columns", t.meta.keyCols.mkString(", "), ""),
        Row("Buckets", t.currentBuckets.toString, ""),
        Row("Write Mode", if (t.meta.mergeOnRead) "merge-on-read" else "copy-on-write", ""),
        Row("Current Snapshot", t.currentSnapshotId.toString, ""),
        Row("Snapshots Retained", chain.size.toString, ""),
        Row("High Watermark LSN", engine.highWatermark(t.currentSnapshotId).toString, ""))
    }
  }
}

case class IceliteMergeCommand(name: String, alias: Option[String],
    source: Raw[LogicalPlan], cond: Raw[Expression],
    matchedActions: Raw[Seq[MergeAction]],
    notMatchedActions: Raw[Seq[MergeAction]],
    notMatchedBySourceActions: Raw[Seq[MergeAction]]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = IceliteDml.output
  override def run(spark: SparkSession): Seq[Row] = IceliteDml.runMerge(spark, this)
}
