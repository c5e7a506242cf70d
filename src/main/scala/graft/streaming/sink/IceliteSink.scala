package graft.streaming.sink

import org.apache.spark.sql.{DataFrame, Dataset, GraftStreamingBridge, Row, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.engine.{CdcEngine, EngineConf}
import graft.icelite.IceliteTable

/** `icelite`: the table as a first-class Structured Streaming SINK — the
  * stock-`writeStream` front door to the engine's MERGE, completing the
  * symmetry with the `icelite-feed` SOURCE (a table is both ends of a
  * pipeline; Delta's `format("delta")` draws the same line):
  *
  * {{{
  *   changeStream.writeStream.format("icelite")
  *     .option("path", tableRoot)
  *     .option("checkpointLocation", ckpt)
  *     .option("keyCols", "repo,path")      // create-if-missing (else optional)
  *     .option("buckets", 64)               // create-time layout
  *     .option("mergeOnRead", true)         // create-time write mode
  *     .option("morCompactThreshold", 8)    // ingest maintenance knobs
  *     .option("morMinorRatio", 0.5)        // size-tiered minor/full folds
  *     .option("zorderCols", "lang,ver")    // declared Z-order at maintenance
  *     .option("tombstonePurgeLagLsn", 100000) // tombstone GC lag
  *     .option("retainSnapshots", 40)
  *     .option("vacuumAfterExpire", true)
  *     .option("statsCols", "lang")         // column-stats file skipping
  *     .start()
  * }}}
  *
  * Exactly-once needs NO sink-side bookkeeping beyond the engine's own:
  * the checkpointed micro-batch id IS the commit epoch, and `applyBatch`
  * is idempotent per epoch (a replayed batch after a crash between sink
  * write and checkpoint advance is skipped by the epoch ledger — the same
  * contract the foreachBatch recipe in [[graft.streaming.CdcStream]]
  * proves, now without the boilerplate). Each batch reloads the table and
  * adopts its current bucket layout, so maintenance (`rebucket`,
  * compaction, expiry — e.g. via `CALL ice.system.*`) can run concurrently
  * with the stream; a CAS conflict on a genuinely racing commit fails the
  * batch and Spark's retry replays it onto the new head.
  *
  * Scale: per-batch work is the engine MERGE's — O(batch + affected
  * buckets), shuffle on the bucketed key, salt-aware — so sustained-ingest
  * behavior (COW vs MOR curves, retention, metadata growth) is exactly
  * BENCH.md's measured engine profile; the sink adds one metadata reload
  * per batch.
  */
class IceliteSinkProvider extends StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "icelite"

  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "icelite sink: physical layout is the table's bucket spec (keyCols/buckets " +
        "at create time, CALL ice.system.rebucket to evolve) — partitionBy is not supported")
    require(outputMode != OutputMode.Complete(),
      "icelite sink: Complete mode would replace the table with each batch's " +
        "aggregate; the sink is a CDC MERGE — use Append or Update")
    new IceliteSink(sqlContext, parameters)
  }
}

class IceliteSink(sqlContext: SQLContext, params: Map[String, String]) extends Sink {
  private val root = params.getOrElse("path",
    throw new IllegalArgumentException("icelite sink requires .option(\"path\", <table root>)"))

  // create-if-missing, but only when the caller declared the key layout —
  // silently inventing keys would bake a wrong MERGE identity into the table
  locally {
    if (!IceliteTable.exists(root)) {
      val keys = params.get("keyCols")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .filter(_.nonEmpty)
        .getOrElse(throw new IllegalArgumentException(
          s"icelite sink: no table at $root — pass .option(\"keyCols\", \"repo,path\") " +
            "(plus optional buckets/mergeOnRead) to create it, or create it up front " +
            "with IceliteTable.create"))
      IceliteTable.create(root, keys,
        buckets = params.get("buckets").map(_.toInt).getOrElse(64),
        mergeOnRead = params.get("mergeOnRead").exists(_.toBoolean))
    }
  }

  private def engineFor(): CdcEngine = {
    val t = IceliteTable.load(root)
    new CdcEngine(sqlContext.sparkSession, t, EngineConf(
      buckets = t.currentBuckets,
      writeSaltPerBucket = params.get("writeSaltPerBucket").map(_.toInt).getOrElse(1),
      morCompactThreshold = params.get("morCompactThreshold").map(_.toInt).getOrElse(0),
      // size-tiered maintenance: fold deltas (minor) while the pile is
      // under ratio x base rows, full-rewrite when it rivals the base
      // (see EngineConf.morMinorRatio)
      morMinorRatio = params.get("morMinorRatio").map(_.toDouble).getOrElse(0.0),
      // declared Z-order (see EngineConf.zorderCols): auto-compaction
      // clusters maintenance output on the Morton key of these columns
      zorderCols = params.get("zorderCols")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil),
      tombstonePurgeLagLsn =
        params.get("tombstonePurgeLagLsn").map(_.toLong).getOrElse(-1L),
      retainSnapshots = params.get("retainSnapshots").map(_.toInt).getOrElse(0),
      vacuumAfterExpire = params.get("vacuumAfterExpire").exists(_.toBoolean),
      // orphan-file grace for those vacuums (EngineConf default: 1 hour —
      // safe, but a sustained-ingest run shorter than the grace reclaims
      // NOTHING and disk grows by the full write volume; set it to a few
      // multiples of the batch write time, same contract as remove_orphan_files)
      vacuumGraceMillis = params.get("vacuumGraceMillis").map(_.toLong)
        .getOrElse(EngineConf().vacuumGraceMillis),
      // comma-separated payload columns to harvest [min,max] bounds for on
      // merged writes (column-stats file skipping; see EngineConf.statsCols)
      statsCols = params.get("statsCols")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil),
      // write-time clustering (see EngineConf.writeSortCols)
      writeSortCols = params.get("writeSortCols")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil),
      writeMaxFileRows = params.get("writeMaxFileRows").map(_.toLong).getOrElse(0L),
      dlqDir = params.getOrElse("dlqDir", "")))
  }

  override def addBatch(batchId: Long, data: Dataset[Row]): Unit = {
    // the frame Spark hands a V1 sink is streaming-tagged; re-wrap it as a
    // batch frame (ForeachBatchSink's trick) so the MERGE can run on it
    val batch: DataFrame = GraftStreamingBridge.asBatchFrame(data.toDF())
    engineFor().applyBatch(batchId, batch)
  }

  override def toString: String = s"IceliteSink[$root]"
}
