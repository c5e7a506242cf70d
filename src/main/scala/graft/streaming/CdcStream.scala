package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.engine.CdcEngine
import graft.model.ChangeEvent

/** Structured Streaming front-end: tail a directory of change-event files
  * (the sandbox's stand-in for a binlog/WAL/Kafka topic) and apply each
  * micro-batch through the engine's MERGE.
  *
  * Exactly-once composition: Spark's streaming checkpoint gives
  * monotonically increasing, replay-stable `batchId`s; `applyBatch` commits
  * are idempotent per epoch — so a batch re-delivered after a crash between
  * sink-commit and offset-commit is a no-op. This is the standard
  * foreachBatch + idempotent-sink exactly-once recipe.
  *
  * The reference's analog is its snapshot-folder replay loop
  * (/root/reference/etl/fact_changed.py:851-875); here the "folder" is a
  * file-source offset range and the state lives in the icelite table, so no
  * streaming state store or watermark is needed (SURVEY.md §2.9).
  */
object CdcStream {

  /** Run until no more input files (Trigger.AvailableNow), then return.
    *
    * `mirror`: optional downstream FeedConsumer synced INSIDE each
    * micro-batch, chaining the full CDC pipeline — binlog tail -> MERGE ->
    * snapshot commit -> logical change feed -> replicated table — per
    * trigger. Exactly-once composes transitively: the sink epoch is the
    * streaming batchId and the mirror epoch is the source snapshot id,
    * both idempotent, so a crash anywhere in the chain replays as no-ops. */
  def runAvailableNow(
      spark: SparkSession,
      engine: CdcEngine,
      inputDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 0,
      mirror: Option[graft.engine.FeedConsumer] = None,
      // Some(name): every micro-batch lands on that BRANCH instead of main
      // (a streaming quarantine lane — tail a suspect source in isolation,
      // audit the lane, publish with one fast-forward; main and any mirror
      // see nothing until then). The streaming batchId stays the epoch, so
      // checkpoint-resume replays are per-ref no-ops as on main.
      branch: Option[String] = None): Unit = {
    var reader = spark.readStream.schema(ChangeEvent.schema)
    if (maxFilesPerTrigger > 0)
      reader = reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    val stream = reader.parquet(inputDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        branch match {
          case Some(n) => engine.applyBatchToBranch(batchId, df, n)
          case None => engine.applyBatch(batchId, df)
        }
        mirror.foreach(_.sync()): Unit
      }
      .start()
    q.awaitTermination()
  }
}
