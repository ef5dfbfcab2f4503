package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Upsert

/** Incremental / streaming load (SURVEY §2.11).
  *
  * The reference's incremental contract decomposes into exactly the
  * Structured Streaming concepts:
  *   - offset/checkpoint   = `last_sort_value` carried page to page
  *     (`ct_utils.py:232-249`) / durable resume = MAX(ts) on the target
  *   - watermark/lateness  = re-read overlap of n seconds (`ct_utils.py:24-29`)
  *   - effectively-once    = at-least-once re-read + PK-idempotent MERGE
  *     (`utils.py:265`) ⇒ dropDuplicates within the watermark + idempotent
  *     upsert per micro-batch
  *
  * Batch (`Trigger.AvailableNow`-shaped) and true streaming share the same
  * sink: `mergeBatch` is called per micro-batch via `foreachBatch`, so restart
  * + replay converges to the same target (idempotence by PK).
  */
object IncrementalLoad {

  /** One incremental batch applied idempotently: dedup the batch by PK
    * keeping the freshest row (at-least-once sources re-deliver the overlap
    * window), then MERGE into the target state. Uses the AGGREGATE
    * latest-per-key: map-side partials, and — unlike the window form — a
    * DETERMINISTIC pick when two rows share (pk, ts) (struct comparison
    * falls through to the payload), so replaying the same stream always
    * converges to the same target.
    */
  def mergeBatch(target: DataFrame, batch: DataFrame, pkCols: Seq[String], tsCol: String): DataFrame = {
    val freshest = graft.operators.AlertGate.latestPerKeyAgg(batch, pkCols, tsCol)
    Upsert.merge(target, freshest, pkCols)
  }

  /** Watermarked tumbling-window aggregation over an event stream (the
    * built-in streaming shape the reference never had; exercised on the
    * `events` fixture). Works identically on batch frames.
    */
  def windowedCounts(events: DataFrame, tsCol: String, windowLength: String,
      lateness: String = "10 minutes", keyCols: Seq[String] = Nil,
      valueCol: String = "value"): DataFrame = {
    val base = if (events.isStreaming) events.withWatermark(tsCol, lateness) else events
    val keys: Seq[Column] = window(col(tsCol), windowLength) +: keyCols.map(c => col(s"`$c`"))
    val outCols: Seq[Column] = col("window.start").alias("window_start") +:
      (keyCols.map(c => col(s"`$c`")) :+ col("n") :+ col("sum_value"))
    base
      .groupBy(keys: _*)
      .agg(count(lit(1)).alias("n"), sum(col(s"`$valueCol`")).alias("sum_value"))
      .select(outCols: _*)
  }

  /** Run a streaming frame to completion against an idempotent merge sink
    * (AvailableNow) and return the final target state.
    *
    * Restart contract: the merged target is persisted DURABLY under the
    * checkpoint dir after every micro-batch. Structured Streaming skips
    * batches already committed in `checkpointDir` on restart — if the
    * target lived only in memory (or in `initialTarget`), those skipped
    * batches' rows would silently vanish. On start, a durable target from a
    * previous run of the same checkpoint wins over `initialTarget`, so
    * restart + replay converges regardless of where the previous run died.
    */
  def runAvailableNow(
      spark: SparkSession,
      stream: DataFrame,
      initialTarget: DataFrame,
      pkCols: Seq[String],
      tsCol: String,
      checkpointDir: String
  ): DataFrame = {
    val targetPath = checkpointDir.stripSuffix("/") + "/__graft_target"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(targetPath), spark.sparkContext.hadoopConfiguration)
    var state =
      if (fs.exists(new org.apache.hadoop.fs.Path(targetPath)))
        spark.read.parquet(targetPath)
      else initialTarget
    val query = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val merged = mergeBatch(state, batch, pkCols, tsCol).localCheckpoint(true)
        // durable BEFORE the batch commits to the checkpoint: a crash
        // between write and commit only re-merges the batch (idempotent)
        val tmp = targetPath + "__tmp"
        merged.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
        val dst = new org.apache.hadoop.fs.Path(targetPath)
        if (!fs.delete(dst, true) && fs.exists(dst))
          throw new java.io.IOException(s"could not replace $targetPath")
        if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst))
          throw new java.io.IOException(s"rename $tmp -> $targetPath failed")
        state = merged
        ()
      }
      .start()
    query.awaitTermination()
    state
  }
}
