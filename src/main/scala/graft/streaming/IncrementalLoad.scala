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
    * window), then MERGE into the target state.
    */
  def mergeBatch(target: DataFrame, batch: DataFrame, pkCols: Seq[String], tsCol: String): DataFrame = {
    val freshest = graft.operators.AlertGate.latestPerKey(batch, pkCols, tsCol)
    Upsert.merge(target, freshest, pkCols)
  }

  /** Watermarked tumbling-window aggregation over an event stream (the
    * built-in streaming shape the reference never had; exercised on the
    * `events` fixture). Works identically on batch frames.
    */
  def windowedCounts(events: DataFrame, tsCol: String, windowLength: String,
      lateness: String = "10 minutes", keyCols: Seq[String] = Nil): DataFrame = {
    val base = if (events.isStreaming) events.withWatermark(tsCol, lateness) else events
    val keys: Seq[Column] = window(col(tsCol), windowLength) +: keyCols.map(c => col(s"`$c`"))
    val outCols: Seq[Column] = col("window.start").alias("window_start") +:
      (keyCols.map(c => col(s"`$c`")) :+ col("n") :+ col("sum_value"))
    base
      .groupBy(keys: _*)
      .agg(count(lit(1)).alias("n"), sum(col("value")).alias("sum_value"))
      .select(outCols: _*)
  }

  /** Run a streaming frame to completion against an idempotent merge sink
    * (AvailableNow) and return the final target state. State is held in a
    * driver-managed var only for the local harness; a cluster deployment
    * writes each micro-batch to the durable target (Delta/parquet swap).
    */
  def runAvailableNow(
      spark: SparkSession,
      stream: DataFrame,
      initialTarget: DataFrame,
      pkCols: Seq[String],
      tsCol: String,
      checkpointDir: String
  ): DataFrame = {
    var state = initialTarget
    val query = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        state = mergeBatch(state, batch, pkCols, tsCol).localCheckpoint(true)
        ()
      }
      .start()
    query.awaitTermination()
    state
  }
}
