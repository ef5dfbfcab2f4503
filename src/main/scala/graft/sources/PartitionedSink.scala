package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-layout sinks — how S9's truncate-and-load generalizes at
  * warehouse scale: instead of replacing a whole table per run, lay the
  * table out by a partition column (almost always the event/load date) and
  * replace ONLY the partitions the incoming batch touches (dynamic
  * partition overwrite). Readers get partition pruning for free: a
  * `WHERE dt = ...` query plans a scan of one directory, not the table.
  *
  * At 100 TB this layout is the difference between an incremental load
  * rewriting gigabytes (the touched days) and rewriting the world; combined
  * with the watermark read (S4) it also makes `MAX(ts)` a last-partition
  * scan instead of a full pass.
  */
object PartitionedSink {

  /** Write `df` partitioned by `partitionCols` under `path`, replacing only
    * the partitions present in `df` (dynamic overwrite), leaving all other
    * partitions untouched.
    */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    // WRITER-level option, not a session-conf mutation: setting the session
    // conf and restoring it in finally races with concurrent writers on the
    // same session — a write that starts in the restored window runs in
    // STATIC mode and deletes every partition the batch didn't touch.
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Derive a `dt` (date string) partition column from a timestamp column —
    * the standard daily layout.
    */
  def withDt(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))

  /** Read back with partition pruning: filters on the partition column prune
    * directories at planning time (visible as PartitionFilters in explain).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
