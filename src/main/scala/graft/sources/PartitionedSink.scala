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

  /** Per-partition small-file compaction — the maintenance op every
    * incremental pipeline needs: each micro-batch/dynamic-overwrite run
    * leaves `shuffle.partitions`-sized file shards, and at 100 TB the
    * resulting small-files population dominates planning time (file
    * listing, footer reads) and kills scan throughput. `compact` rewrites
    * every leaf partition whose parquet file count exceeds
    * ceil(partitionBytes / targetBytes).
    *
    * Data is byte-preserved (read → coalesce → rewrite, no shuffle: coalesce
    * only narrows). The swap is rename-aside, never delete-first: the old
    * dir is renamed to a hidden trash name, the rewrite renamed into place,
    * then the trash deleted — at every intermediate step BOTH copies exist
    * on the filesystem, so a crash mid-swap loses nothing (worst case the
    * partition is briefly absent and the data sits in the `.compact-trash`/
    * `.compact-tmp` dirs for manual recovery; a failed swap is rolled
    * back). Non-parquet sidecar files in the partition are carried into the
    * rewrite before the swap. Partitions already at their target are left
    * untouched — compaction is idempotent.
    *
    * CONCURRENCY CONTRACT: a plain filesystem has no directory locks, so
    * compaction must not race writers on the SAME partition — a file
    * committed between the read and the swap would be swapped away. Run it
    * on quiesced partitions (the usual cadence: compact yesterday's
    * partitions while today's receive writes), exactly like Hive/Iceberg
    * compaction jobs that take a snapshot or partition lock.
    *
    * Driver iterates partitions (each rewrite is a distributed job); for
    * millions of partitions you'd batch by modification time — the same
    * "yesterday only" cadence keeps the loop small.
    *
    * @return one (partitionDir, filesBefore, filesAfter) per rewritten
    *         partition, filesAfter counted from the filesystem (coalesce
    *         may produce fewer than the target when the reader packs the
    *         small files into fewer input partitions); empty = nothing
    *         needed compaction
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Seq[(String, Int, Int)] = {
    import org.apache.hadoop.fs.Path
    require(targetBytes > 0, "targetBytes must be positive")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def leafDirs(p: Path): Seq[Path] = {
      val children = fs.listStatus(p).filter(s =>
        s.isDirectory && !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_"))
      if (children.isEmpty) Seq(p) else children.toSeq.flatMap(c => leafDirs(c.getPath))
    }
    def parquetFiles(p: Path) = fs.listStatus(p).filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))

    leafDirs(root).flatMap { dir =>
      val files = parquetFiles(dir)
      val totalBytes = files.map(_.getLen).sum
      val targetFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
      if (files.length <= targetFiles) None
      else {
        val tmp = new Path(dir.getParent, "." + dir.getName + ".compact-tmp")
        val trash = new Path(dir.getParent, "." + dir.getName + ".compact-trash")
        for (stale <- Seq(tmp, trash))
          if (fs.exists(stale) && !fs.delete(stale, true))
            throw new java.io.IOException(s"compact: cannot clear stale $stale " +
              "(a previous run may have crashed mid-swap; recover it first)")
        spark.read.parquet(dir.toString)
          .coalesce(targetFiles)
          .write.mode("overwrite").parquet(tmp.toString)
        // carry sidecars (non-parquet files another tool may have left) into
        // the rewrite so the swap preserves them
        fs.listStatus(dir)
          .filter(s => s.isFile && !s.getPath.getName.endsWith(".parquet"))
          .foreach { s =>
            val destination = new Path(tmp, s.getPath.getName)
            if (fs.exists(destination) && !fs.delete(destination, false))
              throw new java.io.IOException(s"compact: cannot replace $destination")
            if (!fs.rename(s.getPath, destination))
              throw new java.io.IOException(
                s"compact: cannot carry sidecar ${s.getPath} into $tmp")
          }
        // rename-aside swap; every FS boolean checked (a false return here
        // means the partition would silently vanish or double)
        if (!fs.rename(dir, trash))
          throw new java.io.IOException(s"compact: rename $dir -> $trash failed")
        if (!fs.rename(tmp, dir)) {
          val rolledBack = fs.rename(trash, dir)
          throw new java.io.IOException(s"compact: rename $tmp -> $dir failed" +
            (if (rolledBack) " (original partition restored)"
             else s" AND rollback failed — data is in $trash"))
        }
        if (!fs.delete(trash, true))
          throw new java.io.IOException(
            s"compact: swap done but cannot remove $trash (delete it manually)")
        Some((dir.toString, files.length, parquetFiles(dir).length))
      }
    }
  }
}
