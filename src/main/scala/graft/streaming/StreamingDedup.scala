package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Dedup

/** Streaming incremental dedup — the continuous-ingest loop end to end:
  * each micro-batch of new documents is matched against a DURABLE MinHash
  * signature index ([[Dedup.signatureIndex]] / [[Dedup
  * .incrementalNearDuplicates]]); documents that match nothing become new
  * corpus members and their signatures are appended to the index, which
  * then serves every later batch. Corpus text is never re-read — the index
  * is ~100 bytes/document regardless of document size.
  *
  * Index layout: an append-only log of parquet dirs,
  * {{{
  *   index/base/              // bootstrap corpus signatures
  *   index/delta-00000000/    // batch 0's new-member signatures
  *   index/delta-00000001/    // ...
  * }}}
  * The atomic rename that creates `delta-<batchId>` IS the batch's commit
  * marker (same primitive as [[graft.sources.SnapshotManifest]]: rename to
  * a new name — atomic on HDFS-like filesystems, PUT-if-absent on object
  * stores). Structured Streaming's foreachBatch is at-least-once; a
  * replayed batch finds its marker and skips, so the index grows
  * EXACTLY-ONCE across restarts. Matches are committed the same way,
  * BEFORE the index delta: a crash between the two re-runs the batch
  * against the identical pre-batch index (deterministic pipeline → same
  * matches, skipped on rename) and then commits the delta — converging to
  * the no-crash state.
  *
  * Within a batch, exact duplicates (canonical text) collapse to the
  * min-id representative before the index probe; near-duplicates arriving
  * in the SAME batch are admitted as separate members (the standard batch-
  * boundary granularity — a batch is one crawl slice, small next to the
  * corpus).
  *
  * 100 TB shape: per batch, one index scan (columnar, signatures only) +
  * the banded equi-join of [[Dedup.incrementalNearDuplicates]] — linear in
  * the batch, never all-pairs against the corpus. The delta population
  * grows by one small dir per batch; compact them periodically (stream
  * stopped, single-writer: union the log into a fresh `base` — the same
  * maintenance cadence as [[graft.sources.PartitionedSink.compact]]).
  */
object StreamingDedup {

  /** Materialize the bootstrap corpus index at `indexDir/base`. */
  def bootstrapIndex(spark: SparkSession, corpus: DataFrame, indexDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      numHashes: Int = 12): Unit =
    Dedup.signatureIndex(corpus, idCol, textCol, numHashes)
      .write.parquet(new Path(indexDir, "base").toString)

  /** The committed index: base + every committed delta (uncommitted work is
    * invisible — tmp dirs are dot-prefixed, which Spark's file listing
    * skips).
    */
  def currentIndex(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"${indexDir.stripSuffix("/")}/*")

  /** Idempotent commit of `df` at `dest`: write to a dot-prefixed tmp dir,
    * rename to the final name. An existing `dest` (this batch already
    * committed, or a replay raced us) is a SKIP, not an error.
    */
  private def commitDir(df: DataFrame, dest: Path, fs: FileSystem): Unit = {
    if (fs.exists(dest)) return
    val tmp = new Path(dest.getParent, "." + dest.getName + ".tmp")
    if (fs.exists(tmp) && !fs.delete(tmp, true))
      throw new java.io.IOException(s"StreamingDedup: cannot clear stale $tmp")
    df.write.parquet(tmp.toString)
    if (!fs.rename(tmp, dest) && !fs.exists(dest))
      throw new java.io.IOException(s"StreamingDedup: commit rename $tmp -> $dest failed")
  }

  /** Run the ingest stream to completion (AvailableNow) and return the
    * accumulated matches `(new_id, corpus_id, jaccard_est, batch_id)`.
    * `corpus_id` is an index member, or — for within-batch exact
    * duplicates — the batch's min-id representative (jaccard_est 1.0).
    * Restart-safe: re-run with the same checkpoint (or replay the source
    * wholesale with a fresh one) and committed batches are skipped via
    * their delta markers.
    */
  def runAvailableNow(
      spark: SparkSession,
      stream: DataFrame,
      indexDir: String,
      matchesDir: String,
      checkpointDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.7,
      bands: Int = 4,
      rowsPerBand: Int = 3,
      maxBucketSize: Int = 1000
  ): DataFrame = {
    val fs = new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(indexDir, "base")))
      throw new IllegalStateException(
        s"StreamingDedup: no bootstrap index at $indexDir/base — call bootstrapIndex first")
    val query = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val deltaDest = new Path(indexDir, f"delta-$batchId%08d")
        if (!fs.exists(deltaDest)) { // exactly-once: marker absent → process
          val rows = batch.select(col(idCol), col(textCol)).localCheckpoint(true)
          // within-batch exact dedup: min-id representative per canonical text
          val withRep = rows
            .withColumn("__fp", md5(Dedup.canonical(col(textCol))))
            .withColumn("__rep", min(col(idCol)).over(Window.partitionBy(col("__fp"))))
          val reps = withRep.filter(col(idCol) === col("__rep"))
            .select(col(idCol), col(textCol))
          val innerMatches = withRep.filter(col(idCol) =!= col("__rep"))
            .select(col(idCol).alias("new_id"), col("__rep").alias("corpus_id"),
              lit(1.0).alias("jaccard_est"))
          // representatives vs the committed index (base + earlier deltas)
          val index = currentIndex(spark, indexDir)
          val idxMatches = Dedup.incrementalNearDuplicates(reps, index, idCol, textCol,
            threshold, bands, rowsPerBand, maxBucketSize).localCheckpoint(true)
          val matches = idxMatches.unionByName(innerMatches)
            .withColumn("batch_id", lit(batchId))
          // matches BEFORE the delta: the delta rename is the commit marker,
          // so a crash between the two replays into a skip + delta commit
          commitDir(matches, new Path(matchesDir, f"matches-$batchId%08d"), fs)
          val newMembers = reps.join(
            idxMatches.select(col("new_id").alias(idCol)).distinct(),
            Seq(idCol), "left_anti")
          commitDir(Dedup.signatureIndex(newMembers, idCol, textCol, bands * rowsPerBand),
            deltaDest, fs)
        }
        ()
      }
      .start()
    query.awaitTermination()
    spark.read.parquet(s"${matchesDir.stripSuffix("/")}/*")
  }
}
