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
  * Index layout: an append-only log of parquet dirs plus one commit-marker
  * FILE per delta,
  * {{{
  *   index/base/                      // bootstrap corpus signatures
  *   index/delta-00000000/            // batch 0's new-member signatures
  *   index/delta-00000000.committed   // batch 0's commit marker
  * }}}
  * Readers list MARKERS, never raw dirs, so partially-written data from a
  * crashed attempt is invisible by construction. The marker is one small
  * FILE published atomically ([[graft.sources.CommitProtocol]] — which is
  * also why the marker, not the data dir, is the commit: a directory has
  * no atomic-publish equivalent on object stores). foreachBatch is
  * at-least-once; a replayed batch finds its marker and skips, so the
  * index grows EXACTLY-ONCE across restarts. A replayed batch whose
  * marker is absent deletes the stale dir and rewrites it before
  * committing. Matches commit the same way, BEFORE the index delta: a
  * crash between the two re-runs the batch against the identical
  * pre-batch index (deterministic pipeline → same matches, skipped via
  * their marker) and then commits the delta — converging to the no-crash
  * state.
  *
  * RESTART CONTRACT: markers are keyed (txnAppId, batchId) — the same
  * keying Delta's idempotent `txnAppId`/`txnVersion` sinks use. batchId is
  * stable only for the SAME checkpoint, so restart with the original
  * checkpointDir and the guarantee is unconditional. Every DISTINCT stream
  * feeding one index must pass its own `txnAppId`, or its batch 0 aliases
  * an earlier stream's batch 0 marker and is silently skipped. Starting
  * over with a FRESH checkpoint under the same txnAppId is safe only if
  * the source re-delivers identical batch boundaries; a source that
  * re-batches differently would alias a processed batchId and skip unseen
  * documents.
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
  * grows by one small dir per batch; [[compactIndex]] folds the log back
  * into a single generation-numbered base under the same marker protocol
  * (stream stopped, single-writer — the same maintenance cadence as
  * [[graft.sources.PartitionedSink.compact]]).
  */
object StreamingDedup {

  // optional [appId-] segment: markers are keyed (txnAppId, batchId) like
  // Delta's idempotent txn sinks, so two DIFFERENT streams feeding one
  // index (each with its own checkpoint, each starting at batchId 0) can
  // never alias each other's commits
  private val DeltaMarkerRe = "(delta-(?:[A-Za-z0-9_]+-)?\\d{8,})\\.committed".r
  private val MatchesMarkerRe = "(matches-(?:[A-Za-z0-9_]+-)?\\d{8,})\\.committed".r
  private val BaseMarkerRe = "base-(\\d{8,})\\.committed".r

  private def validateAppId(txnAppId: String): Unit =
    require(txnAppId.isEmpty || txnAppId.matches("[A-Za-z0-9_]+"),
      s"txnAppId must match [A-Za-z0-9_]+ (marker-name safety), got '$txnAppId'")

  private def keyedName(prefix: String, txnAppId: String, batchId: Long): String =
    if (txnAppId.isEmpty) f"$prefix-$batchId%08d"
    else f"$prefix-$txnAppId-$batchId%08d"

  // the ONE grammar for keyed dir names — builder (keyedName) and parser
  // share it, so a format change cannot silently desynchronize the two
  private val KeyedNameRe = "(?:delta|matches)-(?:([A-Za-z0-9_]+)-)?(\\d{8,})".r

  /** Batch id of a (possibly app-qualified) delta/matches dir name. */
  private def batchIdOf(name: String): Long = name match {
    case KeyedNameRe(_, batch) => batch.toLong
    case _ => throw new IllegalArgumentException(s"not a keyed dir name: $name")
  }

  /** App id of a delta/matches dir name ("" for the unqualified form). */
  private def appIdOf(name: String): String = name match {
    case KeyedNameRe(app, _) => Option(app).getOrElse("")
    case _ => throw new IllegalArgumentException(s"not a keyed dir name: $name")
  }

  /** Materialize the bootstrap corpus index at `indexDir/base`.
    * `numHashes` MUST equal the `bands * rowsPerBand` later passed to
    * [[runAvailableNow]] (default 12 = 4·3 there); the run validates this
    * against the stored signatures and fails fast on mismatch.
    */
  def bootstrapIndex(spark: SparkSession, corpus: DataFrame, indexDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      numHashes: Int = 12): Unit =
    Dedup.signatureIndex(corpus, idCol, textCol, numHashes)
      .write.parquet(new Path(indexDir, "base").toString)

  private def committedDirs(fs: FileSystem, dir: Path, re: scala.util.matching.Regex): Seq[Path] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.flatMap(s => s.getPath.getName match {
      case re(d) if s.isFile => Some(new Path(dir, d))
      case _ => None
    }).sortBy(_.getName)

  /** Resolve the current base generation and the set of dir names it
    * superseded: the highest committed `base-<gen>` marker wins (its content
    * lists every dir folded into it — the previous base and the folded
    * deltas); no marker means the bootstrap `base` (generation 0, committed
    * by existence, supersedes nothing).
    */
  private def resolveBase(fs: FileSystem, root: Path): (Path, Set[String]) = {
    val gens =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq.flatMap(s => s.getPath.getName match {
        case BaseMarkerRe(g) if s.isFile => Some(g.toLong)
        case _ => None
      })
    if (gens.isEmpty) (new Path(root, "base"), Set.empty)
    else {
      val gen = gens.max
      val text = graft.sources.CommitProtocol.readFully(fs,
        new Path(root, f"base-$gen%08d.committed"))
      (new Path(root, f"base-$gen%08d"),
        text.split('\n').map(_.trim).filter(_.nonEmpty).toSet)
    }
  }

  /** The committed index: the current base generation + every delta whose
    * commit marker exists and that the base has NOT folded in (a compaction
    * that crashed between marker publish and sweep leaves folded deltas on
    * disk — the superseded list in the base marker keeps them invisible, so
    * the index never double-counts). Listing is marker-driven —
    * uncommitted or partially-written dirs are never read (a glob over the
    * dir would read them: Spark's hidden-file filter applies to files UNDER
    * each input path, not to glob-matched directories themselves).
    */
  def currentIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (base, superseded) = resolveBase(fs, root)
    val paths = base +:
      committedDirs(fs, root, DeltaMarkerRe).filterNot(p => superseded.contains(p.getName))
    spark.read.parquet(paths.map(_.toString): _*)
  }

  /** Fold the current base + committed deltas into a single new
    * generation-numbered base, under the SAME atomic-publish protocol as
    * every commit here: write `base-<gen+1>/`, publish
    * `base-<gen+1>.committed` (content = CUMULATIVE superseded dir names —
    * this generation's folds plus every earlier generation's) via
    * single-file rename — THE commit point. Superseded DATA dirs are swept
    * DEFERRED: each compaction's start-of-call sweep reclaims the dirs the
    * PREVIOUS generation superseded, so an in-flight reader of the old
    * generation gets a full compaction interval to finish (new readers
    * never see superseded dirs — the marker list hides them immediately).
    * A crash before the publish leaves the old index fully current (the
    * new dir is invisible garbage the next compaction clears); a crash
    * after it changes nothing — the sweep was deferred anyway.
    *
    * Folded deltas' commit markers are KEPT as tombstones (empty files,
    * one per historical batch): a batch whose delta was committed and then
    * folded — but whose Spark offset-log entry never landed (the crash
    * window between the two) — is REPLAYED on restart, and only its
    * marker's existence stops it from re-appending its signatures on top
    * of the compacted base. The cumulative superseded list is what keeps
    * those tombstoned names invisible to readers across generations.
    *
    * Single-writer maintenance op: run with the stream STOPPED (like every
    * table format's compaction).
    *
    * @return the new base dir name, or None if there was nothing to fold
    *         (leftover garbage from a crashed prior compaction is still
    *         swept)
    */
  def compactIndex(spark: SparkSession, indexDir: String): Option[String] = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (base, superseded) = resolveBase(fs, root)
    require(fs.exists(base), s"compactIndex: no committed base at $base")
    // sweep leftovers of a crashed prior compaction first — their data is
    // already folded into the current base
    sweepSupersededData(fs, root, superseded)
    val live = committedDirs(fs, root, DeltaMarkerRe)
      .filterNot(p => superseded.contains(p.getName))
    if (live.isEmpty) return None
    val gen =
      if (base.getName == "base") 0L else base.getName.stripPrefix("base-").toLong
    val newBase = new Path(root, f"base-${gen + 1}%08d")
    if (fs.exists(newBase) && !fs.delete(newBase, true))
      throw new java.io.IOException(s"compactIndex: cannot clear stale attempt $newBase")
    spark.read.parquet((base +: live).map(_.toString): _*)
      .write.parquet(newBase.toString)
    // cumulative: prior generations' folds stay superseded forever (their
    // tombstone markers remain listable), plus the old base and this fold
    val newSuperseded = (superseded ++ (base.getName +: live.map(_.getName))).toSeq.sorted
    val marker = new Path(root, newBase.getName + ".committed")
    if (!graft.sources.CommitProtocol.publishFile(fs, marker,
        newSuperseded.mkString("", "\n", "\n").getBytes("UTF-8")))
      throw new java.io.IOException(
        s"compactIndex: $marker already exists — concurrent compaction? " +
          "compactIndex is a single-writer op")
    // DEFERRED sweep: the dirs this generation superseded stay on disk until
    // the NEXT compaction's start-of-call sweep. A reader that resolved the
    // previous generation just before the marker published can still finish
    // its scan — the same reader-retention concern vacuum's minAgeMs
    // addresses, solved here by giving readers one full compaction interval
    // (superseded dirs are invisible to every NEW resolveBase immediately).
    // the old base's marker is NOT a replay tombstone (no batch is keyed by
    // it) — drop it so resolveBase never sees two generations claiming
    // different superseded sets
    val oldBaseMarker = new Path(root, base.getName + ".committed")
    if (fs.exists(oldBaseMarker) && !fs.delete(oldBaseMarker, false))
      throw new java.io.IOException(s"compactIndex: cannot delete $oldBaseMarker")
    Some(newBase.getName)
  }

  /** Remove folded deltas' replay tombstones for batch ids `<= upToBatchId`.
    *
    * Tombstones accumulate one empty file per historical batch — bounded
    * but real listing cost at long horizons (a year of minute-batches is
    * ~500k files). A tombstone is only needed while its batch can still
    * REPLAY, i.e. while the stream's checkpoint might not have committed
    * it: once the caller knows the checkpoint's offset log has committed
    * past `upToBatchId` (the contract this op's caller asserts — same
    * trust model as every checkpoint-retention knob), those batches can
    * never re-run under the original checkpoint and their tombstones are
    * dead weight. Only markers the current base has FOLDED are touched;
    * live deltas' markers are load-bearing commits, never pruned. The
    * base marker's superseded list keeps the pruned names — a list entry
    * with no marker behind it is harmless to readers and to later sweeps.
    *
    * @return the pruned marker names
    */
  def pruneTombstones(spark: SparkSession, indexDir: String,
      upToBatchId: Long, txnAppId: String = ""): Seq[String] = {
    validateAppId(txnAppId)
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, superseded) = resolveBase(fs, root)
    if (!fs.exists(root)) return Seq.empty
    // the horizon is PER STREAM (per checkpoint): only the named app's
    // folded markers are compared against it — another stream's batch 0
    // may still be replayable even when this stream is far past 0
    fs.listStatus(root).toSeq.flatMap(s => s.getPath.getName match {
      case DeltaMarkerRe(d) if s.isFile && superseded.contains(d) &&
          appIdOf(d) == txnAppId && batchIdOf(d) <= upToBatchId =>
        if (!fs.delete(s.getPath, false))
          throw new java.io.IOException(s"pruneTombstones: cannot delete ${s.getPath}")
        Some(s.getPath.getName)
      case _ => None
    })
  }

  /** Delete superseded DATA dirs only — folded deltas' marker files stay
    * behind as replay tombstones. Idempotent — missing paths are fine.
    */
  private def sweepSupersededData(fs: FileSystem, root: Path, superseded: Set[String]): Unit =
    superseded.foreach { name =>
      val dir = new Path(root, name)
      if (fs.exists(dir) && !fs.delete(dir, true))
        throw new java.io.IOException(s"compactIndex sweep: cannot delete $dir")
    }

  /** Idempotent commit of `df` at `dest` with marker `dest.committed`:
    * marker present → SKIP (keep the committed data); marker absent → any
    * stale dir is a crashed attempt, deleted and rewritten, then the
    * marker is created via single-file rename.
    */
  private def commitDir(df: DataFrame, dest: Path, fs: FileSystem): Unit = {
    val marker = new Path(dest.getParent, dest.getName + ".committed")
    if (fs.exists(marker)) return
    if (fs.exists(dest) && !fs.delete(dest, true))
      throw new java.io.IOException(s"StreamingDedup: cannot clear stale attempt $dest")
    df.write.parquet(dest.toString)
    // a lost publish race (false) means another writer committed this very
    // batch — single-writer contract bent, but their data is equivalent
    // (same deterministic pipeline), so skipping is correct either way
    graft.sources.CommitProtocol.publishFile(fs, marker, Array.emptyByteArray)
    ()
  }

  /** Run the ingest stream to completion (AvailableNow) and return the
    * accumulated matches `(new_id, corpus_id, jaccard_est, batch_id)` —
    * empty (correct schema) if the stream delivered nothing. `corpus_id`
    * is an index member, or — for within-batch exact duplicates — the
    * batch's min-id representative (jaccard_est 1.0). Restart-safe: re-run
    * with the same checkpoint (or replay the source wholesale with a fresh
    * one) and committed batches are skipped via their markers.
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
      maxBucketSize: Int = 1000,
      txnAppId: String = ""
  ): DataFrame = {
    // markers are keyed (txnAppId, batchId): batchId alone is stable only
    // within ONE checkpoint, so every DISTINCT stream feeding this index
    // must pass its own txnAppId — otherwise its batch 0 aliases an earlier
    // stream's batch 0 marker and is silently skipped (the same contract as
    // Delta's txnAppId/txnVersion idempotent writes)
    validateAppId(txnAppId)
    val indexRoot = new Path(indexDir)
    val fs = indexRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(resolveBase(fs, indexRoot)._1))
      throw new IllegalStateException(
        s"StreamingDedup: no bootstrap index at $indexDir — call bootstrapIndex first")
    // fail fast on a signature-length mismatch ANYWHERE in the index: a
    // single sampled row would pass on a MIXED index (base built with one
    // numHashes, a later delta with another) and then silently drop bands
    // for the mismatched subset. Audit the DISTINCT lengths instead — a
    // map-side-combined agg over the signature column only, and limit(3)
    // bounds the driver collect even on a pathological index.
    val sigLens = currentIndex(spark, indexDir)
      .select(size(col("__sig")).alias("n")).filter(col("n").isNotNull)
      .distinct().limit(3).collect().map(_.getInt(0)).toSeq.sorted
    require(sigLens.isEmpty || sigLens == Seq(bands * rowsPerBand),
      s"StreamingDedup: index signature lengths $sigLens != expected " +
        s"bands*rowsPerBand = ${bands * rowsPerBand}; rebuild the index with " +
        s"bootstrapIndex(..., numHashes = ${bands * rowsPerBand})")
    val query = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val deltaMarker = new Path(indexRoot,
          keyedName("delta", txnAppId, batchId) + ".committed")
        if (!fs.exists(deltaMarker)) { // exactly-once: marker absent → process
          val rows = batch.select(col(idCol), col(textCol)).localCheckpoint(true)
          // within-batch exact dedup: min-id representative per canonical
          // text. Null canonical text (fetch failures) gets NO grouping —
          // the window would otherwise collapse all null-text docs into
          // "duplicates" of one arbitrary unrelated doc; each stays its own
          // representative (and, having no shingles, never index-matches)
          val fp = md5(Dedup.canonical(col(textCol)))
          val withRep = rows
            .withColumn("__fp", fp)
            .withColumn("__rep",
              when(col("__fp").isNull, col(idCol))
                .otherwise(min(col(idCol)).over(Window.partitionBy(col("__fp")))))
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
          // matches BEFORE the delta: the delta marker is the batch's commit,
          // so a crash between the two replays into a skip + delta commit
          commitDir(matches, new Path(matchesDir, keyedName("matches", txnAppId, batchId)), fs)
          val newMembers = reps.join(
            idxMatches.select(col("new_id").alias(idCol)).distinct(),
            Seq(idCol), "left_anti")
          commitDir(Dedup.signatureIndex(newMembers, idCol, textCol, bands * rowsPerBand),
            new Path(indexRoot, keyedName("delta", txnAppId, batchId)), fs)
        }
        ()
      }
      .start()
    query.awaitTermination()
    // THIS app's matches only: several txnAppIds may share one matchesDir
    // (they already share the index), and batch_id alone collides across
    // apps — returning another stream's rows would double-process them
    val matchDirs = committedDirs(fs, new Path(matchesDir), MatchesMarkerRe)
      .filter(p => appIdOf(p.getName) == txnAppId)
    if (matchDirs.nonEmpty) spark.read.parquet(matchDirs.map(_.toString): _*)
    else {
      val idType = stream.schema(idCol).dataType
      spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("new_id", idType),
          org.apache.spark.sql.types.StructField("corpus_id", idType),
          org.apache.spark.sql.types.StructField("jaccard_est",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("batch_id",
            org.apache.spark.sql.types.LongType))))
    }
  }
}
