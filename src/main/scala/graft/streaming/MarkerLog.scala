package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.CommitProtocol

/** Marker-committed base+delta log: the ONE directory layout and commit
  * protocol shared by every streaming-maintained store here
  * ([[StreamingDedup]]'s signature index, [[StreamingAnnIngest]]'s IVF
  * postings). Extracted so the race/crash/replay reasoning — audited over
  * many specs against StreamingDedup — is written exactly once.
  *
  * Layout under a root dir:
  *   - `base/` — the bootstrap generation (committed by existence)
  *   - `<prefix>-[app-]<batchId>/` + `<same>.committed` — one delta per
  *     stream micro-batch; the empty marker FILE (atomic single-file
  *     rename, [[CommitProtocol.publishFile]]) is the commit point
  *   - `base-<gen>/` + `base-<gen>.committed` — compacted generations; the
  *     marker's CONTENT lists every dir name the generation folded
  *     (cumulatively), which keeps folded-but-unswept dirs invisible
  *
  * Replay contract (the reason markers outlive their data as tombstones):
  * a stream batch whose delta was committed and folded — but whose Spark
  * offset-log entry never landed — re-runs on restart, and only its
  * marker's existence stops it from re-appending on top of the compacted
  * base. Markers are keyed (txnAppId, batchId) like Delta's idempotent txn
  * sinks, so two DIFFERENT streams feeding one store (each with its own
  * checkpoint, each starting at batchId 0) can never alias each other's
  * commits.
  */
private[graft] object MarkerLog {

  def validateAppId(txnAppId: String): Unit =
    require(txnAppId.isEmpty || txnAppId.matches("[A-Za-z0-9_]+"),
      s"txnAppId must match [A-Za-z0-9_]+ (marker-name safety), got '$txnAppId'")

  // KeyedNameRe parses keyed dir names back with a dash-free alphabetic
  // prefix; a prefix like "my-delta" or "delta2" would build (keyedName)
  // and list (markerRe) fine but mis-parse in batchIdOf/appIdOf — enforce
  // the grammar at both entry points so builder and parser cannot drift
  private def validatePrefix(prefix: String): Unit =
    require(prefix.matches("[A-Za-z]+"),
      s"delta prefix must match [A-Za-z]+ (keyed-name grammar), got '$prefix'")

  def keyedName(prefix: String, txnAppId: String, batchId: Long): String = {
    validatePrefix(prefix)
    if (txnAppId.isEmpty) f"$prefix-$batchId%08d"
    else f"$prefix-$txnAppId-$batchId%08d"
  }

  /** Marker regex for `prefix`-keyed delta dirs (captures the dir name). */
  def markerRe(prefix: String): scala.util.matching.Regex = {
    validatePrefix(prefix)
    ("(" + java.util.regex.Pattern.quote(prefix) +
      "(?:-[A-Za-z0-9_]+)?-\\d{8,})\\.committed").r
  }

  private val BaseMarkerRe = "base-(\\d{8,})\\.committed".r

  // the ONE grammar for keyed dir names — builder (keyedName) and parser
  // share it, so a format change cannot silently desynchronize the two
  private val KeyedNameRe = "[A-Za-z]+-(?:([A-Za-z0-9_]+)-)?(\\d{8,})".r

  /** Batch id of a (possibly app-qualified) keyed dir name. */
  def batchIdOf(name: String): Long = name match {
    case KeyedNameRe(_, batch) => batch.toLong
    case _ => throw new IllegalArgumentException(s"not a keyed dir name: $name")
  }

  /** App id of a keyed dir name ("" for the unqualified form). */
  def appIdOf(name: String): String = name match {
    case KeyedNameRe(app, _) => Option(app).getOrElse("")
    case _ => throw new IllegalArgumentException(s"not a keyed dir name: $name")
  }

  def committedDirs(fs: FileSystem, dir: Path,
      re: scala.util.matching.Regex): Seq[Path] =
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
  def resolveBase(fs: FileSystem, root: Path): (Path, Set[String]) = {
    val gens =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq.flatMap(s => s.getPath.getName match {
        case BaseMarkerRe(g) if s.isFile => Some(g.toLong)
        case _ => None
      })
    if (gens.isEmpty) (new Path(root, "base"), Set.empty)
    else {
      val gen = gens.max
      val text = CommitProtocol.readFully(fs, new Path(root, f"base-$gen%08d.committed"))
      (new Path(root, f"base-$gen%08d"),
        text.split('\n').map(_.trim).filter(_.nonEmpty).toSet)
    }
  }

  /** The committed store: the current base generation + every delta whose
    * commit marker exists and that the base has NOT folded in (a compaction
    * that crashed between marker publish and sweep leaves folded deltas on
    * disk — the superseded list in the base marker keeps them invisible, so
    * the store never double-counts). Listing is marker-driven —
    * uncommitted or partially-written dirs are never read (a glob over the
    * dir would read them: Spark's hidden-file filter applies to files UNDER
    * each input path, not to glob-matched directories themselves).
    */
  def currentPaths(fs: FileSystem, root: Path, deltaPrefix: String): Seq[Path] = {
    val (base, superseded) = resolveBase(fs, root)
    base +: committedDirs(fs, root, markerRe(deltaPrefix))
      .filterNot(p => superseded.contains(p.getName))
  }

  /** Idempotent commit of `df` at `dest` with marker `dest.committed`:
    * marker present → SKIP (keep the committed data); marker absent → any
    * stale dir is a crashed attempt, deleted and rewritten, then the
    * marker is created via single-file rename. A lost publish race means
    * another writer committed this very batch — single-writer contract
    * bent, but their data is equivalent (same deterministic pipeline), so
    * skipping is correct either way.
    */
  def commitDir(df: DataFrame, dest: Path, fs: FileSystem): Unit = {
    val marker = new Path(dest.getParent, dest.getName + ".committed")
    if (fs.exists(marker)) return
    if (fs.exists(dest) && !fs.delete(dest, true))
      throw new java.io.IOException(s"MarkerLog: cannot clear stale attempt $dest")
    df.write.parquet(dest.toString)
    CommitProtocol.publishFile(fs, marker, Array.emptyByteArray)
    ()
  }

  /** Delete superseded DATA dirs only — folded deltas' marker files stay
    * behind as replay tombstones. Idempotent — missing paths are fine.
    */
  def sweepSupersededData(fs: FileSystem, root: Path, superseded: Set[String]): Unit =
    superseded.foreach { name =>
      val dir = new Path(root, name)
      if (fs.exists(dir) && !fs.delete(dir, true))
        throw new java.io.IOException(s"MarkerLog sweep: cannot delete $dir")
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
    * A crash before the publish leaves the old store fully current (the
    * new dir is invisible garbage the next compaction clears); a crash
    * after it changes nothing — the sweep was deferred anyway.
    *
    * Folded deltas' commit markers are KEPT as replay tombstones; the old
    * base's marker is NOT one (no batch is keyed by it) and is dropped so
    * resolveBase never sees two generations claiming different superseded
    * sets.
    *
    * Single-writer maintenance op: run with the stream STOPPED.
    *
    * @return the new base dir name, or None if there was nothing to fold
    *         (leftover garbage from a crashed prior compaction is still
    *         swept)
    */
  def compact(spark: SparkSession, root: Path, deltaPrefix: String): Option[String] =
    foldGeneration(spark, root, deltaPrefix, requireDeltas = true)((df, _) => df)

  /** Generation number of a base dir name ("base" is generation 0). */
  def generationOf(baseName: String): Long =
    if (baseName == "base") 0L else baseName.stripPrefix("base-").toLong

  /** The generation-fold core under [[compact]] and index-rebuild ops:
    * fold the current base + committed deltas through `build` into a new
    * generation-numbered base, atomically published by its marker.
    * `build(data, newGen)` returns the new base's contents and may stage
    * generation-suffixed SIDECAR artifacts (e.g. an ANN rebuild's new
    * centroid table) before the marker publishes — a crash leaves them as
    * invisible garbage exactly like the unpublished base dir itself.
    * `requireDeltas = false` folds even a delta-less log (a rebuild is
    * worth committing with nothing to fold; a plain compaction is not).
    */
  private[graft] def foldGeneration(spark: SparkSession, root: Path,
      deltaPrefix: String, requireDeltas: Boolean)(
      build: (DataFrame, Long) => DataFrame): Option[String] = {
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (base, superseded) = resolveBase(fs, root)
    require(fs.exists(base), s"compact: no committed base at $base")
    // start-of-call cleanup, part 1: a crash between a prior compaction's
    // marker publish and its old-base-marker delete leaves a STALE
    // lower-generation base marker. Reads stay correct (resolveBase takes
    // the max) but the "one generation visible" invariant breaks and the
    // marker would otherwise linger forever — sweep every base marker
    // below the current generation now
    val gens = fs.listStatus(root).toSeq.flatMap(s => s.getPath.getName match {
      case BaseMarkerRe(g) if s.isFile => Some(g.toLong)
      case _ => None
    })
    if (gens.nonEmpty) gens.filter(_ < gens.max).foreach { g =>
      val stale = new Path(root, f"base-$g%08d.committed")
      if (!fs.delete(stale, false))
        throw new java.io.IOException(s"compact: cannot delete stale base marker $stale")
    }
    // part 2: sweep leftovers of a crashed prior compaction — their data
    // is already folded into the current base
    sweepSupersededData(fs, root, superseded)
    val live = committedDirs(fs, root, markerRe(deltaPrefix))
      .filterNot(p => superseded.contains(p.getName))
    if (requireDeltas && live.isEmpty) return None
    val gen = generationOf(base.getName)
    val newBase = new Path(root, f"base-${gen + 1}%08d")
    if (fs.exists(newBase) && !fs.delete(newBase, true))
      throw new java.io.IOException(s"compact: cannot clear stale attempt $newBase")
    build(spark.read.parquet((base +: live).map(_.toString): _*), gen + 1)
      .write.parquet(newBase.toString)
    // cumulative: prior generations' folds stay superseded forever (their
    // tombstone markers remain listable), plus the old base and this fold
    val newSuperseded = (superseded ++ (base.getName +: live.map(_.getName))).toSeq.sorted
    val marker = new Path(root, newBase.getName + ".committed")
    if (!CommitProtocol.publishFile(fs, marker,
        newSuperseded.mkString("", "\n", "\n").getBytes("UTF-8")))
      throw new java.io.IOException(
        s"compact: $marker already exists — concurrent compaction? " +
          "compact is a single-writer op")
    val oldBaseMarker = new Path(root, base.getName + ".committed")
    if (fs.exists(oldBaseMarker) && !fs.delete(oldBaseMarker, false))
      throw new java.io.IOException(s"compact: cannot delete $oldBaseMarker")
    Some(newBase.getName)
  }

  /** Remove folded deltas' replay tombstones for batch ids `<= upToBatchId`
    * of stream `txnAppId` — see [[StreamingDedup.pruneTombstones]] for the
    * retention contract (caller asserts the checkpoint's offset log has
    * committed past `upToBatchId`). Only markers the current base has
    * FOLDED are touched; live deltas' markers are load-bearing commits,
    * never pruned.
    *
    * @return the pruned marker names
    */
  def pruneTombstones(spark: SparkSession, root: Path, deltaPrefix: String,
      upToBatchId: Long, txnAppId: String): Seq[String] = {
    validateAppId(txnAppId)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, superseded) = resolveBase(fs, root)
    if (!fs.exists(root)) return Seq.empty
    val re = markerRe(deltaPrefix)
    // the horizon is PER STREAM (per checkpoint): only the named app's
    // folded markers are compared against it — another stream's batch 0
    // may still be replayable even when this stream is far past 0
    fs.listStatus(root).toSeq.flatMap(s => s.getPath.getName match {
      case re(d) if s.isFile && superseded.contains(d) &&
          appIdOf(d) == txnAppId && batchIdOf(d) <= upToBatchId =>
        if (!fs.delete(s.getPath, false))
          throw new java.io.IOException(s"pruneTombstones: cannot delete ${s.getPath}")
        Some(s.getPath.getName)
      case _ => None
    })
  }
}
