package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot-manifest table — the object-store-safe commit protocol
  * that upgrades the rename-swap sinks ([[graft.operators.Upsert.mergeAndSwap]],
  * [[PartitionedSink.compact]]) to an ATOMIC single-operation commit.
  *
  * Layout under a table root:
  * {{{
  *   manifest-00000003.json   // snapshot 3: header + one data-file path/line
  *   manifest-00000002.json   // older snapshots stay readable until vacuum
  *   data/v00000003/part-*.parquet   // immutable once committed
  * }}}
  *
  * Commit protocol (the Delta/Iceberg log shape, minus the engine):
  *   1. write the new snapshot's data files under a fresh `data/v<N>/` dir —
  *      invisible to readers, who only follow manifests;
  *   2. write `.manifest-<N>.tmp` listing those files;
  *   3. rename it to `manifest-<N>.json` — rename-to-a-NEW-name of ONE
  *      small file, atomic on HDFS-like filesystems. The rename IS the
  *      commit: a crash anywhere before it leaves only invisible garbage
  *      and the previous snapshot fully readable; after it, the new
  *      snapshot is fully durable. There is no delete-then-rename window
  *      at all (the failure mode `mergeAndSwap` documents). On object
  *      stores, swap the rename for a store-side conditional put — see
  *      [[CommitProtocol]]; Hadoop's S3A `rename` is copy+delete and is
  *      NOT a substitute.
  *
  * Readers list `manifest-*.json` and follow the highest version — no
  * pointer file to swap, so reads need no coordination. Version-numbered
  * manifests also give single-table optimistic concurrency: two writers
  * racing to commit N cannot both win the rename, and the loser fails loudly
  * without corrupting anything.
  *
  * Scope: snapshot tables (whole-table replace per commit — the MERGE and
  * compaction shapes). Data files are never renamed or deleted by a commit;
  * superseded snapshots are reclaimed explicitly by [[vacuum]].
  */
object SnapshotManifest {

  // {8,}: %08d pads to 8 digits but GROWS past them at version 1e8 — an
  // exact {8} would make such versions invisible to currentVersion and
  // permanently wedge commits on the apparent version collision
  private val ManifestRe = "manifest-(\\d{8,})\\.json".r

  private def fsOf(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestName(v: Long) = f"manifest-$v%08d.json"
  private def dataDirName(v: Long) = f"v$v%08d"

  /** Highest committed snapshot version, or None for an empty/new table. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val (fs, rootPath) = fsOf(spark, root)
    if (!fs.exists(rootPath)) return None
    val versions = fs.listStatus(rootPath).toSeq.flatMap(s => s.getPath.getName match {
      case ManifestRe(v) if s.isFile => Some(v.toLong)
      case _ => None
    })
    if (versions.isEmpty) None else Some(versions.max)
  }

  /** Data-file paths (absolute) of snapshot `version`. */
  def snapshotFiles(spark: SparkSession, root: String, version: Long): Seq[String] = {
    val (fs, rootPath) = fsOf(spark, root)
    val manifest = new Path(rootPath, manifestName(version))
    val in = fs.open(manifest)
    val text = try {
      val bytes = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 8192, false)
      new String(bytes.toByteArray, "UTF-8")
    } finally in.close()
    val lines = text.split('\n').map(_.trim).filter(_.nonEmpty)
    require(lines.headOption.contains(s"version=$version"),
      s"corrupt manifest $manifest: bad header ${lines.headOption}")
    lines.tail.map(rel => new Path(rootPath, rel).toString).toSeq
  }

  /** Read the current snapshot (empty-schema error if the table has none). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"SnapshotManifest.read: no committed snapshot under $root"))
    spark.read.parquet(snapshotFiles(spark, root, v): _*)
  }

  /** Commit `df` as the next snapshot. Single-writer-per-table contract for
    * the data-dir staging (like every sink here); the final rename detects a
    * lost race and fails WITHOUT corrupting either competing snapshot.
    *
    * @return the committed version
    */
  def commit(spark: SparkSession, root: String, df: DataFrame): Long = {
    val (fs, rootPath) = fsOf(spark, root)
    val next = currentVersion(spark, root).map(_ + 1).getOrElse(0L)
    val dataDir = new Path(rootPath, new Path("data", dataDirName(next)))
    // a dir for version `next` can be a previous CRASHED attempt (clear it
    // so its files don't leak into this commit's manifest) — or a
    // concurrent writer's already-COMMITTED data, which deleting would
    // corrupt their live snapshot. Re-check the manifest at the last
    // moment: committed → lose the race loudly, touching nothing.
    if (fs.exists(dataDir)) {
      if (fs.exists(new Path(rootPath, manifestName(next))))
        throw new java.io.IOException(
          s"commit: version $next already committed by a concurrent writer; nothing staged")
      if (!fs.delete(dataDir, true))
        throw new java.io.IOException(s"commit: cannot clear stale attempt $dataDir")
    }
    df.write.parquet(dataDir.toString)
    val files = fs.listStatus(dataDir)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"data/${dataDirName(next)}/${s.getPath.getName}")
      .sorted
    require(files.nonEmpty, s"commit: write produced no parquet files under $dataDir")
    val manifest = new Path(rootPath, manifestName(next))
    // THE commit point: one atomic file publish. False = a concurrent
    // writer committed this version first — fail loudly, leave their
    // snapshot intact, and surface our staged data for inspection.
    val won = CommitProtocol.publishFile(fs, manifest,
      (s"version=$next\n" + files.mkString("", "\n", "\n")).getBytes("UTF-8"))
    if (!won)
      throw new java.io.IOException(
        s"commit: version $next already committed by a concurrent writer; " +
          s"staged data left at $dataDir")
    next
  }

  /** Compact the current snapshot into ~`targetBytes` files as a NEW
    * snapshot — same maintenance op as [[PartitionedSink.compact]], but the
    * swap is the manifest commit: readers of the old snapshot are never
    * disturbed, and a crash at any point leaves it current. No-op (None)
    * when the file count is already at target.
    */
  def compactSnapshot(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024): Option[Long] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val (fs, _) = fsOf(spark, root)
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"compactSnapshot: no committed snapshot under $root"))
    val files = snapshotFiles(spark, root, v)
    val totalBytes = files.map(f => fs.getFileStatus(new Path(f)).getLen).sum
    val targetFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    if (files.length <= targetFiles) None
    else Some(commit(spark, root,
      spark.read.parquet(files: _*).coalesce(targetFiles)))
  }

  /** Delete manifests and data dirs superseded by the newest `keep`
    * snapshots. Readers pinned to a vacuumed snapshot lose it — the same
    * retention contract as any table format's vacuum.
    */
  def vacuum(spark: SparkSession, root: String, keep: Int = 1): Seq[Long] = {
    require(keep >= 1, "vacuum must keep at least the current snapshot")
    val (fs, rootPath) = fsOf(spark, root)
    val versions = fs.listStatus(rootPath).toSeq.flatMap(s => s.getPath.getName match {
      case ManifestRe(v) if s.isFile => Some(v.toLong)
      case _ => None
    }).sorted
    val doomed = versions.dropRight(keep)
    doomed.foreach { v =>
      // manifest FIRST: once it is gone the version no longer exists, and
      // the data dir is invisible garbage — a reader can never observe a
      // manifest whose files have been deleted from under it
      if (!fs.delete(new Path(rootPath, manifestName(v)), false))
        throw new java.io.IOException(s"vacuum: cannot delete manifest for version $v")
      val dataDir = new Path(rootPath, new Path("data", dataDirName(v)))
      if (fs.exists(dataDir) && !fs.delete(dataDir, true))
        throw new java.io.IOException(s"vacuum: cannot delete $dataDir")
    }
    // sweep orphan data dirs below the retention floor (a crash between the
    // two deletes above leaves one; without this it would leak forever,
    // since its version is no longer listed)
    val floor = versions.drop(doomed.length).headOption
    val dataRoot = new Path(rootPath, "data")
    if (floor.isDefined && fs.exists(dataRoot)) {
      val orphanRe = "v(\\d{8,})".r
      fs.listStatus(dataRoot).foreach { s =>
        s.getPath.getName match {
          case orphanRe(v) if s.isDirectory && v.toLong < floor.get &&
              !fs.exists(new Path(rootPath, manifestName(v.toLong))) =>
            if (!fs.delete(s.getPath, true))
              throw new java.io.IOException(s"vacuum: cannot delete orphan ${s.getPath}")
          case _ => ()
        }
      }
    }
    doomed
  }
}
