package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The one atomic-publish primitive every commit path here builds on:
  * write a dot-prefixed temp FILE, then land it at its final name by a
  * per-filesystem conditional primitive — rename on HDFS-like stores
  * (atomic namenode op that FAILS on an existing destination), link(2)
  * on local filesystems (POSIX rename silently REPLACES an existing
  * file, so rename alone is not conditional there; the hardlink is).
  * On object stores, Hadoop-style `rename` is a client-side copy+delete
  * and is NOT a conditional put — running these protocols there
  * requires a store-side conditional-write primitive (S3 If-None-Match,
  * GCS preconditions) in place of the rename; the single-small-FILE
  * shape is what makes that swap possible at all (directory renames
  * have no such equivalent).
  *
  * Used by [[SnapshotManifest]] (manifest files) and
  * [[graft.streaming.StreamingDedup]] (commit markers) so the race/crash
  * handling is audited in exactly one place.
  */
private[graft] object CommitProtocol {

  /** Publish `content` at `dest` via tmp-write + rename.
    *
    * @return true if this call created `dest`; false if `dest` already
    *         exists (a concurrent or earlier publisher won — tmp is
    *         cleaned up, dest is untouched)
    */
  /** Read a small commit file (manifest/marker) fully as UTF-8 — the read
    * side of [[publishFile]], shared so marker/manifest parsing lives in
    * one audited place.
    */
  def readFully(fs: FileSystem, path: Path): String = {
    val in = fs.open(path)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 8192, false)
      new String(bytes.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Publish a fully-staged DIRECTORY at `dest` via atomic rename — the
    * directory-shaped sibling of [[publishFile]] (a multi-file payload,
    * e.g. a change-feed commit's parquet, that a listing must see whole
    * or not at all). The caller stages into its own unique dir; the
    * loser's staging is deleted here. Same object-store caveat as the
    * class doc: no atomic dir rename there — use a manifest-of-files
    * scheme instead.
    *
    * @return true if this call created `dest`; false if it already
    *         exists (concurrent/earlier publisher won — stage cleaned up)
    */
  def publishDir(fs: FileSystem, stage: Path, dest: Path): Boolean = {
    fs.mkdirs(dest.getParent)
    if (fs.exists(dest)) { fs.delete(stage, true); return false }
    if (!fs.rename(stage, dest)) {
      fs.delete(stage, true)
      if (fs.exists(dest)) false
      else throw new java.io.IOException(
        s"publishDir: rename $stage -> $dest failed and $dest does not exist")
    } else {
      // Hadoop/POSIX rename gotcha: dir-onto-EXISTING-dir "succeeds" by
      // moving the source INSIDE the destination. If our stage landed
      // nested, a racer published dest first — remove our payload and
      // report the loss, or the winner's dir would carry a duplicate
      // feed as a stray subtree. Stage names are UUIDs, so the nested
      // probe cannot collide with real payload.
      val nested = new Path(dest, stage.getName)
      if (fs.exists(nested)) { fs.delete(nested, true); false }
      else true
    }
  }

  /** Overwrite a small single-value MARKER at `path` (tmp-write + replace)
    * — for monotonic last-writer-wins state like a consumer watermark or
    * vacuum's delta-manifest checkpoint rewrite, NOT for commits: unlike
    * [[publishFile]] there is no once-only guarantee.
    *
    * Rename is tried FIRST: on POSIX file:// filesystems rename(2)
    * silently REPLACES an existing file (the same property the
    * publishFile link(2) guard exists to defeat — here it is exactly
    * what we want: an ATOMIC replace, so a concurrent reader sees old or
    * new bytes, never a missing file). Stores whose rename refuses an
    * existing destination (HDFS) fall back to delete-then-rename, whose
    * absent-file window a crash can expose — callers must treat a missing
    * marker as "start over", which for a monotonic watermark only makes
    * them stricter, and for the vacuum rewrite retries idempotently.
    */
  def overwriteFile(fs: FileSystem, path: Path, content: Array[Byte]): Unit = {
    val tmp = new Path(path.getParent,
      "." + path.getName + "." + java.util.UUID.randomUUID().toString + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content) finally out.close()
    if (!fs.rename(tmp, path)) {
      fs.delete(path, false)
      if (!fs.rename(tmp, path)) fs.delete(tmp, false) // racer won; theirs stands
    }
  }

  def publishFile(fs: FileSystem, dest: Path, content: Array[Byte]): Boolean =
    publishFileStream(fs, dest, Iterator.single(content))

  /** [[publishFile]] fed by an ITERATOR of chunks — the streaming form for
    * commit files whose content must never be held whole in driver memory
    * (a checkpoint-boundary manifest of a 10⁵-10⁶-file table, streamed
    * from the composed body frame one partition at a time). Identical
    * commit point; the tmp write just drains the iterator.
    */
  def publishFileStream(fs: FileSystem, dest: Path,
      content: Iterator[Array[Byte]]): Boolean = {
    if (fs.exists(dest)) return false
    // Per-attempt unique tmp name: two writers racing to publish the same
    // dest must never share a tmp file, else writer A can rename a tmp that
    // writer B just overwrote and "commit" B's content as its own (silent
    // lost update). The commit point below is the single decider; the
    // loser deletes only its own tmp.
    val tmp = new Path(dest.getParent,
      "." + dest.getName + "." + java.util.UUID.randomUUID().toString + ".tmp")
    val out = fs.create(tmp, true)
    try content.foreach(out.write) finally out.close()
    if (fs.getScheme == "file") {
      // POSIX commit point: rename(2) silently REPLACES an existing
      // destination file, so on a local filesystem two racers passing the
      // exists-check would BOTH "win" (the second clobbering the first's
      // committed bytes — a lost update with no error). link(2) is the
      // atomic fail-if-exists primitive: exactly one link lands.
      val toLocal = (p: Path) =>
        java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath)
      try {
        java.nio.file.Files.createLink(toLocal(dest), toLocal(tmp))
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          fs.delete(tmp, false); false
      }
    } else if (fs.rename(tmp, dest)) true // HDFS-like: fails on existing dest
    else {
      fs.delete(tmp, false) // lost the race — don't leak the temp file
      if (fs.exists(dest)) false
      else throw new java.io.IOException(
        s"publishFile: rename $tmp -> $dest failed and $dest does not exist")
    }
  }
}
