package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.concurrent.duration._

import graft.core.Retry

/** A snapshot commit lost the optimistic-concurrency race: another writer
  * published this version first. The losing attempt corrupted nothing (its
  * staged data dir is unreferenced garbage until [[SnapshotManifest.vacuum]]
  * sweeps it) and the table now holds the WINNER's snapshot — so the correct
  * response is re-read-and-retry, which [[SnapshotManifest.commitWithRetry]]
  * and the DML `*WithRetry` twins automate. An `IOException` subclass so
  * pre-existing callers that matched on IOException still do.
  */
class ConcurrentCommitException(message: String)
  extends java.io.IOException(message)

/** A quality-gated commit ([[SnapshotManifest.commitChecked]]) found failing
  * checks: nothing was written and the table keeps its current snapshot.
  * The message carries the per-check report (name, metric, threshold).
  */
class QualityGateException(message: String)
  extends IllegalStateException(message)

/** Versioned snapshot-manifest table — the object-store-safe commit protocol
  * that upgrades the rename-swap sinks ([[graft.operators.Upsert.mergeAndSwap]],
  * [[PartitionedSink.compact]]) to an ATOMIC single-operation commit.
  *
  * Layout under a table root:
  * {{{
  *   manifest-00000003.json   // snapshot 3: header + one data-file path/line
  *   manifest-00000002.json   // older snapshots stay readable until vacuum
  *   data/v00000003-1f3a9c2e/part-*.parquet   // immutable once committed;
  *                                            // nonce-unique per attempt
  * }}}
  *
  * Commit protocol (the Delta/Iceberg log shape, minus the engine):
  *   1. write the new snapshot's data files under a fresh, per-attempt
  *      UNIQUE `data/v<N>-<nonce>/` dir — invisible to readers, who only
  *      follow manifests, and never shared with any other attempt, so
  *      concurrent writers cannot touch each other's staged files;
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
  * manifests give single-table optimistic concurrency: two writers racing
  * to commit N stage into disjoint dirs and cannot both win the manifest
  * rename; the loser fails loudly without corrupting anything (its staged
  * dir is inert garbage until [[vacuum]] sweeps it). The loser must re-read
  * the table and retry — blind retry at N+1 would silently discard the
  * winner's changes (lost update) for these read-modify-write commits.
  *
  * Scope: snapshot tables (whole-table replace per commit — the MERGE and
  * compaction shapes). Data files are never renamed or deleted by a commit;
  * superseded snapshots and abandoned staging dirs are reclaimed explicitly
  * by [[vacuum]], which requires NO concurrent writers (it reclaims any
  * data dir no surviving manifest references — an in-flight commit's
  * staging included).
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

  /** Data-file paths (absolute) of snapshot `version`. Manifest file lines
    * are `relpath` optionally followed by TAB + per-file stats JSON
    * ([[ManifestStats]]); this accessor strips the stats.
    */
  def snapshotFiles(spark: SparkSession, root: String, version: Long): Seq[String] = {
    val (fs, rootPath) = fsOf(spark, root)
    val manifest = new Path(rootPath, manifestName(version))
    val text = CommitProtocol.readFully(fs, manifest)
    val lines = text.split('\n').map(_.trim).filter(_.nonEmpty)
    require(lines.headOption.contains(s"version=$version"),
      s"corrupt manifest $manifest: bad header ${lines.headOption}")
    lines.tail.map(rel => new Path(rootPath, rel.split('\t').head).toString).toSeq
  }

  /** Per-file stats of snapshot `version`, keyed by file NAME — empty for
    * files committed without stats (pre-stats manifests read fine: every
    * file simply survives pruning).
    */
  def snapshotFileStats(spark: SparkSession, root: String,
      version: Long): Map[String, ManifestStats.FileStats] = {
    val (fs, rootPath) = fsOf(spark, root)
    val text = CommitProtocol.readFully(fs, new Path(rootPath, manifestName(version)))
    text.split('\n').map(_.trim).filter(_.nonEmpty).drop(1).flatMap { line =>
      line.split('\t') match {
        case Array(rel, json) =>
          Some(new Path(rel).getName -> ManifestStats.fromJson(json))
        case _ => None
      }
    }.toMap
  }

  /** Read the current snapshot (empty-schema error if the table has none). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"SnapshotManifest.read: no committed snapshot under $root"))
    spark.read.parquet(snapshotFiles(spark, root, v): _*)
  }

  /** Data-skipping read: files of the current snapshot whose manifest
    * stats admit a `predicate` match, scanned and re-filtered row-by-row
    * with the same predicate — always equal to `read(...).filter(predicate)`,
    * the stats only decide which files Spark never lists in the scan at
    * all. At 100 TB with a range-clustered layout ([[graft.operators.Layout]]
    * or `repartitionByRange` at commit), a narrow range touches a handful
    * of files; the prune decision itself is one driver-side manifest read,
    * no per-file footer round-trips. Conservative everywhere: stats-less
    * files, unrecognized predicate shapes, and type mismatches all stay in
    * the scan (see [[ManifestStats.mayMatch]]).
    */
  def readWhere(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"SnapshotManifest.readWhere: no committed snapshot under $root"))
    val all = snapshotFiles(spark, root, v)
    val full = spark.read.parquet(all: _*)
    val pred = ManifestStats.resolvePredicate(spark, full.schema, predicate)
    val kept = ManifestStats.prune(all, snapshotFileStats(spark, root, v), pred)
    if (kept.isEmpty)
      // schema must come from the table even when every file is pruned
      full.limit(0).filter(predicate)
    else spark.read.parquet(kept: _*).filter(predicate)
  }

  /** The file list [[readWhere]] would scan for `predicate` at `version` —
    * exposed so callers (and specs) can observe the skipping itself.
    */
  def prunedFiles(spark: SparkSession, root: String, version: Long,
      predicate: org.apache.spark.sql.Column): Seq[String] = {
    val files = snapshotFiles(spark, root, version)
    val schema = spark.read.parquet(files: _*).schema
    ManifestStats.prune(files, snapshotFileStats(spark, root, version),
      ManifestStats.resolvePredicate(spark, schema, predicate))
  }

  /** Whether `version`'s manifest is still present (i.e. not vacuumed) —
    * the probe an incremental consumer runs before diffing FROM that
    * version ([[changesBetween]] on a reclaimed manifest throws).
    */
  def hasVersion(spark: SparkSession, root: String, version: Long): Boolean = {
    val (fs, rootPath) = fsOf(spark, root)
    fs.exists(new Path(rootPath, manifestName(version)))
  }

  /** File-level copy-on-write DELETE: commit a new snapshot without the
    * rows matching `predicate`, rewriting ONLY the files whose manifest
    * stats admit a match — every other file is reused byte-for-byte (its
    * manifest line, stats included, carries over verbatim). At 100 TB with
    * a range-clustered layout, deleting one key touches the handful of
    * files whose range contains it, not the table; the prune decision is
    * one driver-side manifest read. SQL DELETE null semantics: a row where
    * the predicate evaluates NULL is NOT deleted.
    *
    * The deleted rows remain readable in SUPERSEDED versions until
    * [[vacuum]] reclaims them — a compliance purge ("this key must be
    * unreadable NOW") is `deleteWhere` + `vacuum(keep = 1)`.
    *
    * `statsCols` stats are recorded for the REWRITTEN files (kept files
    * keep whatever stats they had); pass the same columns the table
    * commits with so pruning keeps working after the delete.
    *
    * @return the committed version (the CURRENT version unchanged if no
    *         file could contain a match — a no-op delete commits nothing)
    */
  def deleteWhere(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column,
      statsCols: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    rewriteWhere(spark, root, predicate, statsCols, "deleteWhere",
      _.filter(not(coalesce(predicate, lit(false)))))
  }

  /** Copy-on-write UPDATE — [[deleteWhere]]'s twin: rows matching
    * `predicate` get each `assignments` column replaced by its expression
    * (evaluated on the pre-update row, like SQL UPDATE SET); everything
    * else — rows in affected files that don't match, and every
    * unaffected file byte-for-byte — is untouched. NULL-predicate rows
    * are not updated. Same stats-pruned rewrite, manifest-line reuse,
    * and no-op short-circuit as delete.
    */
  def updateWhere(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column],
      statsCols: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, when}
    require(assignments.nonEmpty, "updateWhere: no SET assignments")
    val hit = coalesce(predicate, lit(false))
    rewriteWhere(spark, root, predicate, statsCols, "updateWhere", { df =>
      val cols = df.columns.toSeq
      assignments.keys.foreach(c => require(cols.contains(c),
        s"updateWhere: SET column '$c' not in ${cols.mkString(", ")}"))
      // all assignments evaluate against the PRE-update row (SQL UPDATE):
      // one select, no chained withColumn ordering hazard. Cast back to the
      // column's ORIGINAL type: a widening assignment (decimal*double,
      // int+long) would otherwise write rewritten files whose parquet
      // schema diverges from the verbatim-kept files and corrupt the
      // mixed-file read; incompatible assignments fail analysis loudly.
      df.select(cols.map { c =>
        assignments.get(c)
          .map(e => when(hit, e).otherwise(col(c))
            .cast(df.schema(c).dataType).alias(c))
          .getOrElse(col(c))
      }: _*)
    })
  }

  /** Raw manifest BODY lines of `version` — `relpath` optionally followed
    * by TAB + stats JSON, verbatim as committed. The carrier for manifest-
    * line reuse: a copy-on-write commit copies kept lines unchanged (path
    * AND stats), so unaffected files keep their pruning power for free.
    */
  private[graft] def manifestBody(spark: SparkSession, root: String,
      version: Long): Seq[String] = {
    val (fs, rootPath) = fsOf(spark, root)
    val text = CommitProtocol.readFully(fs, new Path(rootPath, manifestName(version)))
    val lines = text.split('\n').map(_.trim).filter(_.nonEmpty)
    require(lines.headOption.contains(s"version=$version"),
      s"corrupt manifest for version $version: bad header ${lines.headOption}")
    lines.tail.toSeq
  }

  /** Absolute data-file path of one manifest body line. */
  private[graft] def bodyFile(root: String, line: String): String =
    new Path(new Path(root), line.split('\t').head).toString

  /** Per-file stats parsed out of manifest body lines, keyed by file name
    * (stats-less lines simply don't appear — they never prune).
    */
  private[graft] def bodyStats(body: Seq[String]): Map[String, ManifestStats.FileStats] =
    body.flatMap(_.split('\t') match {
      case Array(rel, json) =>
        Some(new Path(rel).getName -> ManifestStats.fromJson(json))
      case _ => None
    }).toMap

  /** Stage `df` and atomically publish it as version `next` together with
    * `keptLines` carried verbatim — the copy-on-write commit entry point
    * for operators OUTSIDE this object ([[graft.operators.Upsert.mergeWhere]]);
    * [[deleteWhere]]/[[updateWhere]] go through the same path internally.
    */
  private[graft] def publishVersion(spark: SparkSession, root: String,
      next: Long, df: DataFrame, statsCols: Seq[String],
      keptLines: Seq[String], op: String): Long = {
    val (fs, rootPath) = fsOf(spark, root)
    stageAndPublish(spark, fs, rootPath, next, df, statsCols, keptLines,
      op, requireFiles = false)
  }

  /** The shared copy-on-write rewrite under [[deleteWhere]]/[[updateWhere]]:
    * stats-prune the affected files, apply `transform` to their rows,
    * commit kept manifest lines (verbatim) + the rewritten files. ONE
    * manifest read answers files, stats, and kept lines; the predicate
    * schema resolves from a single file (every file of a snapshot shares
    * it) — at 100k files the driver never lists the unaffected ones.
    */
  private def rewriteWhere(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column, statsCols: Seq[String],
      op: String, transform: DataFrame => DataFrame): Long = {
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"$op: no committed snapshot under $root"))
    val body = manifestBody(spark, root, v)
    if (body.isEmpty) return v
    val files = body.map(bodyFile(root, _))
    val schema = spark.read.parquet(files.head).schema
    val affected = ManifestStats.prune(files, bodyStats(body),
      ManifestStats.resolvePredicate(spark, schema, predicate)).toSet
    if (affected.isEmpty) return v // no file can contain a match
    // kept manifest lines carry over verbatim (path AND stats)
    val keptLines = body.filterNot(line => affected.contains(bodyFile(root, line)))
    publishVersion(spark, root, v + 1,
      transform(spark.read.parquet(affected.toSeq: _*)), statsCols, keptLines, op)
  }

  /** Stage `df` into a fresh uniquely-nonced data dir for version `next`,
    * collect optional per-file stats, and atomically publish the manifest
    * (`keptLines` verbatim + the new file lines) — the ONE publish path
    * [[commit]], [[deleteWhere]], and [[updateWhere]] all go through.
    */
  private def stageAndPublish(spark: SparkSession, fs: FileSystem, rootPath: Path,
      next: Long, df: DataFrame, statsCols: Seq[String], keptLines: Seq[String],
      op: String, requireFiles: Boolean): Long = {
    // unique per-attempt staging: the version prefix is advisory (for
    // humans); the nonce is what makes racing attempts disjoint. A crashed
    // or lost-race attempt leaves an unreferenced dir that vacuum sweeps.
    val dirName = s"${dataDirName(next)}-${java.util.UUID.randomUUID.toString.take(8)}"
    val dataDir = new Path(rootPath, new Path("data", dirName))
    df.write.parquet(dataDir.toString)
    val stats =
      if (statsCols.isEmpty) Map.empty[String, ManifestStats.FileStats]
      else ManifestStats.collect(spark.read.parquet(dataDir.toString), statsCols)
    val files = fs.listStatus(dataDir)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"data/$dirName/${s.getPath.getName}")
      .sorted
    if (requireFiles)
      require(files.nonEmpty, s"$op: write produced no parquet files under $dataDir")
    // a ZERO-ROW part file produces no aggregation group: record it as
    // rows=0 (prunable by construction) rather than stats-less (never
    // pruned) — the empty file can satisfy no predicate
    val emptyStats = ManifestStats.FileStats(0L,
      statsCols.map(_ -> ManifestStats.ColStats(None, None, 0L)).toMap)
    val newLines = files.map { f =>
      if (statsCols.isEmpty) f
      else f + "\t" + ManifestStats.toJson(stats.getOrElse(new Path(f).getName, emptyStats))
    }
    val manifest = new Path(rootPath, manifestName(next))
    // THE commit point: one atomic file publish. False = a concurrent
    // writer committed this version first — fail loudly, leave their
    // snapshot intact, and surface our staged data for inspection.
    val won = CommitProtocol.publishFile(fs, manifest,
      (s"version=$next\n" + (keptLines ++ newLines).mkString("", "\n", "\n")).getBytes("UTF-8"))
    if (!won)
      throw new ConcurrentCommitException(
        s"$op: version $next already committed by a concurrent writer; " +
          s"re-read the table and retry; staged data left at $dataDir " +
          "(unreferenced — vacuum sweeps it)")
    next
  }

  /** Time travel: read an explicit committed snapshot `version`. Every
    * superseded version stays fully readable until [[vacuum]] reclaims it
    * (data files are immutable and manifests are never rewritten), so this
    * is a pure manifest lookup — no log replay, no reconstruction.
    */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame =
    spark.read.parquet(snapshotFiles(spark, root, version): _*)

  /** Row-level change feed between two committed versions: what happened to
    * the table keyed by `pk` going `fromVersion` → `toVersion`. Output is
    * the table's columns plus `_change` ∈ {insert, delete, update_preimage,
    * update_postimage} (updates emit BOTH rows, Delta-CDF style), so a
    * downstream incremental consumer can apply the feed without re-reading
    * either snapshot.
    *
    * Contract: each snapshot is PK-unique (the [[graft.operators.Upsert]]
    * family's invariant). That makes the FILE-level prune sound: data files
    * are immutable, so a file listed by both manifests contributes
    * byte-identical rows to both sides and cannot produce a change — only
    * files unique to one side are read at all. After compaction-only or
    * metadata-only commits the diff therefore reads NOTHING, and at 100 TB
    * the scan cost is proportional to the churned fraction of the table,
    * not its size. The remainder is one null-safe full-outer join on `pk`
    * (one shuffle per side); rewritten-but-unchanged rows (compaction) are
    * detected by column comparison and dropped.
    */
  def changesBetween(spark: SparkSession, root: String,
      fromVersion: Long, toVersion: Long, pk: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(pk.nonEmpty, "changesBetween: pk must name at least one column")
    require(fromVersion <= toVersion,
      s"changesBetween: fromVersion $fromVersion > toVersion $toVersion")
    val oldFiles = snapshotFiles(spark, root, fromVersion)
    val newFiles = snapshotFiles(spark, root, toVersion)
    val shared = oldFiles.toSet intersect newFiles.toSet
    val oldOnly = oldFiles.filterNot(shared)
    val newOnly = newFiles.filterNot(shared)
    // UNION schema across both versions (mergeSchema): a schema-evolving
    // commit (column added or dropped between the versions) must not make
    // the diff unreadable. Each side is aligned to the union below —
    // absent columns read as typed nulls, so an added column registers as
    // null→value updates (the Delta-CDF convention) rather than an
    // analysis error.
    val schemaSrc = spark.read.option("mergeSchema", "true")
      .parquet((oldFiles ++ newFiles).distinct: _*)
    val cols = schemaSrc.columns.toSeq
    pk.foreach(c => require(cols.contains(c), s"changesBetween: pk column $c not in $cols"))
    if (oldOnly.isEmpty && newOnly.isEmpty)
      return schemaSrc.limit(0).withColumn("_change", lit(""))
    // presence markers, not pk-null checks: a legitimately NULL-keyed row
    // (the `=` merge carve-outs tolerate them) must not read as "absent"
    def side(files: Seq[String]) = {
      val raw =
        if (files.isEmpty) schemaSrc.limit(0)
        else spark.read.option("mergeSchema", "true").parquet(files: _*)
      raw.select(cols.map(c =>
        if (raw.columns.contains(c)) col(s"`$c`")
        else lit(null).cast(schemaSrc.schema(c).dataType).alias(c)): _*)
        .withColumn("__graft_present", lit(1))
    }
    val o = side(oldOnly).alias("o")
    val n = side(newOnly).alias("n")
    val joinCond = pk.map(c => col(s"o.$c") <=> col(s"n.$c")).reduce(_ && _)
    val joined = o.join(n, joinCond, "full_outer")
    val oldAbsent = col("o.__graft_present").isNull
    val newAbsent = col("n.__graft_present").isNull
    val nonPk = cols.filterNot(pk.contains)
    val differs =
      if (nonPk.isEmpty) lit(false)
      else nonPk.map(c => !(col(s"o.$c") <=> col(s"n.$c"))).reduce(_ || _)
    def img(prefix: String) = struct(cols.map(c => col(s"$prefix.$c")): _*)
    // drop unchanged rows (ones that merely moved files, e.g. compaction),
    // then one codegen'd pass expands each survivor to its 1-2 feed rows
    val feed = joined.filter(oldAbsent || newAbsent || differs).select(explode(
      when(oldAbsent, array(struct(lit("insert").alias("_change"), img("n").alias("row"))))
        .when(newAbsent, array(struct(lit("delete").alias("_change"), img("o").alias("row"))))
        .otherwise(array(
          struct(lit("update_preimage").alias("_change"), img("o").alias("row")),
          struct(lit("update_postimage").alias("_change"), img("n").alias("row"))))
    ).alias("e"))
    feed.select(cols.map(c => col(s"e.row.$c")) :+ col("e._change").alias("_change"): _*)
  }

  /** Commit `df` as the next snapshot. Concurrent writers are SAFE: each
    * attempt stages into its own unique dir (no attempt can delete or list
    * another's files — there is no shared staging path at all), and the
    * manifest rename detects a lost race and fails WITHOUT corrupting
    * either competing snapshot. The loser's staged dir is left for
    * inspection and later [[vacuum]]. Losers must re-read and retry — see
    * the class doc for why blind retry is wrong for read-modify-write.
    *
    * @return the committed version
    */
  def commit(spark: SparkSession, root: String, df: DataFrame): Long =
    commit(spark, root, df, Nil)

  /** [[commit]] that additionally records per-file min/max/null-count
    * stats for `statsCols` in the manifest ([[ManifestStats]]) — one extra
    * aggregation over the freshly written (page-cache-hot) files. Readers
    * exploit them through [[readWhere]]; stats-less and stats-ful commits
    * interleave freely in one table.
    */
  def commit(spark: SparkSession, root: String, df: DataFrame,
      statsCols: Seq[String]): Long = {
    val (fs, rootPath) = fsOf(spark, root)
    val next = currentVersion(spark, root).map(_ + 1).getOrElse(0L)
    stageAndPublish(spark, fs, rootPath, next, df, statsCols, Nil,
      "commit", requireFiles = true)
  }

  /** [[commit]] gated by declarative quality expectations — CHECK
    * constraints at the publication boundary (Delta's table constraints /
    * dbt-test-before-swap, on this engine's commit protocol): the staged
    * frame is validated with [[graft.schema.QualityChecks.run]] (ALL
    * checks in one scan + one 1-row aggregation) BEFORE anything is
    * written; a failing check aborts with the full per-check report in
    * the exception and the table keeps its current snapshot. The frame is
    * persisted across the check scan and the write, so validation and
    * committed bytes come from ONE evaluation — a non-deterministic input
    * cannot pass the gate and commit different rows.
    */
  def commitChecked(spark: SparkSession, root: String, df: DataFrame,
      checks: Seq[graft.schema.QualityChecks.Check],
      statsCols: Seq[String] = Nil): Long = {
    val pinned = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val report = graft.schema.QualityChecks.run(pinned, checks).collect()
      val failed = report.filterNot(_.getAs[Boolean]("passed"))
      if (failed.nonEmpty)
        throw new QualityGateException(
          s"commitChecked: ${failed.length}/${report.length} checks failed, " +
            s"nothing committed under $root — " +
            failed.map(r => s"${r.getAs[String]("check_name")} " +
              f"(metric ${r.getAs[Double]("metric")}%.6f > " +
              f"threshold ${r.getAs[Double]("threshold")}%.6f)").mkString("; "))
      commit(spark, root, pinned, statsCols)
    } finally pinned.unpersist(false)
  }

  /** [[commit]] wrapped in a bounded lost-race retry loop — the first-class
    * form of the "loser must re-read and retry" contract for the common
    * multi-writer warehouse (many pipelines committing into one table).
    *
    * `df` is BY-NAME and re-evaluated on every attempt: derive it from
    * `SnapshotManifest.read(spark, root)` (or any read of current table
    * state) inside the expression, so a retry recomputes the frame against
    * the table AS THE WINNER LEFT IT — replaying a frame captured before
    * the race would silently discard the winner's changes (the lost-update
    * hazard the class doc describes). Only [[ConcurrentCommitException]] is
    * retried; a broken frame (analysis error, bad data) propagates on the
    * first attempt. Each lost attempt's staged dir is inert garbage for
    * [[vacuum]], exactly as with a hand-rolled loop.
    */
  def commitWithRetry(spark: SparkSession, root: String, df: => DataFrame,
      statsCols: Seq[String] = Nil, maxAttempts: Int = 5,
      backoff: Int => FiniteDuration = Retry.linearBackoff(1.second),
      sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis)): Long =
    Retry.retryWhen(_.isInstanceOf[ConcurrentCommitException],
      maxAttempts, backoff, sleep)(commit(spark, root, df, statsCols))

  /** [[deleteWhere]] with the same bounded lost-race retry as
    * [[commitWithRetry]]. Safe to re-run as-is: every attempt re-reads the
    * CURRENT version internally, so a retry deletes from the table as the
    * winning writer left it, and `predicate` describes the rows to delete
    * regardless of which snapshot they sit in.
    */
  def deleteWhereWithRetry(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column, statsCols: Seq[String] = Nil,
      maxAttempts: Int = 5,
      backoff: Int => FiniteDuration = Retry.linearBackoff(1.second),
      sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis)): Long =
    Retry.retryWhen(_.isInstanceOf[ConcurrentCommitException],
      maxAttempts, backoff, sleep)(
      deleteWhere(spark, root, predicate, statsCols))

  /** [[updateWhere]] with the same bounded lost-race retry as
    * [[commitWithRetry]]; re-running re-reads the current version, so
    * assignments evaluate against the winner's rows.
    */
  def updateWhereWithRetry(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column],
      statsCols: Seq[String] = Nil, maxAttempts: Int = 5,
      backoff: Int => FiniteDuration = Retry.linearBackoff(1.second),
      sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis)): Long =
    Retry.retryWhen(_.isInstanceOf[ConcurrentCommitException],
      maxAttempts, backoff, sleep)(
      updateWhere(spark, root, predicate, assignments, statsCols))

  /** Compact the current snapshot into ~`targetBytes` files as a NEW
    * snapshot — same maintenance op as [[PartitionedSink.compact]], but the
    * swap is the manifest commit: readers of the old snapshot are never
    * disturbed, and a crash at any point leaves it current. No-op (None)
    * when the file count is already at target.
    *
    * Stats are PRESERVED across compaction: by default (`statsCols = None`)
    * the columns recorded in the current manifest are re-collected for the
    * compacted files, so a table's pruning power survives its maintenance
    * (losing it silently would turn every post-compaction [[readWhere]]
    * into a full scan). Pass `Some(cols)` to change the stats set, or
    * `Some(Nil)` to drop stats deliberately.
    */
  def compactSnapshot(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024,
      statsCols: Option[Seq[String]] = None): Option[Long] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val (fs, _) = fsOf(spark, root)
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"compactSnapshot: no committed snapshot under $root"))
    val files = snapshotFiles(spark, root, v)
    val totalBytes = files.map(f => fs.getFileStatus(new Path(f)).getLen).sum
    val targetFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    if (files.length <= targetFiles) None
    else {
      val cols = statsCols.getOrElse(snapshotFileStats(spark, root, v)
        .values.flatMap(_.cols.keys).toSeq.distinct.sorted)
      Some(commit(spark, root,
        spark.read.parquet(files: _*).coalesce(targetFiles), cols))
    }
  }

  /** [[compactSnapshot]] with the bounded lost-race retry of the other
    * maintenance/DML entry points. Safe to replay wholesale: every attempt
    * re-reads the CURRENT version (file list, byte total, no-op check, and
    * inherited stats columns alike), so a retry compacts the table as the
    * winning writer left it.
    */
  def compactSnapshotWithRetry(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024,
      statsCols: Option[Seq[String]] = None, maxAttempts: Int = 5,
      backoff: Int => FiniteDuration = Retry.linearBackoff(1.second),
      sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis)): Option[Long] =
    Retry.retryWhen(_.isInstanceOf[ConcurrentCommitException],
      maxAttempts, backoff, sleep)(
      compactSnapshot(spark, root, targetBytes, statsCols))

  /** Delete manifests superseded by the newest `keep` snapshots, then sweep
    * every data dir no surviving manifest references — superseded snapshots,
    * crashed attempts, and lost-race staging alike (reachability, not
    * name-derived paths, decides: staging dirs are nonce-named).
    *
    * `minAgeMs` is the retention guard: manifests and data dirs modified
    * within the last `minAgeMs` are left untouched, so a mis-timed vacuum
    * cannot eat an IN-FLIGHT commit's staging (unreferenced only because
    * its manifest hasn't published yet) or a snapshot a reader just pinned.
    * The default keeps nothing back (`0` — the no-concurrent-writers
    * regime); pass an age comfortably above your longest commit (the same
    * retention contract as every table format's vacuum).
    */
  def vacuum(spark: SparkSession, root: String, keep: Int = 1,
      minAgeMs: Long = 0L): Seq[Long] = {
    require(keep >= 1, "vacuum must keep at least the current snapshot")
    require(minAgeMs >= 0, "minAgeMs must be non-negative")
    val (fs, rootPath) = fsOf(spark, root)
    val cutoff = System.currentTimeMillis() - minAgeMs
    val versions = fs.listStatus(rootPath).toSeq.flatMap(s => s.getPath.getName match {
      case ManifestRe(v) if s.isFile => Some(v.toLong)
      case _ => None
    }).sorted
    // an uncommitted table has nothing to vacuum — and sweeping here would
    // eat a bootstrap commit's staging for no benefit
    if (versions.isEmpty) return Seq.empty
    val doomed = versions.dropRight(keep).filter { v =>
      fs.getFileStatus(new Path(rootPath, manifestName(v))).getModificationTime <= cutoff
    }
    // live set FIRST, from the manifests that will survive (everything not
    // doomed — including too-young superseded ones): any dir under data/
    // outside this set is unreachable garbage once the doomed manifests go
    // (dirName, fileName) keys, not path strings: listStatus returns
    // scheme-qualified paths (file:/...) while manifest-derived paths are
    // scheme-less — string comparison would mark EVERY file unreferenced
    val keptFiles = versions.filterNot(doomed.contains).flatMap(v =>
      snapshotFiles(spark, root, v).map { f =>
        val p = new Path(f); (p.getParent.getName, p.getName)
      }).toSet
    val keptDirs = keptFiles.map(_._1)
    doomed.foreach { v =>
      // manifest FIRST: once it is gone the version no longer exists, and
      // its data dir is invisible garbage — a reader can never observe a
      // manifest whose files have been deleted from under it. A crash
      // between this loop and the sweep below leaves only such garbage,
      // which the NEXT vacuum's reachability sweep reclaims.
      if (!fs.delete(new Path(rootPath, manifestName(v)), false))
        throw new java.io.IOException(s"vacuum: cannot delete manifest for version $v")
    }
    val dataRoot = new Path(rootPath, "data")
    if (fs.exists(dataRoot)) {
      fs.listStatus(dataRoot).foreach { s =>
        // age gate on the DIR's own mtime: an in-flight commit's staging is
        // young by definition — reachability alone cannot distinguish it
        // from a crashed attempt until its manifest publishes (or never does)
        if (s.isDirectory && !keptDirs.contains(s.getPath.getName) &&
            s.getModificationTime <= cutoff) {
          if (!fs.delete(s.getPath, true))
            throw new java.io.IOException(s"vacuum: cannot delete ${s.getPath}")
        } else if (s.isDirectory && keptDirs.contains(s.getPath.getName)) {
          // FILE-level sweep inside referenced dirs: [[deleteWhere]] shares
          // files across versions, so a kept dir can hold parquet files no
          // surviving manifest references (a rewritten file's old copy —
          // exactly the bytes a compliance purge must reclaim). Committed
          // dirs are immutable-once-published, so an unreferenced parquet
          // file here is never an in-flight write; the age gate still
          // applies for symmetry with the dir sweep.
          fs.listStatus(s.getPath).foreach { f =>
            if (f.isFile && f.getPath.getName.endsWith(".parquet") &&
                !keptFiles.contains((s.getPath.getName, f.getPath.getName)) &&
                f.getModificationTime <= cutoff) {
              if (!fs.delete(f.getPath, false))
                throw new java.io.IOException(s"vacuum: cannot delete ${f.getPath}")
            }
          }
        }
      }
    }
    doomed
  }
}
