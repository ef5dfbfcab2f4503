package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE upsert (SURVEY §2.9, reference `utils.py:237-296`).
  *
  * Semantics preserved from the reference's generated Exasol MERGE:
  *   - ON = conjunction of equality over caller-passed PK columns
  *     (whitespace-trimmed, `utils.py:264-269`)
  *   - WHEN MATCHED → take every staged column EXCEPT the PKs and
  *     `INSERT_TIMESTAMP` (both keep the target's value, `utils.py:273`);
  *     `UPDATE_TIMESTAMP` comes from staged (`utils.py:270`)
  *   - WHEN NOT MATCHED → insert the staged row wholesale incl. both
  *     timestamps (`utils.py:283-290`)
  *
  * Spark-first design: one `full_outer` join on the PK + a per-column
  * `coalesce` projection — a single shuffle on the PK columns, no driver-side
  * row handling. At 100 TB the join is a standard shuffle-hash/sort-merge on
  * the PK; if the staged side is small Catalyst/AQE broadcast it, and if the
  * target is bucketed by PK the shuffle on the target side disappears
  * entirely. Atomicity on plain parquet = write-to-temp-then-swap
  * (`mergeAndSwap`), or — object-store-safe — the snapshot-manifest commit
  * (`mergeAndCommit`); on a Delta-capable catalog the same call maps to
  * `MERGE INTO` verbatim.
  *
  * Null caveat (documented, deliberate): PK equality is Spark SQL `=` — null
  * PKs never match, same as the Exasol MERGE the reference emits.
  */
object Upsert {

  val InsertTs = "INSERT_TIMESTAMP"
  val UpdateTs = "UPDATE_TIMESTAMP"

  /** Parse the reference's comma-separated PK string (`"COL1, COL2"`). */
  def parsePkColumns(pkColumns: String): Seq[String] =
    pkColumns.split(',').map(_.trim).filter(_.nonEmpty).toSeq

  /** Set-based MERGE: returns the merged table as a DataFrame.
    *
    * Matched rows take staged values for every column except `pkCols` and
    * `INSERT_TIMESTAMP`; unmatched-target rows pass through; unmatched-staged
    * rows are inserted whole.
    */
  def merge(target: DataFrame, staged: DataFrame, pkCols: Seq[String]): DataFrame = {
    require(pkCols.nonEmpty, "at least one PK column required")
    val pk = pkCols.map(_.trim)
    // presence markers make match/staged-only/target-only unambiguous even
    // when PK columns themselves contain nulls (which never match, as in the
    // reference's generated `=` MERGE condition)
    val t = target.withColumn("__t_present", lit(true)).alias("t")
    val s = staged.withColumn("__s_present", lit(true)).alias("s")
    val joined =
      t.join(s, pk.map(c => col(s"t.`$c`") === col(s"s.`$c`")).reduce(_ && _), "full_outer")

    val matched = col("t.__t_present").isNotNull && col("s.__s_present").isNotNull
    val stagedOnly = col("t.__t_present").isNull

    val outCols: Seq[Column] = target.columns.toSeq.map { c =>
      val tc = col(s"t.`$c`")
      val stagedHas = staged.columns.contains(c)
      val sc = if (stagedHas) col(s"s.`$c`") else lit(null)
      val v =
        if (pk.contains(c) || c == InsertTs)
          // PK/INSERT_TIMESTAMP: target value wins on match; staged only on insert
          when(stagedOnly, sc).otherwise(tc)
        else if (stagedHas)
          // staged wins when present (incl. UPDATE_TIMESTAMP)
          when(stagedOnly || matched, sc).otherwise(tc)
        else
          // column absent from the staged frame (schema drift): ANSI MERGE
          // only SETs staged columns, so matched rows KEEP the target value
          // — overwriting with null would silently erase data
          tc
      v.alias(c)
    }
    joined.select(outCols: _*)
  }

  /** merge + comma-string PK convenience mirroring the reference signature. */
  def merge(target: DataFrame, staged: DataFrame, pkColumns: String): DataFrame =
    merge(target, staged, parsePkColumns(pkColumns))

  /** Full reference flow (`merge_tmp_into_target_tbl`): stage → merge →
    * atomic swap on a parquet path → audit count of rows updated today
    * (`utils.py:293-295`). Returns the audit count.
    */
  def mergeAndSwap(
      spark: SparkSession,
      targetPath: String,
      staged: DataFrame,
      pkCols: Seq[String]
  ): Long = {
    val target = spark.read.parquet(targetPath)
    val merged = merge(target, staged, pkCols)
    val tmpPath = targetPath.stripSuffix("/") + "__swap_tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmpPath)
    // single-writer atomic-ish swap (Delta would make this transactional)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmpPath), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(targetPath)
    // Hadoop FS ops signal failure by RETURN VALUE, not exception — an
    // ignored false from rename after a successful delete would leave the
    // live table gone with the only copy stranded at the tmp path.
    if (!fs.delete(dst, true) && fs.exists(dst))
      throw new java.io.IOException(
        s"mergeAndSwap: could not delete $targetPath; merged data is intact at $tmpPath")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmpPath), dst))
      throw new java.io.IOException(
        s"mergeAndSwap: rename $tmpPath -> $targetPath failed; " +
          s"target was removed, RECOVER the merged table from $tmpPath")
    auditUpdatedToday(spark.read.parquet(targetPath))
  }

  /** [[mergeAndSwap]] upgraded to the snapshot-manifest commit protocol
    * ([[graft.sources.SnapshotManifest]]): the merged table is written as
    * immutable data files and becomes current via ONE atomic rename of a
    * manifest — no delete-then-rename window, object-store-safe, previous
    * snapshot readable throughout (and after a crash at any point).
    * `tableRoot` is a SnapshotManifest table; bootstrap one with
    * `SnapshotManifest.commit(spark, root, initialDf)`. The rename-swap
    * variant remains for plain parquet paths.
    *
    * @return (committed version, audit count of rows updated today)
    */
  def mergeAndCommit(
      spark: SparkSession,
      tableRoot: String,
      staged: DataFrame,
      pkCols: Seq[String]
  ): (Long, Long) = {
    val target = graft.sources.SnapshotManifest.read(spark, tableRoot)
    val version = graft.sources.SnapshotManifest.commit(
      spark, tableRoot, merge(target, staged, pkCols))
    // pin the audit to the version we just committed, not to read(): a
    // concurrent commit landing in between would make the audit describe a
    // different snapshot than the returned version
    (version, auditUpdatedToday(spark.read.parquet(
      graft.sources.SnapshotManifest.snapshotFiles(spark, tableRoot, version): _*)))
  }

  /** Write `df` as a PK-bucketed catalog table — the 100-TB merge lever
    * SCALE.md names for q06: with the target bucketed (and sorted) by its
    * PK, every subsequent [[mergeBucketedTarget]] reads the target
    * pre-partitioned on the join key, so the merge's full-outer join
    * shuffles ONLY the (much smaller) staged side; the target-side
    * Exchange — the dominant cost, since the target is the big table —
    * disappears (asserted in BucketingSpec).
    */
  def bucketTarget(df: DataFrame, table: String, pkCols: Seq[String],
      buckets: Int): Unit = {
    require(pkCols.nonEmpty, "at least one PK column required")
    df.write.bucketBy(buckets, pkCols.head, pkCols.tail: _*)
      .sortBy(pkCols.head, pkCols.tail: _*)
      .mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)
  }

  /** [[merge]] against a PK-bucketed catalog table ([[bucketTarget]]): same
    * semantics, shuffle-free on the target side. The staged side still
    * shuffles — into the target's bucket partitioning — which is the
    * correct asymmetry: staged is a delta, the target is the corpus.
    */
  def mergeBucketedTarget(spark: SparkSession, targetTable: String,
      staged: DataFrame, pkCols: Seq[String]): DataFrame =
    merge(spark.table(targetTable), staged, pkCols)

  /** Post-merge audit (`utils.py:293-295`): rows whose UPDATE_TIMESTAMP is
    * today. Filter + count — pushed to the scan where stats allow.
    */
  def auditUpdatedToday(merged: DataFrame): Long =
    merged.filter(to_date(col(UpdateTs)) === current_date()).count()

  /** Printable twin (`print_merge_query`, `utils.py:456-493`): the ANSI MERGE
    * this operator is equivalent to — for humans and for Delta catalogs.
    */
  def mergeSql(
      targetTable: String,
      stagedTable: String,
      pkCols: Seq[String],
      allCols: Seq[String]
  ): String = {
    val pk = pkCols.map(_.trim)
    val on = pk.map(c => s"""t."$c" = s."$c"""").mkString(" AND ")
    val updatable = allCols.filterNot(c => pk.contains(c) || c == InsertTs)
    val sets = updatable.map(c => s"""t."$c" = s."$c"""").mkString(", ")
    val insertCols = allCols.map(c => s""""$c"""").mkString(", ")
    val insertVals = allCols.map(c => s"""s."$c"""").mkString(", ")
    s"""MERGE INTO $targetTable t USING $stagedTable s ON ($on)
       |WHEN MATCHED THEN UPDATE SET $sets
       |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin
  }
}
