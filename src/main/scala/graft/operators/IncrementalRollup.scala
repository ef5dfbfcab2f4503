package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.SnapshotManifest

/** Incremental materialized-rollup maintenance over [[SnapshotManifest]]
  * tables — the warehouse pattern behind every "aggregate table refreshed
  * after each load" job in the reference (its nightly pandas rebuilds,
  * e.g. `sql_utils.py:60-78`'s aggregate loads), re-expressed so the
  * refresh cost tracks the CHURN, not the table:
  *
  *   - the rollup is itself a snapshot table: `groupKeys ++ agg columns ++
  *     __src_version` (the source version the row set reflects — riding in
  *     the table keeps refresh state transactional with the data: a crash
  *     between "compute" and "commit" leaves the previous generation fully
  *     current, and there is no side-channel state file to desync)
  *   - [[refresh]] diffs the source between the last-reflected and current
  *     versions ([[SnapshotManifest.changesBetween]] — file-level pruned,
  *     reads only churned files), finds the TOUCHED groups (any group a
  *     feed row's pre- or post-image lands in), recomputes ONLY those
  *     groups from the current snapshot, and stitches them onto the
  *     untouched rollup rows. ANY aggregate works — min/max/distinct/
  *     percentile — because touched groups recompute from source truth;
  *     a group whose rows all vanished drops out naturally.
  *   - [[refreshAdditive]] is the zero-source-scan fast path for purely
  *     additive aggregates (SUM/COUNT): feed rows apply as signed deltas
  *     (insert/post-image +, delete/pre-image −), so the refresh never
  *     touches the source table at all — the 100 TB lever when the rollup
  *     is sums over a churning fact table.
  *
  * 100 TB shape: changesBetween scans only files unique to one manifest
  * side; the touched-group recompute is a semi-join (broadcastable — the
  * touched-key set is churn-sized) + one partial-final aggregation; the
  * rollup rewrite is |groups|-sized, orders of magnitude under the fact
  * table. Refreshes are idempotent: re-running against the same source
  * version is a no-op (version equality short-circuits before any scan).
  */
object IncrementalRollup {

  private val VersionCol = "__src_version"

  /** The current rollup contents — the operator's OWN bookkeeping columns
    * (the reflected-version stamp, additive `__nn_` non-null counts and
    * `__s_` exact decimal sums) dropped; user columns keep whatever names
    * they have.
    */
  def read(spark: SparkSession, rollupRoot: String): DataFrame = {
    val df = SnapshotManifest.read(spark, rollupRoot)
    // only the operator's OWN bookkeeping prefixes — a blanket __ filter
    // would swallow user columns that legitimately start with __
    df.drop(df.columns.filter(c => c == VersionCol ||
      c.startsWith("__nn_") || c.startsWith("__s_")).toIndexedSeq: _*)
  }

  /** The reflected version of `lastV` is usable for an incremental diff
    * only while the source still has its manifest — a vacuumed from-version
    * falls back to a full rebuild (correct at any time; the incremental
    * path is an optimization, never a semantic dependency).
    */
  private def canDiffFrom(spark: SparkSession, sourceRoot: String, lastV: Long): Boolean =
    SnapshotManifest.hasVersion(spark, sourceRoot, lastV)

  /** Source version the rollup currently reflects, if it is known. Every
    * committed row carries the same stamp, so ONE row answers (no full
    * scan). None when the rollup doesn't exist OR is empty (an empty
    * source at build time leaves no row to carry the stamp) — both fall
    * back to the full-build path, which is correct and idempotent either
    * way.
    */
  def reflectedVersion(spark: SparkSession, rollupRoot: String): Option[Long] =
    SnapshotManifest.currentVersion(spark, rollupRoot).flatMap { _ =>
      SnapshotManifest.read(spark, rollupRoot)
        .select(col(VersionCol)).limit(1).collect()
        .headOption.map(_.getLong(0))
    }

  /** Bring the rollup at `rollupRoot` up to date with the source snapshot
    * table at `sourceRoot`.
    *
    * @param sourcePk  row identity of the SOURCE table (changesBetween's
    *                  contract: each snapshot is pk-unique)
    * @param groupKeys rollup grouping columns
    * @param aggs      aliased aggregate columns (e.g. `sum($"x").as("sum_x")`)
    *                  — applied identically on full build and touched-group
    *                  recompute, so any deterministic aggregate is legal
    * @return the committed rollup version (current version when already
    *         up to date)
    */
  def refresh(spark: SparkSession, sourceRoot: String, rollupRoot: String,
      sourcePk: Seq[String], groupKeys: Seq[String], aggs: Seq[Column]): Long =
    refreshBy(spark, sourceRoot, rollupRoot, sourcePk,
      groupKeys.map(k => k -> col(k)), aggs)

  /** [[refresh]] with DERIVED group keys — each `(name, expr)` is computed
    * from the source row (e.g. `"day" -> to_date($"ts")`, or a literal for
    * a global rollup). The change feed carries every source column, so the
    * same expressions evaluate on pre- and post-images to find touched
    * groups.
    */
  def refreshBy(spark: SparkSession, sourceRoot: String, rollupRoot: String,
      sourcePk: Seq[String], groupExprs: Seq[(String, Column)],
      aggs: Seq[Column]): Long = {
    require(groupExprs.nonEmpty, "refresh: groupExprs must name at least one key")
    require(aggs.nonEmpty, "refresh: aggs must name at least one aggregate")
    val srcV = SnapshotManifest.currentVersion(spark, sourceRoot).getOrElse(
      throw new IllegalStateException(s"refresh: no committed source snapshot under $sourceRoot"))
    // a DERIVED key reusing a source column's name would silently overwrite
    // that column before aggregation (withColumn semantics) — only the
    // identity mapping (refresh()'s own k -> col(k)) may share a name
    val srcCols = SnapshotManifest.read(spark, sourceRoot).columns.toSet
    // identity via the Column's public rendering (col("k").toString == "k"):
    // the unresolved expressions carry call-site Origins that defeat both
    // == and semanticEquals
    groupExprs.foreach { case (n, e) =>
      require(!srcCols.contains(n) || e.toString == col(n).toString,
        s"refreshBy: derived group key '$n' collides with a source column — " +
          "a non-identity expression under that name would overwrite the " +
          "column every aggregate reads; pick a fresh key name")
    }
    reflectedVersion(spark, rollupRoot) match {
      case Some(lastV) if lastV == srcV =>
        SnapshotManifest.currentVersion(spark, rollupRoot).get // already current
      case Some(lastV) if canDiffFrom(spark, sourceRoot, lastV) =>
        SnapshotManifest.commit(spark, rollupRoot,
          incrementalMerge(spark, sourceRoot, rollupRoot, sourcePk, groupExprs,
            aggs, lastV, srcV).withColumn(VersionCol, lit(srcV)))
      case _ => // no rollup yet, or the from-version was vacuumed → full build
        SnapshotManifest.commit(spark, rollupRoot,
          aggregateBy(SnapshotManifest.read(spark, sourceRoot), groupExprs, aggs)
            .withColumn(VersionCol, lit(srcV)))
    }
  }

  /** The change rows for `(lastV, srcV]`: the MATERIALIZED feed when it
    * covers the span ([[graft.sources.ChangeFeed]] — many consumers then
    * share ONE persisted diff instead of each re-running the version
    * diff), [[SnapshotManifest.changesBetween]] otherwise. The per-commit
    * feed may carry intermediate images a collapsed diff would drop
    * (insert-then-delete inside the span); every consumer here is
    * invariant to them — touched-group detection only widens (correctly),
    * additive deltas telescope, and the sketch path treats any delete as
    * a recompute trigger.
    */
  private def changeRows(spark: SparkSession, sourceRoot: String,
      sourcePk: Seq[String], lastV: Long, srcV: Long): DataFrame = {
    val materialized =
      try Some(graft.sources.ChangeFeed.feed(spark, sourceRoot,
        sinceVersion = Some(lastV), untilVersion = Some(srcV))
        .drop("_commit_version"))
      catch { case _: IllegalStateException => None } // gap/absent → compute
    materialized.getOrElse(
      SnapshotManifest.changesBetween(spark, sourceRoot, lastV, srcV, sourcePk))
  }

  private def withKeys(rows: DataFrame, groupExprs: Seq[(String, Column)]): DataFrame =
    groupExprs.foldLeft(rows) { case (d, (n, e)) => d.withColumn(n, e) }

  private def aggregateBy(rows: DataFrame, groupExprs: Seq[(String, Column)],
      aggs: Seq[Column]): DataFrame =
    withKeys(rows, groupExprs)
      .groupBy(groupExprs.map(g => col(g._1)): _*).agg(aggs.head, aggs.tail: _*)

  /** The incremental-refresh frame [[refreshBy]] commits (exposed for plan
    * assertions): untouched rollup rows stitched onto recomputed touched
    * groups.
    */
  private[graft] def incrementalMerge(spark: SparkSession, sourceRoot: String,
      rollupRoot: String, sourcePk: Seq[String], groupExprs: Seq[(String, Column)],
      aggs: Seq[Column], lastV: Long, srcV: Long): DataFrame = {
    val names = groupExprs.map(_._1)
    val feed = changeRows(spark, sourceRoot, sourcePk, lastV, srcV)
    // any group a change row's pre- OR post-image lands in is stale: a
    // row moving between groups invalidates both
    val touched = withKeys(feed, groupExprs).select(names.map(col): _*).distinct()
    val source = SnapshotManifest.readVersion(spark, sourceRoot, srcV)
    val keyCond = (l: String, r: String) =>
      names.map(k => col(s"$l.$k") <=> col(s"$r.$k")).reduce(_ && _)
    // churn-sized key set: broadcast both the semi (source side) and the
    // anti (rollup side) so neither big table shuffles for membership
    val recomputed = aggregateBy(
      withKeys(source, groupExprs).alias("s")
        .join(broadcast(touched.alias("t")), keyCond("s", "t"), "left_semi"),
      groupExprs.map(g => g._1 -> col(g._1)), aggs)
    val untouched = SnapshotManifest.read(spark, rollupRoot).drop(VersionCol)
      .alias("r").join(broadcast(touched.alias("t")), keyCond("r", "t"), "left_anti")
    untouched.unionByName(recomputed)
  }

  /** Approx-distinct rollup: per group, an HLL sketch of `distinctCol`
    * (DataSketches `hll_sketch_agg`, `lgConfigK` buckets) maintained
    * mergeable-union style. Sketches admit inserts but not retractions,
    * so the refresh is HYBRID per group:
    *   - groups touched ONLY by inserts: `hll_union(old sketch, sketch of
    *     the inserted rows)` — no source scan, the append-heavy fast path
    *     (at 100 TB this is the usual case: fact tables append);
    *   - groups touched by any delete/update: recomputed from the current
    *     snapshot (the same touched-group machinery as [[refresh]]);
    *   - untouched groups carry their sketch unchanged.
    * Read estimates via [[readDistinctCounts]]. The estimate is a pure
    * function of the SET of sketched values (HLL registers are max-based,
    * LIST/SET modes count coupons), so incremental maintenance and a
    * from-scratch rebuild agree exactly — the spec pins that.
    */
  def refreshDistinctSketch(spark: SparkSession, sourceRoot: String,
      rollupRoot: String, sourcePk: Seq[String], groupKeys: Seq[String],
      distinctCol: String, lgConfigK: Int = 12): Long = {
    require(groupKeys.nonEmpty, "refreshDistinctSketch: groupKeys must name at least one column")
    val srcV = SnapshotManifest.currentVersion(spark, sourceRoot).getOrElse(
      throw new IllegalStateException(
        s"refreshDistinctSketch: no committed source snapshot under $sourceRoot"))
    // surface the sketch's input-type contract HERE, not as an analysis
    // error three plans deep inside a refresh
    val dt = SnapshotManifest.read(spark, sourceRoot).schema(distinctCol).dataType
    require(Set("integer", "long", "string", "binary").contains(dt.typeName),
      s"refreshDistinctSketch: hll_sketch_agg supports int/bigint/string/binary; " +
        s"'$distinctCol' is ${dt.typeName} — cast it in the source (pick the form " +
        "that defines value identity)")
    def build(rows: DataFrame): DataFrame =
      rows.groupBy(groupKeys.map(col): _*)
        .agg(hll_sketch_agg(col(distinctCol), lit(lgConfigK)).alias("distinct_sketch"))
    reflectedVersion(spark, rollupRoot) match {
      case Some(lastV) if lastV == srcV =>
        SnapshotManifest.currentVersion(spark, rollupRoot).get
      case None =>
        SnapshotManifest.commit(spark, rollupRoot,
          build(SnapshotManifest.read(spark, sourceRoot)).withColumn(VersionCol, lit(srcV)))
      case Some(lastV) if !canDiffFrom(spark, sourceRoot, lastV) =>
        // the from-version was vacuumed → full rebuild (always correct)
        SnapshotManifest.commit(spark, rollupRoot,
          build(SnapshotManifest.read(spark, sourceRoot)).withColumn(VersionCol, lit(srcV)))
      case Some(lastV) =>
        val feed = changeRows(spark, sourceRoot, sourcePk, lastV, srcV)
          .localCheckpoint(true) // consumed thrice below; the feed is churn-sized
        val keyCond = (l: String, r: String) =>
          groupKeys.map(k => col(s"$l.$k") <=> col(s"$r.$k")).reduce(_ && _)
        // a group with ANY non-insert change needs source truth (no
        // retraction from a sketch); insert-only groups union
        val dirty = feed.filter(col("_change") =!= "insert")
          .select(groupKeys.map(col): _*).distinct()
        val inserts = feed.filter(col("_change") === "insert")
          .alias("i").join(broadcast(dirty.alias("t")), keyCond("i", "t"), "left_anti")
        val recomputed = build(
          SnapshotManifest.readVersion(spark, sourceRoot, srcV).alias("s")
            .join(broadcast(dirty.alias("t")), keyCond("s", "t"), "left_semi"))
        val rollup = SnapshotManifest.read(spark, rollupRoot).drop(VersionCol)
          .alias("r").join(broadcast(dirty.alias("t")), keyCond("r", "t"), "left_anti")
        val insSketch = build(inserts)
        val unioned = rollup.alias("r")
          .join(insSketch.alias("d"),
            groupKeys.map(k => col(s"r.$k") <=> col(s"d.$k")).reduce(_ && _), "full_outer")
          .select(groupKeys.map(k => coalesce(col(s"r.$k"), col(s"d.$k")).alias(k)) :+
            when(col("r.distinct_sketch").isNull, col("d.distinct_sketch"))
              .when(col("d.distinct_sketch").isNull, col("r.distinct_sketch"))
              .otherwise(hll_union(col("r.distinct_sketch"), col("d.distinct_sketch")))
              .alias("distinct_sketch"): _*)
        SnapshotManifest.commit(spark, rollupRoot,
          unioned.unionByName(recomputed).withColumn(VersionCol, lit(srcV)))
    }
  }

  /** Per-group approximate distinct counts from a
    * [[refreshDistinctSketch]] rollup.
    */
  def readDistinctCounts(spark: SparkSession, rollupRoot: String): DataFrame =
    read(spark, rollupRoot)
      .withColumn("approx_distinct", hll_sketch_estimate(col("distinct_sketch")))
      .drop("distinct_sketch")

  /** Additive-only refresh: maintain `sum_<m>` per measure plus `n_rows`,
    * applying the change feed as signed deltas — the source table itself is
    * NEVER scanned after the initial build. Sums ride DECIMAL(30,6) (exact,
    * order-independent — a delta stream must not accumulate float error)
    * end to end: the STORED bookkeeping column `__s_<m>` is the exact
    * decimal running sum, and the user-facing `sum_<m>` double is a derived
    * view of it recomputed at every commit. Deriving (rather than storing
    * only the double and re-entering decimal on the next merge) matters
    * past |sum| ≈ 2^53/10^6: beyond that a double cannot carry six decimal
    * places, so a double round-trip would absorb a rounding residue into
    * every subsequent refresh — the exact column makes an arbitrarily long
    * refresh chain bit-equal to a from-scratch aggregation. Groups whose
    * row count reaches zero drop out.
    * Null measures contribute nothing to their sum (SQL SUM semantics) but
    * do count toward `n_rows`; a per-measure non-null count rides along as
    * a `__nn_`-prefixed bookkeeping column so a sum whose surviving inputs
    * are all null lands on NULL (SQL SUM), not 0 — deltas alone cannot tell
    * "sums to zero" from "nothing left to sum".
    */
  def refreshAdditive(spark: SparkSession, sourceRoot: String, rollupRoot: String,
      sourcePk: Seq[String], groupKeys: Seq[String], measures: Seq[String]): Long = {
    require(groupKeys.nonEmpty, "refreshAdditive: groupKeys must name at least one column")
    val srcV = SnapshotManifest.currentVersion(spark, sourceRoot).getOrElse(
      throw new IllegalStateException(
        s"refreshAdditive: no committed source snapshot under $sourceRoot"))
    val dec = "decimal(30,6)"
    def sums(rows: DataFrame, sign: Column, rowWeight: Column): DataFrame =
      rows.groupBy(groupKeys.map(col): _*).agg(
        sum(rowWeight).alias("n_rows"),
        measures.flatMap(m => Seq(
          sum(when(col(m).isNotNull, sign * col(m).cast(dec))
            .otherwise(lit(null))).alias(s"__d_$m"),
          sum(when(col(m).isNotNull, sign.cast("long")).otherwise(lit(0L)))
            .alias(s"__dn_$m"))): _*)
    def finish(df: DataFrame): DataFrame =
      df.select(groupKeys.map(col) ++ (col("n_rows") +:
        measures.flatMap { m =>
          val s = coalesce(col(s"__d_$m"), lit(0).cast(dec)).cast(dec)
          Seq(
            when(col(s"__dn_$m") === 0, lit(null))
              .otherwise(s.cast("double")).alias(s"sum_$m"),
            s.alias(s"__s_$m"),
            col(s"__dn_$m").alias(s"__nn_$m"))
        }): _*)
    // a rollup written before the __s_/__nn_ bookkeeping existed can't
    // merge incrementally (the delta arithmetic needs the exact sums and
    // non-null counts) — rebuild it once instead of wedging every future
    // refresh
    val hasBookkeeping = SnapshotManifest.currentVersion(spark, rollupRoot).exists { _ =>
      val cols = SnapshotManifest.read(spark, rollupRoot).columns.toSet
      measures.forall(m => cols.contains(s"__nn_$m") && cols.contains(s"__s_$m"))
    }
    reflectedVersion(spark, rollupRoot) match {
      case Some(lastV) if lastV == srcV && hasBookkeeping =>
        SnapshotManifest.currentVersion(spark, rollupRoot).get
      case Some(lastV) if hasBookkeeping && canDiffFrom(spark, sourceRoot, lastV) =>
        val feed = changeRows(spark, sourceRoot, sourcePk, lastV, srcV)
        val signed = feed.withColumn("__sign",
          when(col("_change").isin("insert", "update_postimage"), lit(1))
            .otherwise(lit(-1)))
        val delta = sums(signed, col("__sign"), col("__sign").cast("long"))
        val rollup = SnapshotManifest.read(spark, rollupRoot).drop(VersionCol)
        val keyCond = groupKeys.map(k => col(s"r.$k") <=> col(s"d.$k")).reduce(_ && _)
        // full outer: new groups appear (rollup side absent), dead groups
        // drop (count reaches 0), existing groups add their delta. The
        // addition runs entirely on the stored exact decimals (__s_ +
        // feed delta) — the surfaced double is a derived view, never an
        // input, so no refresh ever re-enters decimal through a lossy
        // double. NULL-vs-0: the merged non-null count decides, exactly as
        // SQL SUM over the surviving rows would.
        val merged = rollup.alias("r").join(delta.alias("d"), keyCond, "full_outer")
          .select(groupKeys.map(k => coalesce(col(s"r.$k"), col(s"d.$k")).alias(k)) ++
            ((coalesce(col("r.n_rows"), lit(0L)) + coalesce(col("d.n_rows"), lit(0L)))
              .alias("n_rows") +:
              measures.flatMap { m =>
                val nn = coalesce(col(s"r.__nn_$m"), lit(0L)) +
                  coalesce(col(s"d.__dn_$m"), lit(0L))
                val s = (coalesce(col(s"r.__s_$m"), lit(0).cast(dec)) +
                  coalesce(col(s"d.__d_$m"), lit(0).cast(dec))).cast(dec)
                Seq(
                  when(nn === 0, lit(null))
                    .otherwise(s.cast("double")).alias(s"sum_$m"),
                  s.alias(s"__s_$m"),
                  nn.alias(s"__nn_$m"))
              }): _*)
          .filter(col("n_rows") > 0)
        SnapshotManifest.commit(spark, rollupRoot,
          merged.withColumn(VersionCol, lit(srcV)))
      case _ => // no rollup yet, or the from-version was vacuumed → full build
        SnapshotManifest.commit(spark, rollupRoot,
          finish(sums(SnapshotManifest.read(spark, sourceRoot), lit(1), lit(1L)))
            .withColumn(VersionCol, lit(srcV)))
    }
  }
}
