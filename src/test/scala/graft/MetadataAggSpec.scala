package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.SnapshotManifest

/** O(manifest) aggregates: COUNT(*)/MIN/MAX answered from recorded
  * per-file stats, with scan fallbacks exactly where metadata cannot be
  * exact (stats-less files, deletion vectors, transformed-domain types).
  */
class MetadataAggSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("metaagg").toString
  private def hfs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Physically delete every data file of the current snapshot — after
    * this, ONLY a metadata-answered aggregate can still respond.
    */
  private def destroyDataFiles(root: String): Unit = {
    val fs = hfs(root)
    val v = SnapshotManifest.currentVersion(spark, root).get
    SnapshotManifest.snapshotFiles(spark, root, v).foreach(f =>
      assert(fs.delete(new Path(f), false)))
  }

  test("countRows and minMax answer from metadata alone (data files destroyed)") {
    val root = newRoot()
    val df = spark.range(1L, 10001L).select(col("id"),
      concat(lit("u"), lpad(col("id").cast("string"), 6, "0")).alias("name"))
      .repartition(4)
    SnapshotManifest.commit(spark, root, df, Seq("id", "name"))
    // a RECORDED schema makes minMax's type resolution driver-only too
    // (without one, a single footer read resolves the column type)
    SnapshotManifest.addColumns(spark, root, Seq(
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.StringType, nullable = true)))
    destroyDataFiles(root)
    assert(SnapshotManifest.countRows(spark, root) == 10000L)
    val (mn, mx) = SnapshotManifest.minMax(spark, root, "id")
    assert(mn.contains(BigDecimal(1)) && mx.contains(BigDecimal(10000)))
    val (smn, smx) = SnapshotManifest.minMax(spark, root, "name")
    assert(smn.contains("u000001") && smx.contains("u010000"))
  }

  test("stats-less files fall back to a scan of just those files") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root,
      spark.range(100L).toDF("id"))  // no stats recorded
    assert(SnapshotManifest.countRows(spark, root) == 100L)
    val (mn, mx) = SnapshotManifest.minMax(spark, root, "id")
    assert(mn.contains(BigDecimal(0)) && mx.contains(BigDecimal(99)))
  }

  test("deletion vectors force a scan of the DV'd files only, and stay exact") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root,
      spark.range(1L, 1001L).toDF("id").repartitionByRange(4, col("id")),
      Seq("id"))
    // MoR-delete the global maximum and a band
    SnapshotManifest.deleteWhereMoR(spark, root,
      col("id") === 1000L || col("id").between(1L, 10L))
    assert(SnapshotManifest.countRows(spark, root) == 1000L - 11L)
    val (mn, mx) = SnapshotManifest.minMax(spark, root, "id")
    assert(mn.contains(BigDecimal(11)), s"min was $mn")
    assert(mx.contains(BigDecimal(999)), s"max was $mx")
  }

  test("mixed table: exact metadata files fold with scanned files") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root,
      spark.range(1L, 501L).toDF("id").repartitionByRange(2, col("id")),
      Seq("id"))
    // an UNSTATTED merge append extends the key range upward
    graft.operators.Upsert.mergeWhere(spark, root,
      Seq(9999L).toDF("id"), Seq("id"), statsCols = Nil)
    assert(SnapshotManifest.countRows(spark, root) == 501L)
    val (mn, mx) = SnapshotManifest.minMax(spark, root, "id")
    assert(mn.contains(BigDecimal(1)) && mx.contains(BigDecimal(9999)))
  }

  test("all-null and empty shapes; transformed-domain types scan correctly") {
    val root = newRoot()
    val df = Seq((1L, Option.empty[String], java.sql.Timestamp.valueOf("2024-01-02 03:04:05")),
      (2L, Option.empty[String], java.sql.Timestamp.valueOf("2024-06-07 08:09:10")))
      .toDF("id", "s", "ts")
    SnapshotManifest.commit(spark, root, df, Seq("id", "s"))
    // all-null stats column: no bounds, still exact
    assert(SnapshotManifest.minMax(spark, root, "s") == (None, None))
    // timestamp stats live in a transformed domain → scan fallback,
    // native values out
    val (tmn, tmx) = SnapshotManifest.minMax(spark, root, "ts")
    assert(tmn.contains(java.sql.Timestamp.valueOf("2024-01-02 03:04:05")))
    assert(tmx.contains(java.sql.Timestamp.valueOf("2024-06-07 08:09:10")))
    // empty table: count 0, bounds absent
    val root2 = newRoot()
    SnapshotManifest.commit(spark, root2, spark.range(10L).toDF("id"), Seq("id"))
    SnapshotManifest.deleteWhere(spark, root2, lit(true), Seq("id"))
    assert(SnapshotManifest.countRows(spark, root2) == 0L)
    assert(SnapshotManifest.minMax(spark, root2, "id") == (None, None))
  }

  test("non-finite float extremes return as raw doubles under Spark's total order") {
    val root = newRoot()
    // stats-less commit → the whole column resolves through the scan path
    SnapshotManifest.commit(spark, root,
      Seq(1.0, 2.5, Double.PositiveInfinity, -3.0).toDF("x"))
    val (mn, mx) = SnapshotManifest.minMax(spark, root, "x")
    assert(mn.contains(BigDecimal(-3.0)))
    assert(mx.contains(Double.PositiveInfinity))
    // mixed: a statted finite file folds against a scanned infinite one
    graft.operators.Upsert.mergeWhere(spark, root,
      Seq(100.0).toDF("x"), Seq("x"), statsCols = Seq("x"))
    val (mn2, mx2) = SnapshotManifest.minMax(spark, root, "x")
    assert(mn2.contains(BigDecimal(-3.0)) && mx2.contains(Double.PositiveInfinity))
  }

  test("analyzeTable retrofits stats without touching data; metadata aggs then answer") {
    val root = newRoot()
    // stats-LESS bootstrap + a stats-less append: pruning power is zero
    SnapshotManifest.commit(spark, root,
      (1L to 400L).map(i => (i, i * 2.0)).toDF("id", "x")
        .repartitionByRange(2, col("id")))
    graft.operators.Upsert.mergeWhere(spark, root,
      Seq((9999L, 5.0)).toDF("id", "x"), Seq("id"), statsCols = Nil)
    val filesBefore = SnapshotManifest.snapshotFiles(spark, root,
      SnapshotManifest.currentVersion(spark, root).get)
    val v = SnapshotManifest.analyzeTable(spark, root, Seq("id", "x"))
    // metadata-only: the same data files, byte for byte
    assert(SnapshotManifest.snapshotFiles(spark, root, v) == filesBefore)
    // stats now answer: countRows/minMax fold from metadata (prove it by
    // destroying the data — only metadata can still respond)
    SnapshotManifest.addColumns(spark, root, Seq(
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.StringType, nullable = true)))
    destroyDataFiles(root)
    assert(SnapshotManifest.countRows(spark, root) == 401L)
    val (mn, mx) = SnapshotManifest.minMax(spark, root, "id")
    assert(mn.contains(BigDecimal(1)) && mx.contains(BigDecimal(9999)))
    // already-analyzed: a second call is a no-op (no new version)
    assert(SnapshotManifest.analyzeTable(spark, root, Seq("id")) ==
      SnapshotManifest.currentVersion(spark, root).get)
  }

  test("analyzeTable merges new columns into existing stats and fills widened columns as all-null") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root,
      (1L to 50L).map(i => (i, s"n$i")).toDF("id", "name"), Seq("id"))
    // widen, then analyze the NEW column: old stats (id) must survive,
    // the widened column records all-null for pre-widening files
    SnapshotManifest.addColumns(spark, root, Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    SnapshotManifest.analyzeTable(spark, root, Seq("score"))
    val v = SnapshotManifest.currentVersion(spark, root).get
    val stats = SnapshotManifest.snapshotFileStats(spark, root, v)
    assert(stats.nonEmpty)
    stats.values.foreach { fs =>
      assert(fs.cols.contains("id"), "pre-existing id stats dropped")
      val sc = fs.cols("score")
      assert(sc.min.isEmpty && sc.nulls == fs.rows, "widened col should be all-null")
    }
    assert(SnapshotManifest.minMax(spark, root, "score") == (None, None))
  }

  test("unknown column fails loudly") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root, spark.range(5L).toDF("id"))
    intercept[IllegalArgumentException] {
      SnapshotManifest.minMax(spark, root, "nope")
    }
  }
}
