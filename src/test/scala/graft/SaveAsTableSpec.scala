package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotManifest

/** `df.write.format("graft-snapshot").saveAsTable(name)`: create-table-
  * as-select through the catalog — the table registers AND bootstraps in
  * one statement, and subsequent appends/SQL reads flow through the same
  * paths as CREATE TABLE + INSERT.
  */
class SaveAsTableSpec extends SparkSpec {

  test("saveAsTable creates + bootstraps; append mode adds a version; SQL reads serve it") {
    val shared = spark // force-init the plain shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.catalog.spark_catalog", "graft.sources.GraftCatalog")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val loc = java.nio.file.Files.createTempDirectory("satspec").toString + "/t"
      try {
        ext.range(0, 10).toDF("id").withColumn("v", col("id") * 2L)
          .write.format("graft-snapshot").option("path", loc)
          .option("statsCols", "id").saveAsTable("sat_t")
        assert(SnapshotManifest.currentVersion(ext, loc).contains(0L))
        assert(ext.sql("SELECT sum(v) FROM sat_t").head().getLong(0) == 90L)
        // append through the SAME entry point
        ext.range(10, 15).toDF("id").withColumn("v", col("id") * 2L)
          .write.format("graft-snapshot").option("path", loc)
          .mode("append").saveAsTable("sat_t")
        assert(SnapshotManifest.currentVersion(ext, loc).contains(1L))
        assert(ext.sql("SELECT count(*) FROM sat_t").head().getLong(0) == 15L)
        // and the engine API sees the same table
        assert(SnapshotManifest.read(ext, loc).count() == 15L)
      } finally ext.sql("DROP TABLE IF EXISTS sat_t")
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }
}
