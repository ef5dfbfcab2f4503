package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotManifest

/** SQL time travel through [[graft.sources.GraftCatalog]] (the
  * session-catalog extension): `VERSION AS OF` / `TIMESTAMP AS OF` on a
  * registered snapshot table resolve to the pinned snapshot — the one
  * statement shape the analyzer routes through the catalog, so the
  * delegating extension is where it lives. Non-snapshot behavior is
  * untouched (delegation).
  */
class SqlTimeTravelSpec extends SparkSpec {

  test("VERSION AS OF / TIMESTAMP AS OF on a catalog snapshot table; delegation otherwise") {
    // force-init the PLAIN shared session before any clear: if the lazy
    // SparkSpec.spark first materialized while the extension session was
    // the default, getOrCreate would hand every later suite the
    // extension session (rule pollution across suites)
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.catalog.spark_catalog", "graft.sources.GraftCatalog")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val root = java.nio.file.Files.createTempDirectory("sqltt").toString
      SnapshotManifest.commit(ext, root,
        ext.range(0, 10).toDF("id").withColumn("v", col("id")), Seq("id"))
      val tAfterV0 = System.currentTimeMillis()
      Thread.sleep(1100) // mtime granularity: separate the commits in time
      SnapshotManifest.appendRows(ext, root,
        ext.range(10, 25).toDF("id").withColumn("v", col("id")), Seq("id"))
      ext.sql(s"CREATE TABLE tt_sql USING `graft-snapshot` LOCATION '$root'")
      try {
        assert(ext.sql("SELECT count(*) FROM tt_sql").head().getLong(0) == 25L)
        assert(ext.sql("SELECT count(*) FROM tt_sql VERSION AS OF 0")
          .head().getLong(0) == 10L)
        assert(ext.sql("SELECT count(*) FROM tt_sql VERSION AS OF 1")
          .head().getLong(0) == 25L)
        // timestamp between the two commits resolves to v0
        val ts = new java.sql.Timestamp(tAfterV0).toString
        assert(ext.sql(s"SELECT count(*) FROM tt_sql TIMESTAMP AS OF '$ts'")
          .head().getLong(0) == 10L)
        // an unretained version refuses loudly
        val e = intercept[Exception] {
          ext.sql("SELECT count(*) FROM tt_sql VERSION AS OF 99").collect()
        }
        assert(e.getMessage.contains("not retained"), e.getMessage)
        // delegation: time travel on a NON-snapshot table keeps Spark's
        // own refusal
        ext.range(3).toDF("id").write.saveAsTable("tt_plain")
        try {
          val e2 = intercept[Exception] {
            ext.sql("SELECT count(*) FROM tt_plain VERSION AS OF 0").collect()
          }
          assert(e2.getMessage.contains("TIME_TRAVEL") ||
            e2.getMessage.contains("Time travel"), e2.getMessage)
        } finally ext.sql("DROP TABLE IF EXISTS tt_plain")
      } finally ext.sql("DROP TABLE IF EXISTS tt_sql")
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }
}
