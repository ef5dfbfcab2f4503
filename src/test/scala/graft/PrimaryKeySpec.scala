package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{ChangeFeed, SnapshotManifest}

/** Declared primary key: the table-level row identity, the pk-less
  * diff/feed overloads, and conf-gated feed auto-materialization.
  */
class PrimaryKeySpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("pk").toString

  test("setPrimaryKey validates, persists across DML, and drives the pk-less overloads") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root,
      (1L to 50L).map(i => (i, s"v$i")).toDF("id", "x"), Seq("id"))
    intercept[IllegalArgumentException] {
      SnapshotManifest.setPrimaryKey(spark, root, Seq("nope"))
    }
    // no declaration yet: the pk-less forms fail with guidance
    intercept[IllegalArgumentException] {
      SnapshotManifest.changesBetween(spark, root, 0L, 0L)
    }
    val v1 = SnapshotManifest.setPrimaryKey(spark, root, Seq("id"))
    assert(SnapshotManifest.primaryKey(spark, root, v1) == Seq("id"))
    // the property survives a DML rewrite
    val v2 = SnapshotManifest.deleteWhere(spark, root, col("id") > 40L, Seq("id"))
    assert(SnapshotManifest.primaryKey(spark, root, v2) == Seq("id"))
    // pk-less diff == explicit-pk diff
    val a = SnapshotManifest.changesBetween(spark, root, v1, v2)
      .select(col("id"), col("_change")).as[(Long, String)].collect().toSet
    val b = SnapshotManifest.changesBetween(spark, root, v1, v2, Seq("id"))
      .select(col("id"), col("_change")).as[(Long, String)].collect().toSet
    assert(a == b && a.nonEmpty)
    // idempotent re-declare is a no-op publish
    assert(SnapshotManifest.setPrimaryKey(spark, root, Seq("id")) == v2)
  }

  test("carried properties and version diffs resolve columns case-insensitively") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root,
      (1L to 20L).map(i => (i, s"v$i")).toDF("id", "x"), Seq("id"))
    SnapshotManifest.setPrimaryKey(spark, root, Seq("id"))
    SnapshotManifest.setBloomCols(spark, root, Seq("id"))
    // a full commit whose frame differs only in column CASE must CARRY the
    // declared pk/bloom — dropping them (the old case-sensitive probe)
    // silently severs auto-CDF coverage and the point-lookup index
    val v = SnapshotManifest.commit(spark, root,
      (1L to 25L).map(i => (i, s"w$i")).toDF("ID", "X"), Seq("ID"))
    // carried properties are RE-DECLARED under the frame's casing: the
    // parquet per-column bloom option matches by exact path, so keeping
    // the old-case name would write files with no filter while the
    // manifest claims an index
    assert(SnapshotManifest.primaryKey(spark, root, v) == Seq("ID"))
    assert(SnapshotManifest.bloomCols(spark, root, v) == Seq("ID"))
    // the cross-case diff reconciles to ONE field per name (to-side casing
    // wins) instead of an ambiguous two-casing union schema
    val feed = SnapshotManifest.changesBetween(spark, root, v - 1, v, Seq("id"))
    assert(feed.columns.count(_.equalsIgnoreCase("x")) == 1)
    assert(feed.columns.contains("X") && feed.columns.contains("ID"))
    val byKind = feed.groupBy(col("_change")).count()
      .as[(String, Long)].collect().toMap
    // every surviving row's x changed (v→w): 20 update pairs + 5 inserts
    assert(byKind == Map("update_preimage" -> 20L,
      "update_postimage" -> 20L, "insert" -> 5L))
    // the old side's values flow through the case-changed union column —
    // a case-sensitive presence probe would have nulled all preimages
    assert(feed.filter(col("_change") === "update_preimage" &&
      col("X").startsWith("v")).count() == 20L)
  }

  test("pk-less feed entry points read the declared key; declared properties survive full commits") {
    val src = newRoot(); val dst = newRoot()
    SnapshotManifest.commit(spark, src,
      (1L to 40L).map(i => (i, s"v$i")).toDF("id", "x"), Seq("id"))
    SnapshotManifest.deleteWhere(spark, src, col("id") > 35L, Seq("id"))
    // two versions, no declared key: the pk-less catch-up fails with guidance
    intercept[IllegalArgumentException] {
      ChangeFeed.materializeNew(spark, src)
    }
    SnapshotManifest.setPrimaryKey(spark, src, Seq("id"))
    // a FULL commit (overwrite) must carry the declared key forward
    SnapshotManifest.commit(spark, src,
      (1L to 20L).map(i => (i, s"w$i")).toDF("id", "x"), Seq("id"))
    val cur = SnapshotManifest.currentVersion(spark, src).get
    assert(SnapshotManifest.primaryKey(spark, src, cur) == Seq("id"))
    // pk-less catch-up + pk-less replication now both work end to end
    assert(ChangeFeed.materializeNew(spark, src).nonEmpty)
    SnapshotManifest.cloneTable(spark, src, dst, version = Some(0L))
    val replica = ChangeFeed.replicateAvailableNow(spark, src, dst,
      Files.createTempDirectory("pkrepl").toString)
    assert(replica.select(col("id"), col("x")).as[(Long, String)].collect().toSet ==
      SnapshotManifest.read(spark, src)
        .select(col("id"), col("x")).as[(Long, String)].collect().toSet)
    // bloom property also persists across a full commit — and drops
    // loudly (to none) when the new frame lacks the column
    val b = newRoot()
    SnapshotManifest.commit(spark, b,
      (1L to 10L).toDF("id"), Seq("id"), Seq("id"))
    SnapshotManifest.commit(spark, b, (1L to 5L).toDF("id"), Seq("id"))
    assert(SnapshotManifest.bloomCols(spark, b,
      SnapshotManifest.currentVersion(spark, b).get) == Seq("id"))
    SnapshotManifest.commit(spark, b, Seq("a", "b").toDF("other"))
    assert(SnapshotManifest.bloomCols(spark, b,
      SnapshotManifest.currentVersion(spark, b).get).isEmpty)
  }

  test("graft.cdf.auto: every commit boundary of a pk-declared table self-materializes") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root,
      (1L to 30L).map(i => (i, s"v$i")).toDF("id", "x"), Seq("id"))
    SnapshotManifest.setPrimaryKey(spark, root, Seq("id"))
    spark.conf.set("graft.cdf.auto", "true")
    try {
      SnapshotManifest.updateWhere(spark, root, col("id") === 3L,
        Map("x" -> lit("patched")), Seq("id"))
      SnapshotManifest.deleteWhereMoR(spark, root, col("id") > 25L)
      graft.operators.Upsert.mergeWhere(spark, root,
        Seq((100L, "new")).toDF("id", "x"), Seq("id"), Seq("id"))
      // a FULL commit is a boundary too: the carried pk keeps auto-CDF
      // firing across the overwrite
      SnapshotManifest.commit(spark, root,
        (1L to 10L).map(i => (i, s"w$i")).toDF("id", "x"), Seq("id"))
      // no explicit materialize call anywhere — coverage is complete
      val cur = SnapshotManifest.currentVersion(spark, root).get
      val ranges = ChangeFeed.materializedRanges(spark, root)
      assert(ranges.map(_._2) == (1L to cur).toSeq, s"ranges were $ranges")
      // and the validated feed reads whole
      val feed = ChangeFeed.feed(spark, root, sinceVersion = Some(1L))
      assert(feed.filter(col("_change") === "insert").count() == 1L)
    } finally spark.conf.unset("graft.cdf.auto")
    // conf off: a further DML does NOT self-materialize
    SnapshotManifest.deleteWhere(spark, root, col("id") === 1L, Seq("id"))
    val cur2 = SnapshotManifest.currentVersion(spark, root).get
    assert(!ChangeFeed.materializedRanges(spark, root).exists(_._2 == cur2))
  }
}
