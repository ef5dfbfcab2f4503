package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Upsert
import graft.sources.SnapshotManifest

/** Keyed anti-join DELETE: exact fates, SQL IN null semantics, file
  * pruning, idempotence, composite keys.
  */
class DeleteKeysSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("delkeys").toString

  test("deletes exactly the named keys; null key tuples match nothing") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root,
      (1L to 100L).map(i => (i, s"v$i")).toDF("id", "x"), Seq("id"))
    val keys = Seq(Some(3L), Some(7L), None, Some(999L)).toDF("id")
    val v = Upsert.deleteKeys(spark, root, keys, Seq("id"), Seq("id"))
    assert(v == 1L)
    val left = SnapshotManifest.read(spark, root).select("id").as[Long].collect().toSet
    assert(left == ((1L to 100L).toSet -- Set(3L, 7L)))
    // idempotent: same keys again → file-pruned rewrite of the same band,
    // content unchanged
    Upsert.deleteKeys(spark, root, keys, Seq("id"), Seq("id"))
    assert(SnapshotManifest.read(spark, root).count() == 98L)
  }

  test("only stats-admitted files rewrite; the rest carry verbatim") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root,
      (1L to 1000L).toDF("id").repartitionByRange(4, col("id")), Seq("id"))
    val before = SnapshotManifest.snapshotFiles(spark, root, 0L).toSet
    val v = Upsert.deleteKeys(spark, root, Seq(5L, 10L).toDF("id"), Seq("id"), Seq("id"))
    val after = SnapshotManifest.snapshotFiles(spark, root, v).toSet
    // the low-range file was rewritten; the other three carried over
    assert((before intersect after).size == 3, s"carried ${(before intersect after).size}")
    assert(SnapshotManifest.read(spark, root).count() == 998L)
  }

  test("composite keys delete by tuple, not by component cross-product") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root,
      Seq((1L, "a", 10), (1L, "b", 20), (2L, "a", 30), (2L, "b", 40))
        .toDF("k1", "k2", "v"), Seq("k1"))
    Upsert.deleteKeys(spark, root, Seq((1L, "b"), (2L, "a")).toDF("k1", "k2"),
      Seq("k1", "k2"))
    val left = SnapshotManifest.read(spark, root)
      .select("k1", "k2").as[(Long, String)].collect().toSet
    assert(left == Set((1L, "a"), (2L, "b")))
  }

  test("no-op shapes commit nothing: empty keys, absent keys outside every file range") {
    val root = newRoot()
    val v0 = SnapshotManifest.commit(spark, root,
      (1L to 50L).toDF("id"), Seq("id"))
    assert(Upsert.deleteKeys(spark, root,
      spark.emptyDataset[Long].toDF("id"), Seq("id")) == v0)
    assert(Upsert.deleteKeys(spark, root,
      Seq(100000L).toDF("id"), Seq("id")) == v0)
  }
}
