package graft

import java.nio.file.Files
import java.util.concurrent.{Callable, CountDownLatch, Executors, TimeUnit}
import org.apache.spark.sql.functions._
import graft.sources.SnapshotManifest

/** Exactly-once BATCH appends via manifest txn records (Delta's
  * txnAppId/txnVersion): a re-run of the same `(appId, txnVersion)` lands
  * nothing, the record survives every verb including a full commit, and a
  * genuine race between two instances of the same job resolves to exactly
  * one landed batch.
  */
class IdempotentAppendSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("idemp").toString

  private def base(root: String): Unit =
    SnapshotManifest.commit(spark, root,
      spark.range(0, 50).toDF("id").withColumn("x", lit("base"))
        .repartitionByRange(5, col("id")), Seq("id"))

  private def slice(lo: Long, hi: Long, tag: String) =
    spark.range(lo, hi).toDF("id").withColumn("x", lit(tag))

  test("re-running the same (appId, txnVersion) is a committed-nothing no-op") {
    val root = newRoot(); base(root)
    val v1 = SnapshotManifest.appendRowsIdempotent(spark, root,
      slice(100, 110, "d1"), "daily_load", 1L, Seq("id"))
    assert(v1 == 1L)
    // the driver died after commit, the orchestrator re-runs the batch
    val v1b = SnapshotManifest.appendRowsIdempotent(spark, root,
      slice(100, 110, "d1"), "daily_load", 1L, Seq("id"))
    assert(v1b == 1L, "re-run must skip, not double-append")
    assert(SnapshotManifest.read(spark, root).count() == 60L)
    // a LOWER version is also a replay — skipped
    assert(SnapshotManifest.appendRowsIdempotent(spark, root,
      slice(100, 110, "d0"), "daily_load", 0L, Seq("id")) == 1L)
    // the next batch advances
    val v2 = SnapshotManifest.appendRowsIdempotent(spark, root,
      slice(110, 120, "d2"), "daily_load", 2L, Seq("id"))
    assert(v2 == 2L)
    assert(SnapshotManifest.txnVersion(spark, root, "daily_load").contains(2L))
    assert(SnapshotManifest.txnVersion(spark, root, "other").isEmpty)
    assert(SnapshotManifest.read(spark, root).count() == 70L)
  }

  test("txn records survive DML verbs AND a full commit; apps are independent") {
    val root = newRoot(); base(root)
    SnapshotManifest.appendRowsIdempotent(spark, root,
      slice(100, 105, "a"), "app_a", 7L, Seq("id"))
    SnapshotManifest.appendRowsIdempotent(spark, root,
      slice(200, 205, "b"), "app_b", 3L, Seq("id"))
    SnapshotManifest.deleteWhere(spark, root, col("id") < 10L, Seq("id"))
    SnapshotManifest.updateWhere(spark, root, col("id") === 20L,
      Map("x" -> lit("u")), Seq("id"))
    assert(SnapshotManifest.txnVersion(spark, root, "app_a").contains(7L))
    assert(SnapshotManifest.txnVersion(spark, root, "app_b").contains(3L))
    // a FULL overwrite keeps the records (like pk/bloom)
    SnapshotManifest.commit(spark, root,
      spark.range(0, 30).toDF("id").withColumn("x", lit("rebuilt")), Seq("id"))
    assert(SnapshotManifest.txnVersion(spark, root, "app_a").contains(7L))
    // ... so the replayed batch still skips after the rebuild
    assert(SnapshotManifest.appendRowsIdempotent(spark, root,
      slice(100, 105, "a"), "app_a", 7L, Seq("id"))
      == SnapshotManifest.currentVersion(spark, root).get)
    assert(SnapshotManifest.read(spark, root).count() == 30L)
  }

  test("two racing instances of the same (appId, txnVersion) land exactly one batch") {
    val root = newRoot(); base(root)
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    try {
      def racer() = pool.submit(new Callable[Long] {
        def call(): Long = {
          start.await()
          SnapshotManifest.appendRowsIdempotent(spark, root,
            slice(300, 310, "once"), "same_job", 5L, Seq("id"),
            backoff = _ => scala.concurrent.duration.Duration.Zero,
            sleep = _ => ())
        }
      })
      val (a, b) = (racer(), racer())
      start.countDown()
      val (va, vb) = (a.get(60, TimeUnit.SECONDS), b.get(60, TimeUnit.SECONDS))
      // both calls "succeed" (the semantic contract: the batch is in) and
      // exactly one version landed it
      assert(va == 1L && vb == 1L, s"got $va, $vb")
      assert(SnapshotManifest.read(spark, root)
        .filter(col("x") === "once").count() == 10L)
      assert(SnapshotManifest.txnVersion(spark, root, "same_job").contains(5L))
    } finally pool.shutdownNow()
  }
}
