package graft

import java.nio.file.Files
import java.util.concurrent.{Callable, CountDownLatch, Executors, TimeUnit}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.SnapshotManifest

/** Vacuum under concurrency: the `minAgeMs` age guard must protect an
  * IN-FLIGHT commit's staging (unreferenced only because its manifest has
  * not published yet) from a racing sweep — the genuine multi-thread race
  * spec the commit-point ones set the style for.
  */
class VacuumRaceSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("vacrace").toString

  private def fsFor(root: String) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  test("age guard: a fresh unreferenced staging dir survives; minAgeMs=0 documents the sweep") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "x"), Seq("id"))
    // simulate an in-flight commit: a staged-but-unpublished data dir, the
    // exact on-disk state between writeDataFiles and the manifest publish
    val (fs, rootPath) = fsFor(root)
    val staged = new Path(rootPath, new Path("data", "v00000001-inflight1"))
    Seq((3L, "c")).toDF("id", "x").write.parquet(staged.toString)
    // a guarded vacuum (any real retention window) leaves it alone
    SnapshotManifest.vacuum(spark, root, keep = 1, minAgeMs = 60000L)
    assert(fs.exists(staged), "in-flight staging swept despite the age guard")
    // the preview agrees (plan, not accident)
    assert(!SnapshotManifest.vacuumPreview(spark, root, keep = 1,
      minAgeMs = 60000L).dataDirs.exists(_.contains("inflight1")))
    // an UNGUARDED vacuum (minAgeMs=0) does sweep it — the documented
    // reason production vacuums must pass a retention window
    SnapshotManifest.vacuum(spark, root, keep = 1, minAgeMs = 0L)
    assert(!fs.exists(staged))
  }

  test("racing committers vs a guarded vacuum loop: every commit lands, nothing corrupts") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root,
      (0L until 20L).map(i => (i, s"v$i")).toDF("id", "x"), Seq("id"))
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    try {
      // writer: 6 sequential content commits (each stages a dir, then
      // publishes its manifest — the window a racing sweep could hit)
      val writer = pool.submit(new Callable[Long] {
        def call(): Long = {
          start.await(5, TimeUnit.SECONDS)
          (1 to 6).foreach { i =>
            graft.operators.Upsert.mergeWhere(spark, root,
              Seq((i.toLong, s"w$i")).toDF("id", "x"), Seq("id"), Seq("id"))
          }
          SnapshotManifest.currentVersion(spark, root).get
        }
      })
      // vacuum loop: guarded sweeps racing the writer's staging windows
      val sweeper = pool.submit(new Callable[Int] {
        def call(): Int = {
          start.await(5, TimeUnit.SECONDS)
          var sweeps = 0
          while (!writer.isDone) {
            SnapshotManifest.vacuum(spark, root, keep = 1, minAgeMs = 60000L)
            sweeps += 1
          }
          sweeps
        }
      })
      start.countDown()
      val finalVersion = writer.get(120, TimeUnit.SECONDS)
      val sweeps = sweeper.get(120, TimeUnit.SECONDS)
      assert(sweeps >= 1, "the vacuum loop never ran against the writer")
      assert(finalVersion == 6L)
      // every merge landed and the final state reads clean
      val got = SnapshotManifest.read(spark, root).as[(Long, String)].collect().toMap
      assert(got.size == 20)
      (1 to 6).foreach(i => assert(got(i.toLong) == s"w$i"))
      // age-guarded sweeps reclaimed no version the writer still needed:
      // every retained version stays readable
      SnapshotManifest.listVersions(spark, root).foreach { v =>
        assert(SnapshotManifest.readVersion(spark, root, v).count() == 20L)
      }
    } finally pool.shutdownNow()
  }
}
