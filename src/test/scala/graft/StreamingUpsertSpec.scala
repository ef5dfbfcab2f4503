package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.SnapshotManifest
import graft.streaming.StreamingUpsert

/** Streaming upsert into a snapshot table: file-pruned per-batch MERGE,
  * idempotent replay, restart resume, and manifest-line reuse across
  * batches.
  */
class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def bootstrap(): String = {
    val root = Files.createTempDirectory("supsert").toString + "/table"
    SnapshotManifest.commit(spark,
      root,
      (1L to 100L).map(i => (i, i * 10L, 0L)).toDF("id", "v", "ts")
        .repartitionByRange(4, $"id"),
      Seq("id"))
    root
  }

  test("batches merge file-pruned; updates, inserts, and within-batch dedup land") {
    val root = bootstrap()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val ckpt = Files.createTempDirectory("supsert_ck").toString
    def run() = StreamingUpsert.runAvailableNow(spark,
      mem.toDF().toDF("id", "v", "ts"), root, Seq("id"), "ts", ckpt,
      statsCols = Seq("id"))

    // batch 0: update id=10 (two deliveries — freshest wins), insert id=500
    mem.addData(Seq((10L, -1L, 1L), (10L, -2L, 2L), (500L, 7L, 1L)))
    val after0 = run()
    assert(after0.count() == 101L)
    assert(after0.filter($"id" === 10L).head().getAs[Long]("v") == -2L)
    assert(after0.filter($"id" === 500L).head().getAs[Long]("v") == 7L)
    // file-pruned: version 1 reuses manifest lines from version 0
    val shared01 = SnapshotManifest.manifestBody(spark, root, 0L).toSet intersect
      SnapshotManifest.manifestBody(spark, root, 1L).toSet
    assert(shared01.size == 3, s"expected 3 verbatim lines, got ${shared01.size}")

    // batch 1 (same checkpoint): touches a different range
    mem.addData(Seq((90L, -3L, 3L)))
    val after1 = run()
    assert(after1.filter($"id" === 90L).head().getAs[Long]("v") == -3L)
    assert(after1.filter($"id" === 10L).head().getAs[Long]("v") == -2L) // batch 0 intact
    assert(SnapshotManifest.currentVersion(spark, root).contains(2L))
  }

  test("restart with the same checkpoint resumes; replay converges (idempotent merge)") {
    val root = bootstrap()
    implicit val sqlCtx = spark.sqlContext
    val ckptRoot = Files.createTempDirectory("supsert_ck2").toString

    val mem = MemoryStream[(Long, Long, Long)]
    mem.addData(Seq((10L, -1L, 1L)))
    StreamingUpsert.runAvailableNow(spark,
      mem.toDF().toDF("id", "v", "ts"), root, Seq("id"), "ts",
      s"$ckptRoot/ck", statsCols = Seq("id"))
    assert(SnapshotManifest.read(spark, root)
      .filter($"id" === 10L).head().getAs[Long]("v") == -1L)

    // forced wholesale replay under a FRESH checkpoint (the at-least-once
    // worst case: every batch re-delivers): the merge re-applies the same
    // row state — content converges, nothing duplicates
    val mem2 = MemoryStream[(Long, Long, Long)]
    mem2.addData(Seq((10L, -1L, 1L)))
    mem2.addData(Seq((20L, -2L, 2L)))
    val out = StreamingUpsert.runAvailableNow(spark,
      mem2.toDF().toDF("id", "v", "ts"), root, Seq("id"), "ts",
      s"$ckptRoot/ck_replay", statsCols = Seq("id"))
    assert(out.count() == 100L) // no duplicated keys
    assert(out.filter($"id" === 10L).head().getAs[Long]("v") == -1L)
    assert(out.filter($"id" === 20L).head().getAs[Long]("v") == -2L)

    // restart the SAME source with its checkpoint and no new data: offset
    // log says everything committed — no effect, no duplicated work (an
    // empty-batch fire is a no-op commit by mergeWhere's isEmpty guard)
    val vBefore = SnapshotManifest.currentVersion(spark, root)
    StreamingUpsert.runAvailableNow(spark,
      mem2.toDF().toDF("id", "v", "ts"), root, Seq("id"), "ts",
      s"$ckptRoot/ck_replay", statsCols = Seq("id"))
    assert(SnapshotManifest.currentVersion(spark, root) == vBefore)
    assert(SnapshotManifest.read(spark, root).count() == 100L)
  }

  test("downstream composition: rollup refresh consumes the streamed churn incrementally") {
    val root = bootstrap()
    val roll = root + "_rollup"
    val aggs = Seq(count(lit(1)).alias("n"),
      sum($"v".cast("decimal(30,6)")).cast("double").alias("sum_v"))
    graft.operators.IncrementalRollup.refreshBy(spark, root, roll,
      Seq("id"), Seq("even" -> ($"id" % 2 === 0)), aggs)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    mem.addData(Seq((10L, 1000L, 1L), (501L, 5L, 1L)))
    StreamingUpsert.runAvailableNow(spark,
      mem.toDF().toDF("id", "v", "ts"), root, Seq("id"), "ts",
      Files.createTempDirectory("supsert_ck3").toString, statsCols = Seq("id"))
    graft.operators.IncrementalRollup.refreshBy(spark, root, roll,
      Seq("id"), Seq("even" -> ($"id" % 2 === 0)), aggs)
    val got = graft.operators.IncrementalRollup.read(spark, roll)
      .as[(Boolean, Long, Double)].collect().toMap2
    // evens: ids 2..100 step 2 → sum 10*(2+..+100) − old10 + new update
    val evenSum = (1L to 100L).filter(_ % 2 == 0).map(_ * 10L).sum - 100L + 1000L
    val oddSum = (1L to 100L).filter(_ % 2 == 1).map(_ * 10L).sum + 5L
    assert(got(true) == ((50L, evenSum.toDouble)))
    assert(got(false) == ((51L, oddSum.toDouble)))
  }

  test("streaming into an uncommitted table fails fast") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val e = intercept[IllegalArgumentException] {
      StreamingUpsert.runAvailableNow(spark,
        mem.toDF().toDF("id", "v", "ts"),
        Files.createTempDirectory("supsert_missing").toString + "/none",
        Seq("id"), "ts", Files.createTempDirectory("supsert_ck4").toString)
    }
    assert(e.getMessage.contains("bootstrap"))
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => (r._1, (r._2, r._3))).toMap
  }
}
