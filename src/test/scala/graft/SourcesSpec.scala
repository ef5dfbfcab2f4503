package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.KeysetSource
import graft.streaming.IncrementalLoad

/** SURVEY §2.1 S2-S4 (keyset source), §2.11 (incremental semantics). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def writePages(dir: String): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    Files.writeString(d.resolve("page_00.json"),
      """{"id":"a","lastModifiedAt":"2024-01-01T00:00:01","v":1}
        |{"id":"b","lastModifiedAt":"2024-01-01T00:00:02","v":2}""".stripMargin)
    // page 2 drifts schema: adds "extra", drops "v" on one record
    Files.writeString(d.resolve("page_01.json"),
      """{"id":"c","lastModifiedAt":"2024-01-02T00:00:01","extra":"x"}
        |{"id":"d","lastModifiedAt":"2024-01-02T00:00:02","v":4}""".stripMargin)
  }

  test("S3 keyset load: pages unioned by name, drifting schemas null-filled (U1, ct_utils.py:258)") {
    val dir = Files.createTempDirectory("pages").toString
    writePages(dir)
    val df = KeysetSource.load(spark, KeysetSource.fixtureFetcher(dir), maxPages = 10)
    assert(df.count() == 4)
    assert(df.columns.toSet == Set("id", "lastModifiedAt", "v", "extra"))
    assert(df.filter(col("extra").isNull).count() == 3)
  }

  test("S3 watermark filters already-seen records (keyset predicate pushdown)") {
    val dir = Files.createTempDirectory("pages").toString
    writePages(dir)
    val df = KeysetSource.load(spark, KeysetSource.fixtureFetcher(dir),
      startWatermark = Some("2024-01-02T00:00:00"), maxPages = 10)
    assert(df.count() == 2)
    assert(df.select("id").as[String].collect().toSet == Set("c", "d"))
  }

  test("S3 page-size cap validated (ct_utils.py:288-290)") {
    intercept[IllegalArgumentException] {
      KeysetSource.load(spark, KeysetSource.fixtureFetcher("/nonexistent"), pageSize = 501)
    }
  }

  test("S2 offset load: limit/offset slices to exhaustion, equal to the keyset row set") {
    val dir = Files.createTempDirectory("pages").toString
    writePages(dir)
    // pageSize 3 over 4 records: one full slice + one short slice ends the loop
    val off = KeysetSource.loadOffset(spark, KeysetSource.fixtureOffsetFetcher(dir),
      pageSize = 3, maxPages = 10)
    assert(off.count() == 4)
    val key = KeysetSource.load(spark, KeysetSource.fixtureFetcher(dir), maxPages = 10)
    assert(off.select("id").as[String].collect().sorted.toSeq ==
      key.select("id").as[String].collect().sorted.toSeq)
    // maxPages bounds the iteration even when the endpoint never runs dry
    val capped = KeysetSource.loadOffset(spark, (_: Long, limit: Int) =>
      Seq.fill(limit)("""{"id":"x"}"""), pageSize = 2, maxPages = 3)
    assert(capped.count() == 6)
  }

  test("S2 offset page-size caps: 500 current, 250 legacy (commercetools_utils.py:264-266)") {
    intercept[IllegalArgumentException] {
      KeysetSource.loadOffset(spark, KeysetSource.fixtureOffsetFetcher("/nonexistent"),
        pageSize = 501)
    }
    intercept[IllegalArgumentException] {
      KeysetSource.loadOffset(spark, KeysetSource.fixtureOffsetFetcher("/nonexistent"),
        pageSize = 251, legacyLimit = true)
    }
    // 251 is fine on the current API; the fetcher is never called with an
    // empty dir beyond the first (empty) slice
    assert(KeysetSource.loadOffset(spark,
      KeysetSource.fixtureOffsetFetcher(Files.createTempDirectory("empty").toString),
      pageSize = 251).isEmpty)
  }

  test("S3 projection restricted to existing columns (P1)") {
    val dir = Files.createTempDirectory("pages").toString
    writePages(dir)
    val df = KeysetSource.load(spark, KeysetSource.fixtureFetcher(dir),
      columns = Seq("id", "v", "not_there"), maxPages = 10)
    assert(df.columns.toSeq == Seq("id", "v"))
  }

  test("S4 watermark read: MAX(ts) − overlap; empty table → None (ct_utils.py:19-37)") {
    val df = Seq("2024-01-01 00:00:10").toDF("ts").withColumn("ts", col("ts").cast("timestamp"))
    assert(KeysetSource.watermark(df, "ts", overlapSeconds = 3)
      .contains("2024-01-01T00:00:07"))
    assert(KeysetSource.watermark(df.filter(lit(false)), "ts").isEmpty)
  }

  test("§2.11 incremental mergeBatch is idempotent under overlap re-delivery") {
    val target = Seq((1L, "2024-01-01 00:00:01", "v1"))
      .toDF("pk", "ts", "payload").withColumn("ts", col("ts").cast("timestamp"))
    val batch = Seq(
      (1L, "2024-01-01 00:00:05", "v2"), // overlap re-read, newer
      (1L, "2024-01-01 00:00:03", "v1b"), // overlap re-read, older — must lose
      (2L, "2024-01-01 00:00:06", "w1")
    ).toDF("pk", "ts", "payload").withColumn("ts", col("ts").cast("timestamp"))
    val once = IncrementalLoad.mergeBatch(target, batch, Seq("pk"), "ts")
    val twice = IncrementalLoad.mergeBatch(once, batch, Seq("pk"), "ts")
    val rows = once.orderBy("pk").select("pk", "payload").as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "v2"), (2L, "w1")))
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("§2.11 windowed counts (batch twin of streaming)") {
    val df = Seq(
      ("2024-01-01 00:01:00", 1.0), ("2024-01-01 00:04:00", 2.0),
      ("2024-01-01 00:11:00", 3.0)
    ).toDF("ts", "value").withColumn("ts", col("ts").cast("timestamp"))
    val out = IncrementalLoad.windowedCounts(df, "ts", "10 minutes")
      .orderBy("window_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n") == 2L)
  }

  test("§2.11 streaming session windows with watermark (append mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:10:00"), 2.0),  // same session (gap < 30m)
      (1L, ts("2024-01-01 01:00:00"), 3.0),  // new session
      (2L, ts("2024-01-01 02:30:00"), 4.0))  // advances watermark past both
    val stream = mem.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).alias("n"))
      .select(col("session_window.start").alias("start"), col("user_id"), col("n"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("sessions_out")
      .orderBy("user_id", "start")
      .select("user_id", "n").as[(Long, Long)].collect().toSeq
    // user 1: one 2-event session + one 1-event session closed by the watermark
    assert(rows.filter(_._1 == 1L).map(_._2).sorted == Seq(1L, 2L))
  }

  test("§2.11 streaming AvailableNow: replay + idempotent merge = effectively-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:01")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:02")
    mem.addData((1L, t0, "a"), (2L, t0, "b"))
    mem.addData((2L, t1, "b2"), (3L, t1, "c")) // overlap: pk 2 re-delivered
    val stream = mem.toDF().toDF("pk", "ts", "payload")
    val initial = Seq((1L, java.sql.Timestamp.valueOf("2023-12-31 00:00:00"), "a0"))
      .toDF("pk", "ts", "payload")
    val ckpt = Files.createTempDirectory("ckpt").toString
    val state = IncrementalLoad.runAvailableNow(spark, stream, initial, Seq("pk"), "ts", ckpt)
    val rows = state.orderBy("pk").select("pk", "payload").as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
  }
}
