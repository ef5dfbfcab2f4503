package graft

/** Streaming tumbling-window aggregation under a watermark: windows emit
  * exactly once when the watermark passes their end, and events later than
  * the watermark are dropped (the bounded-state contract that makes
  * unbounded streams aggregatable).
  */
class WatermarkAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("window emits on watermark pass; beyond-watermark events are dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, count, window}
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val agg = mem.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(col("event_id")).alias("n"))
      .select(col("window.start").alias("w_start"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_agg").start()

    // batch 1: three events in the 00:00 window, one in 00:10
    mem.addData((1L, ts("2024-01-01 00:01:00")), (2L, ts("2024-01-01 00:05:00")),
      (3L, ts("2024-01-01 00:09:00")), (4L, ts("2024-01-01 00:11:00")))
    q.processAllAvailable()
    // append mode: nothing final yet (watermark = max(ts) - 10m = 00:01,
    // no window end <= it)
    assert(spark.table("wm_agg").count() == 0)

    // batch 2: event at 00:30 pushes the watermark to 00:20 — the 00:00
    // window (end 00:10 <= 00:20) and the 00:10 window (end 00:20 <= 00:20)
    // both finalize
    mem.addData((5L, ts("2024-01-01 00:30:00")))
    q.processAllAvailable()
    val emitted = spark.table("wm_agg").as[(java.sql.Timestamp, Long)]
      .collect().sortBy(_._1.getTime)
    assert(emitted.toSeq == Seq((ts("2024-01-01 00:00:00"), 3L),
      (ts("2024-01-01 00:10:00"), 1L)))

    // batch 3: a straggler for the already-finalized 00:00 window arrives
    // beyond the watermark — dropped, the emitted result never changes
    // (append mode's exactly-once-per-window contract)
    mem.addData((6L, ts("2024-01-01 00:02:00")))
    q.processAllAvailable()
    q.stop()
    val after = spark.table("wm_agg").as[(java.sql.Timestamp, Long)]
      .collect().sortBy(_._1.getTime)
    assert(after.toSeq == emitted.toSeq)
  }
}
