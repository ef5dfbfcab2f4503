package graft

import graft.streaming.StreamJoin

/** Stream-stream interval join: pair emission within the lookback, exclusion
  * outside it, cross-batch buffering, and the batch twin's agreement.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("emits pairs within lookback only, across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val views = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val out = StreamJoin.intervalJoin(
      clicks.toDF().toDF("click_id", "user_id", "click_ts"),
      views.toDF().toDF("view_id", "user_id", "view_ts"),
      on = Seq("user_id"), leftTs = "click_ts", rightTs = "view_ts",
      lookback = "12 hours")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sj_pairs").start()

    // batch 1: views for user 1 at 00:00 and 09:00; user 2 at 00:00;
    // clicks: user 1 at 10:00 (both views within 12h), user 2 at 23:00
    // (its only view is 23h old — outside the lookback)
    views.addData((101L, 1L, ts("2024-01-01 00:00:00")),
      (102L, 1L, ts("2024-01-01 09:00:00")),
      (103L, 2L, ts("2024-01-01 00:00:00")))
    clicks.addData((201L, 1L, ts("2024-01-01 10:00:00")),
      (202L, 2L, ts("2024-01-01 23:00:00")))
    q.processAllAvailable()
    val pairs = spark.table("sj_pairs")
      .select("click_id", "view_id").as[(Long, Long)].collect().sorted
    assert(pairs.toSeq == Seq((201L, 101L), (201L, 102L)))

    // batch 2: a later click still matches view 103 BUFFERED IN JOIN STATE
    // from batch 1 (the cross-batch case a batch join can't hit)
    clicks.addData((203L, 2L, ts("2024-01-01 11:00:00")))
    q.processAllAvailable()
    q.stop()
    val pairs2 = spark.table("sj_pairs")
      .select("click_id", "view_id").as[(Long, Long)].collect().sorted
    assert(pairs2.toSeq == Seq((201L, 101L), (201L, 102L), (203L, 103L)))
  }

  test("streaming pairs reduce to the batch attribution result (q77 twin)") {
    // The candidate-pair semantics must equal a batch theta-join with the
    // same predicate; q77's last-touch is then row_number()=1 over these.
    val ev = Tables.load(spark, sfDir, "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("click_ts"))
    val views = ev.filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id", $"ts".as("view_ts"))
    // batch DataFrames run through the same builder (watermarks are no-ops
    // on batch plans, the join predicate is identical)
    val pairs = StreamJoin.intervalJoin(clicks, views, Seq("user_id"),
      "click_ts", "view_ts", "12 hours")
    val expected = clicks.join(views, Seq("user_id"))
      .filter($"view_ts" <= $"click_ts" &&
        $"view_ts" >= $"click_ts" - org.apache.spark.sql.functions.expr("INTERVAL 12 hours"))
    assert(pairs.count() == expected.count())
    assert(pairs.count() > 0)
    assert(pairs.except(expected.select(pairs.columns.map(org.apache.spark.sql.functions.col): _*)).isEmpty)
  }

  test("rejects ambiguous payload and identical ts names") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"), "x")).toDF("k", "lts", "payload")
    val r = Seq((1L, ts("2024-01-01 00:00:00"), "y")).toDF("k", "rts", "payload")
    intercept[IllegalArgumentException] {
      StreamJoin.intervalJoin(l, r, Seq("k"), "lts", "rts", "1 hour")
    }
    intercept[IllegalArgumentException] {
      StreamJoin.intervalJoin(l.drop("payload"), r.drop("payload").withColumnRenamed("rts", "lts"),
        Seq("k"), "lts", "lts", "1 hour")
    }
  }
}
