package graft

import org.apache.spark.sql.functions._
import graft.core.Diagnostics
import graft.operators.{AlertGate, SlackSink}

/** S11 Slack sink + C6 diagnostics + the end-to-end alert pipeline
  * (SURVEY §2.12: gate → sink → history append).
  */
class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("S11 slack sink delivers every message (memory transport) (utils.py:138-156)") {
    SlackSink.memorySink.clear()
    val df = Seq("alert one", "alert two").toDF("message")
    val n = SlackSink.send(df, "memory://test")
    assert(n == 2)
    val got = SlackSink.memorySink.toArray.map(_.toString).toSet
    assert(got == Set("alert one", "alert two"))
  }

  test("S11 payload is JSON-escaped") {
    assert(SlackSink.payload("""a "b" \ c""") == """{"text": "a \"b\" \\ c"}""")
    assert(SlackSink.payload("line1\nline2") == """{"text": "line1\nline2"}""")
  }

  test("C6 diagnostics: summary and capped render (utils.py:357-386)") {
    val df = Seq((1, "a"), (2, "b")).toDF("x", "y")
    assert(Diagnostics.summarize(df) == "2 rows, 2 cols: [x, y]")
    val r = Diagnostics.render(df.orderBy("x"), maxRows = 1)
    assert(r == "x | y\n1 | a")
  }

  test("C1 end-to-end: gate → slack sink → history append (utils.py usage contract)") {
    SlackSink.memorySink.clear()
    val asOf = lit("2024-01-10").cast("date")
    val history = Seq(("m", 1L, 100.0, "2024-01-11 08:00:00"))
      .toDF(AlertGate.Identifier, AlertGate.DedupKey, AlertGate.DedupValue, AlertGate.LastAlert)
      .withColumn(AlertGate.LastAlert, col(AlertGate.LastAlert).cast("timestamp"))
    val cands = Seq(("m", 1L, 120.0), ("m", 2L, 7.0))
      .toDF(AlertGate.Identifier, AlertGate.DedupKey, AlertGate.DedupValue)
    val sent = AlertGate.shouldSend(cands, history, resendThreshold = 10.0, asOfDate = asOf)
      .withColumn("message",
        concat(lit("value drift for key "), col(AlertGate.DedupKey)))
    assert(SlackSink.send(sent, "memory://test") == 2) // |120-100|=20 ≥ 10 and new key
    val recorded = AlertGate.recordSent(sent,
      sentAt = lit("2024-01-11 09:00:00").cast("timestamp"))
    assert(recorded.columns.toSeq == Seq(AlertGate.Identifier, AlertGate.LastAlert,
      AlertGate.DedupKey, AlertGate.DedupValue, "message"))
    assert(recorded.count() == 2)
  }
}
