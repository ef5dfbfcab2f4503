package graft

import org.apache.spark.sql.functions._
import graft.nested.Normalize
import graft.operators.{AlertGate, SlackSink, Upsert}
import graft.sources.KeysetSource

/** SURVEY §5.2 item 4 — the full reference pipeline in one flow:
  * keyset source → recursive normalize → MERGE upsert → latest-per-key +
  * alert gate → slack sink → history append → audit count.
  */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("keyset → normalize → merge → alert gate → sink → audit") {
    val pagesDir = "/root/repo/src/test/resources/json/pages"

    // 1. incremental extract from the keyset source (full load: no watermark)
    val raw = KeysetSource.load(spark, KeysetSource.fixtureFetcher(pagesDir), maxPages = 50)
    assert(raw.count() == 7)

    // 2. normalize to DWH shape (scalar-only; lineItems exploded)
    val flat = Normalize.normalize(raw)
    assert(Normalize.isFlat(flat))
    assert(flat.count() == 10) // 7 orders → 10 rows after explode_outer

    // 3. stage + merge into a target keyed by (id, lineItems__sku)
    // PK columns must be non-null for MERGE (null never matches `=` — the
    // Exasol/reference semantics UpsertSpec pins); a real load coalesces
    val staged = flat.select(
      col("id"), coalesce(col("lineItems__sku"), lit("__none")).alias("sku"),
      col("totalPrice__amount").alias("amount"),
      lit("2024-02-01 00:00:00").cast("timestamp").alias(Upsert.InsertTs),
      lit("2024-02-01 00:00:00").cast("timestamp").alias(Upsert.UpdateTs))
    val target = staged
      .filter(col("id") < "o04") // pretend only the first pages were loaded before
      .withColumn("amount", col("amount") - 1) // stale values
      .withColumn(Upsert.InsertTs, lit("2024-01-15 00:00:00").cast("timestamp"))
      .withColumn(Upsert.UpdateTs, lit("2024-01-15 00:00:00").cast("timestamp"))
    val merged = Upsert.merge(target, staged, Seq("id", "sku"))
    assert(merged.count() == 10)
    // matched rows refreshed from staged but keep the original INSERT_TIMESTAMP
    val o01 = merged.filter(col("id") === "o01" && col("sku") === "sku-a").head()
    assert(o01.getAs[Number]("amount").doubleValue() == 100.0)
    assert(o01.getAs[java.sql.Timestamp](Upsert.InsertTs).toString.startsWith("2024-01-15"))
    assert(o01.getAs[java.sql.Timestamp](Upsert.UpdateTs).toString.startsWith("2024-02-01"))

    // 4. alert gate: orders whose amount exceeds the last alerted value by ≥100
    val candidates = merged.select(
      lit("amount_watch").alias(AlertGate.Identifier),
      col("id").alias(AlertGate.DedupKey),
      col("amount").cast("double").alias(AlertGate.DedupValue))
    val history = Seq(("amount_watch", "o05", 900.0, "2024-02-01 08:00:00"))
      .toDF(AlertGate.Identifier, AlertGate.DedupKey, AlertGate.DedupValue, AlertGate.LastAlert)
      .withColumn(AlertGate.LastAlert, col(AlertGate.LastAlert).cast("timestamp"))
    val toSend = AlertGate.shouldSend(candidates, history,
      resendThreshold = 100.0, asOfDate = lit("2024-02-01").cast("date"))
    // o05 (980 vs 900 alerted: |80| < 100) suppressed; every other key sends
    assert(!toSend.select(AlertGate.DedupKey).as[String].collect().contains("o05"))

    // 5. sink + history append
    SlackSink.memorySink.clear()
    val withMsg = toSend.withColumn("message",
      concat(lit("amount alert for "), col(AlertGate.DedupKey)))
    val sent = SlackSink.send(withMsg, "memory://e2e")
    assert(sent == withMsg.count())
    val recorded = AlertGate.recordSent(withMsg,
      sentAt = lit("2024-02-01 09:00:00").cast("timestamp"))
    assert(recorded.count() == sent)

    // 6. audit (utils.py:293-295 shape, pinned date): rows updated on merge day
    val audit = merged
      .filter(to_date(col(Upsert.UpdateTs)) === lit("2024-02-01").cast("date")).count()
    assert(audit == 10)
  }

  test("U1 property: unionByName(allowMissing) is associative over drifting column sets") {
    val a = Seq((1L, "x")).toDF("id", "only_a")
    val b = Seq((2L, 3.5)).toDF("id", "only_b")
    val c = Seq((3L, true)).toDF("id", "only_c")
    def u(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      x.unionByName(y, allowMissingColumns = true)
    val left = u(u(a, b), c)
    val right = u(a, u(b, c))
    assert(left.columns.sorted.toSeq == right.columns.sorted.toSeq)
    val l = left.select(left.columns.sorted.map(col): _*)
    val r = right.select(right.columns.sorted.map(col): _*)
    assert(l.exceptAll(r).isEmpty && r.exceptAll(l).isEmpty)
  }
}
