package graft

import org.apache.spark.sql.functions._
import graft.operators.AlertGate
import graft.schema.SchemaAudit
import org.apache.spark.sql.types._

/** SURVEY §2.12 C1 (alert gate), §2.6 W1, §2.13 (schema audit). */
class AlertGateSpec extends SparkSpec {
  import spark.implicits._

  test("W1 latestPerKey keeps exactly the newest row per key (utils.py:210-219)") {
    val df = Seq(
      ("a", 1L, "2024-01-01 10:00:00"),
      ("a", 2L, "2024-01-01 11:00:00"),
      ("b", 3L, "2024-01-01 09:00:00")
    ).toDF("k", "v", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val out = AlertGate.latestPerKey(df, Seq("k"), "ts")
      .select("k", "v").as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 2L, "b" -> 3L))
  }

  test("C1 shouldSend: no history today → send; small delta → suppressed; big delta → send (utils.py:191-234)") {
    val asOf = lit("2024-01-10").cast("date")
    val history = Seq(
      ("margin", 1L, 100.0, "2024-01-11 08:00:00"), // today's latest for key 1
      ("margin", 1L, 50.0, "2024-01-11 07:00:00"),  // older — must be ignored
      ("margin", 2L, 10.0, "2024-01-09 08:00:00")   // before asOf — ignored
    ).toDF(AlertGate.Identifier, AlertGate.DedupKey, AlertGate.DedupValue, AlertGate.LastAlert)
      .withColumn(AlertGate.LastAlert, col(AlertGate.LastAlert).cast("timestamp"))
    val candidates = Seq(
      ("margin", 1L, 120.0), // |120-100| = 20 < 50 → suppressed
      ("margin", 2L, 11.0),  // history out of window → treated as new → send
      ("margin", 3L, 5.0)    // never alerted → send
    ).toDF(AlertGate.Identifier, AlertGate.DedupKey, AlertGate.DedupValue)
    val sent = AlertGate.shouldSend(candidates, history, resendThreshold = 50.0, asOfDate = asOf)
      .select(AlertGate.DedupKey).as[Long].collect().toSet
    assert(sent == Set(2L, 3L))
  }

  test("C1 threshold 0 resends always (the reference default)") {
    val asOf = lit("2024-01-10").cast("date")
    val history = Seq(("m", 1L, 100.0, "2024-01-11 08:00:00"))
      .toDF(AlertGate.Identifier, AlertGate.DedupKey, AlertGate.DedupValue, AlertGate.LastAlert)
      .withColumn(AlertGate.LastAlert, col(AlertGate.LastAlert).cast("timestamp"))
    val cands = Seq(("m", 1L, 100.0))
      .toDF(AlertGate.Identifier, AlertGate.DedupKey, AlertGate.DedupValue)
    assert(AlertGate.shouldSend(cands, history, 0.0, asOf).count() == 1)
  }

  test("C1 null dedup value fails OPEN: unevaluable threshold still sends") {
    val asOf = lit("2024-01-10").cast("date")
    val history = Seq(("m", 1L, Some(100.0), "2024-01-11 08:00:00"))
      .toDF(AlertGate.Identifier, AlertGate.DedupKey, AlertGate.DedupValue, AlertGate.LastAlert)
      .withColumn(AlertGate.LastAlert, col(AlertGate.LastAlert).cast("timestamp"))
    val cands = Seq(("m", 1L, Option.empty[Double]))
      .toDF(AlertGate.Identifier, AlertGate.DedupKey, AlertGate.DedupValue)
    // null − 100.0 is null; the gate must send rather than silently suppress
    assert(AlertGate.shouldSend(cands, history, 50.0, asOf).count() == 1)
  }

  test("A3 maxColumnLengths: one-pass observed lengths (utils.py:520)") {
    val df = Seq(("abc", 1234), ("x", 7)).toDF("s", "i")
    assert(SchemaAudit.maxColumnLengths(df) == Map("s" -> 3L, "i" -> 4L))
  }

  test("E1 widenPlan: widen VARCHAR/DECIMAL, flag others for manual review (utils.py:496-538)") {
    val observed = Map("a" -> 10L, "b" -> 5L, "c" -> 99L)
    val declared = Map("a" -> ("VARCHAR", 5L), "b" -> ("VARCHAR", 5L), "c" -> ("TIMESTAMP", 10L))
    val (widens, manual) = SchemaAudit.widenPlan(observed, declared)
    assert(widens == Seq(SchemaAudit.Widen("a", "VARCHAR", 10L)))
    assert(manual == Seq("c"))
    assert(widens.head.alterSql("s.t") == "ALTER TABLE s.t ALTER COLUMN a TYPE VARCHAR(10)")
  }

  test("E1 DECIMAL widen preserves scale, and without a known scale goes to manual") {
    val observed = Map("d" -> 9L, "e" -> 9L)
    val declared = Map("d" -> ("DECIMAL", 6L), "e" -> ("DECIMAL", 6L))
    // no scale known: DECIMAL(9) would mean scale 0 and truncate fractions —
    // must be a manual-review item, never an emitted ALTER
    val (w0, m0) = SchemaAudit.widenPlan(observed, declared)
    assert(w0.isEmpty && m0.toSet == Set("d", "e"))
    val (w1, m1) = SchemaAudit.widenPlan(observed, declared, Map("d" -> 2L))
    assert(w1 == Seq(SchemaAudit.Widen("d", "DECIMAL", 9L, Some(2L))) && m1 == Seq("e"))
    assert(w1.head.alterSql("s.t") == "ALTER TABLE s.t ALTER COLUMN d TYPE DECIMAL(9,2)")
  }

  test("E3 schemaDiff reports added/removed/retyped (dlt_utils.py:8-40)") {
    val cur = StructType(Seq(StructField("a", StringType), StructField("b", LongType)))
    val inc = StructType(Seq(StructField("b", StringType), StructField("c", DoubleType)))
    val diff = SchemaAudit.schemaDiff("t", cur, inc)
    assert(diff.map(d => (d.column, d.change)).toSet ==
      Set(("c", "added"), ("a", "removed"), ("b", "retyped")))
  }
}
