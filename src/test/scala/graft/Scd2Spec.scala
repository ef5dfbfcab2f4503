package graft

import org.apache.spark.sql.functions._
import graft.operators.Scd2

/** SCD2 builder: change compression, interval chaining, current-row flag. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // key 1: A A B A (the repeat A at t2 collapses; A reappears at t4 → new row)
  // key 2: single row, always current
  private def log = Seq(
    (1L, "A", ts("2024-01-01 00:00:00"), 1L),
    (1L, "A", ts("2024-01-02 00:00:00"), 2L),
    (1L, "B", ts("2024-01-03 00:00:00"), 3L),
    (1L, "A", ts("2024-01-04 00:00:00"), 4L),
    (2L, "X", ts("2024-01-01 12:00:00"), 5L)
  ).toDF("k", "attr", "ts", "id")

  test("collapseUnchanged drops consecutive duplicates only") {
    val out = Scd2.collapseUnchanged(log, Seq("k"), Seq("ts", "id"), Seq("attr"))
      .select($"id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 3L, 4L, 5L)) // id 2 collapsed; id 4 (A again) kept
  }

  test("fromChangeLog chains intervals and flags exactly one current row per key") {
    val out = Scd2.fromChangeLog(log, Seq("k"), "ts", Seq("attr"), Seq("id"))
      .select($"k", $"attr", $"valid_from", $"valid_to", $"is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))
      .sortBy(r => (r._1, r._3.getTime))
    val k1 = out.filter(_._1 == 1L)
    assert(k1.map(_._2).toSeq == Seq("A", "B", "A"))
    // intervals chain: each valid_to equals the next valid_from
    assert(k1.init.zip(k1.tail).forall { case (a, b) => a._4.contains(b._3) })
    assert(k1.count(_._5) == 1 && k1.last._5)
    val k2 = out.filter(_._1 == 2L)
    assert(k2.length == 1 && k2.head._5 && k2.head._4.isEmpty)
  }

  test("transition to/from a null attribute counts as a change") {
    val log = Seq(
      (1L, Some("A"), ts("2024-01-01 00:00:00"), 1L),
      (1L, Option.empty[String], ts("2024-01-02 00:00:00"), 2L), // A -> null
      (1L, Option.empty[String], ts("2024-01-03 00:00:00"), 3L), // null (unchanged)
      (1L, Some("A"), ts("2024-01-04 00:00:00"), 4L)             // null -> A
    ).toDF("k", "attr", "ts", "id")
    val kept = Scd2.collapseUnchanged(log, Seq("k"), Seq("ts", "id"), Seq("attr"))
      .select($"id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 4L))
  }

  test("same-timestamp changes stay deterministic via tie-break column") {
    val clash = Seq(
      (1L, "A", ts("2024-01-01 00:00:00"), 1L),
      (1L, "B", ts("2024-01-01 00:00:00"), 2L)
    ).toDF("k", "attr", "ts", "id")
    val out = Scd2.fromChangeLog(clash, Seq("k"), "ts", Seq("attr"), Seq("id"))
      .select($"id", $"is_current").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> false, 2L -> true))
  }
}
