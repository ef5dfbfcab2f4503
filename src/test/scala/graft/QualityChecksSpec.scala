package graft

import org.apache.spark.sql.functions._
import graft.schema.QualityChecks
import graft.schema.QualityChecks._

/** One-pass expectation checks: metric math, null conventions, empty input. */
class QualityChecksSpec extends SparkSpec {
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame, checks: Seq[Check]) =
    QualityChecks.run(df, checks)
      .as[(String, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap

  test("metrics: null fraction, dup fraction, range, predicate with null-as-violation") {
    val df = Seq(
      (Some(1L), 10.0, Some("a")),
      (Some(1L), 20.0, Some("b")),   // dup id
      (None, 999.0, Some("a")),      // null id, out of range
      (Some(2L), 30.0, None)         // null category -> predicate violation
    ).toDF("id", "v", "cat")
    val out = report(df, Seq(
      NotNull("id", maxNullFrac = 0.3),
      Unique(Seq("id")),
      InRange("v", 0, 100, maxOutFrac = 0.25),
      Satisfies("cat_known", col("cat").isin("a", "b"))))
    assert(out("not_null_id")._2 == 0.25 && out("not_null_id")._4)
    // 4 rows, 2 distinct non-null ids -> 2 "dups" (null-keyed rows count
    // toward the total, not the distinct) -> 0.5, fails at 0.0
    assert(out("unique_id")._2 == 0.5 && !out("unique_id")._4)
    assert(out("in_range_v")._2 == 0.25 && out("in_range_v")._4)
    assert(out("cat_known")._2 == 0.25 && !out("cat_known")._4)
  }

  test("empty input: all metrics 0, all checks pass, still one row per check") {
    val df = Seq.empty[(Option[Long], Double)].toDF("id", "v")
    val out = report(df, Seq(NotNull("id"), InRange("v", 0, 1)))
    assert(out.size == 2 && out.values.forall(r => r._2 == 0.0 && r._4))
  }

  test("exactly one aggregate in the plan regardless of check count") {
    val df = Seq((1L, 2.0)).toDF("id", "v")
    val many = Seq(NotNull("id"), NotNull("v"), InRange("v", 0, 10),
      Satisfies("pos", col("v") > 0), Unique(Seq("id", "v")))
    val plan = QualityChecks.run(df, many).queryExecution.optimizedPlan.toString
    // one Aggregate over the data (plus its partial stage at runtime); no
    // join/union fan-out of the input
    assert(!plan.contains("Join") && !plan.contains("Union"), plan)
  }
}
