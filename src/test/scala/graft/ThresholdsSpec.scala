package graft

import org.apache.spark.sql.functions._
import graft.operators.Thresholds

/** Exact per-group discrete quantile over a value histogram, and the
  * keep-above filter built on it (q109's engine).
  */
class ThresholdsSpec extends SparkSpec {
  import spark.implicits._

  // group a: 1,2,2,3 (n=4); group b: 10,20 (n=2); group c: 7 (n=1)
  private def df = Seq(
    ("a", 1), ("a", 2), ("a", 2), ("a", 3),
    ("b", 10), ("b", 20),
    ("c", 7)
  ).toDF("g", "s")

  test("groupQuantileDisc picks the value at ceil(q*n), ties collapsed") {
    // q=0.5: a→k=2→score at position 2 of (1,2,2,3)=2; b→k=1→10; c→k=1→7
    val t5 = Thresholds.groupQuantileDisc(df, "g", "s", 0.5)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(t5 == Map("a" -> (2, 4L), "b" -> (10, 2L), "c" -> (7, 1L)))
    // q=1.0: the group max
    val t1 = Thresholds.groupQuantileDisc(df, "g", "s", 1.0)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(t1 == Map("a" -> 3, "b" -> 20, "c" -> 7))
    // tiny q: k clamps to 1 → the group min
    val t0 = Thresholds.groupQuantileDisc(df, "g", "s", 0.01)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(t0 == Map("a" -> 1, "b" -> 10, "c" -> 7))
    // exactly one threshold row per group even with ties at the cut
    assert(Thresholds.groupQuantileDisc(df, "g", "s", 0.75).count() == 3)
  }

  test("keepAboveGroupQuantile keeps exactly the at-or-above rows") {
    val kept = Thresholds.keepAboveGroupQuantile(df, "g", "s", 0.5)
      .select($"g", $"s").as[(String, Int)].collect().sorted.toSeq
    // a keeps 2,2,3 (>=2); b keeps 10,20 (>=10); c keeps 7
    assert(kept == Seq(("a", 2), ("a", 2), ("a", 3), ("b", 10), ("b", 20), ("c", 7)))
  }

  test("keep join broadcasts the threshold table — no corpus-side shuffle join") {
    val plan = Thresholds.keepAboveGroupQuantile(df, "g", "s", 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("groupQuantileApprox agrees with exact on bounded-cardinality scores") {
    // percentile_approx is exact when the sketch holds every distinct value
    val approx = Thresholds.groupQuantileApprox(df, "g", "s", 0.5)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val exact = Thresholds.groupQuantileDisc(df, "g", "s", 0.5)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(approx == exact)
  }

  test("quantile input guards") {
    intercept[IllegalArgumentException](Thresholds.groupQuantileDisc(df, "g", "s", 0.0))
    intercept[IllegalArgumentException](Thresholds.groupQuantileDisc(df, "g", "s", 1.5))
    intercept[IllegalArgumentException](Thresholds.groupQuantileApprox(df, "g", "s", -0.1))
  }
}
