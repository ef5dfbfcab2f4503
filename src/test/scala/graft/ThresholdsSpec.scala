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

  test("groupQuantileSummary equals the composed filter-then-aggregate path") {
    // decimal scores so the mean comparison is exact, several tie shapes
    val corpus = Seq(
      ("a", "1.25"), ("a", "2.50"), ("a", "2.50"), ("a", "3.75"),
      ("b", "10.00"), ("b", "20.00"),
      ("c", "7.00")
    ).toDF("g", "raw").select($"g", $"raw".cast("decimal(10,4)").alias("s"))
    for (q <- Seq(0.25, 0.5, 0.75, 1.0)) {
      val one = Thresholds.groupQuantileSummary(corpus, "g", "s", q)
        .withColumn("sum_kept_q", $"sum_kept_q".cast("decimal(30,4)"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDecimal(2), r.getLong(3), r.getDecimal(4),
            r.getDecimal(5)))).toMap
      // same statistics via the composed path: filter to kept rows,
      // re-aggregate (a genuine per-row sum — whole-bucket score·cnt
      // tallies must match it exactly), join the threshold back on
      val composedAligned = Thresholds.keepAboveGroupQuantile(corpus, "g", "s", q)
        .groupBy($"g")
        .agg(count(lit(1)).alias("n_kept"), min($"s").alias("min_kept_q"),
          sum($"s").cast("decimal(30,4)").alias("sum_kept_q"))
        .join(Thresholds.groupQuantileDisc(corpus, "g", "s", q)
                .select($"g", $"threshold", $"n"), Seq("g"))
        .select($"g", $"n", $"threshold", $"n_kept", $"min_kept_q", $"sum_kept_q")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDecimal(2), r.getLong(3), r.getDecimal(4),
            r.getDecimal(5)))).toMap
      assert(one == composedAligned, s"q=$q one=$one composed=$composedAligned")
    }
  }

  test("groupQuantileSummary is a single corpus aggregation (histogram-sized after)") {
    // exactly ONE aggregate reads the input; everything downstream of the
    // histogram is window+aggregate over histogram rows. Count the scan
    // nodes: the composed path pays three, the summary exactly one.
    val plan = Thresholds.groupQuantileSummary(df, "g", "s", 0.5)
      .queryExecution.optimizedPlan.toString
    val scans = "LocalRelation|LogicalRDD".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 input scan, got $scans in:\n$plan")
  }

  test("null scores are excluded everywhere; summary still equals the composed path") {
    // group a: nulls mixed in; group b: one scored row; group c: ALL null —
    // an unscored row can neither be kept nor shift the cut, and a group
    // with no scores has no quantile (absent from every operator's output)
    val corpus = Seq(
      ("a", Some("1.00")), ("a", None), ("a", Some("2.00")), ("a", Some("3.00")),
      ("b", None), ("b", Some("5.00")),
      ("c", None)
    ).toDF("g", "raw").select($"g", $"raw".cast("decimal(10,4)").alias("s"))
    val th = Thresholds.groupQuantileDisc(corpus, "g", "s", 0.5)
      .collect().map(r => r.getString(0) -> ((r.getDecimal(1).toPlainString, r.getLong(2)))).toMap
    // a: 3 scored rows, k=2 → 2.00; b: 1 scored row → 5.00; c: absent
    assert(th == Map("a" -> (("2.0000", 3L)), "b" -> (("5.0000", 1L))), th.toString)
    val one = Thresholds.groupQuantileSummary(corpus, "g", "s", 0.5)
      .withColumn("sum_kept_q", $"sum_kept_q".cast("decimal(30,4)"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2), r.getLong(3), r.getDecimal(4),
          r.getDecimal(5)))).toMap
    val composed = Thresholds.keepAboveGroupQuantile(corpus, "g", "s", 0.5)
      .groupBy($"g")
      .agg(count(lit(1)).alias("n_kept"), min($"s").alias("min_kept_q"),
        sum($"s").cast("decimal(30,4)").alias("sum_kept_q"))
      .join(Thresholds.groupQuantileDisc(corpus, "g", "s", 0.5)
              .select($"g", $"threshold", $"n"), Seq("g"))
      .select($"g", $"n", $"threshold", $"n_kept", $"min_kept_q", $"sum_kept_q")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2), r.getLong(3), r.getDecimal(4),
          r.getDecimal(5)))).toMap
    assert(one == composed && one.keySet == Set("a", "b"),
      s"one=$one composed=$composed")
    // approx sibling: same n under the same null contract
    val approxN = Thresholds.groupQuantileApprox(corpus, "g", "s", 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(approxN == Map("a" -> 3L, "b" -> 1L), approxN.toString)
  }

  test("quantile input guards") {
    intercept[IllegalArgumentException](Thresholds.groupQuantileDisc(df, "g", "s", 0.0))
    intercept[IllegalArgumentException](Thresholds.groupQuantileDisc(df, "g", "s", 1.5))
    intercept[IllegalArgumentException](Thresholds.groupQuantileApprox(df, "g", "s", -0.1))
  }
}
