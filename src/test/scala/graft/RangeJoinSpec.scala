package graft

import org.apache.spark.sql.functions.col

/** Banded large×large range/overlap joins vs their theta forms. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.RangeJoin

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)

  test("bandedRange ≡ theta join across band widths, incl. boundary and null cases") {
    val points = Seq(0.0, 0.5, 9.99, 10.0, 10.01, 25.0, 99.9, 100.0, -5.0, -0.1)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("pid", "v")
      .unionByName(Seq((100L, Option.empty[Double])).toDF("pid", "v"))
    val intervals = Seq(
      (1L, 0.0, 10.0),      // aligned to band edges
      (2L, 5.0, 15.0),      // straddles a boundary
      (3L, 9.99, 10.01),    // tiny, crosses boundary
      (4L, -10.0, 0.0),     // negative range
      (5L, 20.0, 20.0),     // empty (lo == hi) — matches nothing
      (6L, 50.0, 40.0)      // inverted — matches nothing
    ).toDF("iid", "lo", "hi")
    val theta = points.join(intervals,
      col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(0.5, 1.0, 7.0, 10.0, 1000.0)) {
      val banded = RangeJoin.bandedRange(points, intervals, "v", "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(banded == theta, s"bandWidth=$w: $banded != $theta")
    }
  }

  test("bandedRange: fp collapse of hi/w onto a point's band cannot drop the match") {
    // the IEEE-754 hazard the inclusive upper band exists for: with w=0.1,
    // both 0.9/0.1 and 0.9000000000000001/0.1 evaluate to exactly 9.0, so a
    // "tight" exclusive band (ceil(hi/w)-1 = 8) would exclude the band the
    // matching point 0.9 lands in — a silent missing row
    val points = Seq((1L, 0.9)).toDF("pid", "v")
    val intervals = Seq((1L, 0.8, 0.9000000000000001)).toDF("iid", "lo", "hi")
    val banded = RangeJoin.bandedRange(points, intervals, "v", "lo", "hi", 0.1)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(banded == Seq((1L, 1L)), s"fp-collapse match dropped: $banded")
  }

  test("bandedRange refuses non-finite interval bounds loudly (theta would match; silence = wrong answer)") {
    val points = Seq((1L, 5.0)).toDF("pid", "v")
    // NaN/Infinity on EITHER side must raise — a NaN lo would otherwise be
    // silently swallowed by the validity filter (Spark orders NaN largest)
    for ((lo, hi) <- Seq((1.0, Double.NaN), (1.0, Double.PositiveInfinity),
        (Double.NaN, 5.0), (Double.NegativeInfinity, 5.0))) {
      val bad = Seq((1L, lo, hi)).toDF("iid", "lo", "hi")
      val e = intercept[Exception] {
        RangeJoin.bandedRange(points, bad, "v", "lo", "hi", bandWidth = 1.0).count()
      }
      assert(messages(e).exists(_.contains("non-finite")),
        s"lo=$lo hi=$hi: ${messages(e)}")
    }
    // aligned intervals explode to at most lo-band + the over-covering
    // hi-band (the documented ≤1-extra-band cost of the fp-safe inclusive
    // bound); a REAL point keeps the plan from collapsing to empty
    val aligned = Seq((1L, 0.0, 10.0), (2L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    val out = RangeJoin.bandedRange(
      points, aligned, "v", "lo", "hi", bandWidth = 10.0,
      maxBandsPerInterval = 2)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L)), s"got $out") // cap=2 admits; results exact
  }

  test("bandedOverlap ≡ theta overlap join; each pair exactly once across band widths") {
    val left = Seq(
      (1L, 0.0, 10.0), (2L, 5.0, 35.0), (3L, 9.99, 10.01), (4L, -10.0, 0.0),
      (5L, 20.0, 20.0), (6L, 50.0, 40.0), (7L, 100.0, 101.0)
    ).toDF("lid", "l_lo", "l_hi")
    val right = Seq(
      (10L, 8.0, 12.0), (11L, 30.0, 60.0), (12L, -20.0, -5.0), (13L, 10.0, 20.0)
    ).toDF("rid", "r_lo", "r_hi")
    // theta over WELL-FORMED intervals: the naive overlap predicate would
    // spuriously match the inverted (empty) interval 6 — bandedOverlap
    // documents empty-matches-nothing, the stricter and correct contract
    val theta = left.filter(col("l_lo") < col("l_hi"))
      .join(right.filter(col("r_lo") < col("r_hi")),
        col("l_lo") < col("r_hi") && col("r_lo") < col("l_hi"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    for (w <- Seq(1.0, 7.0, 10.0, 100.0)) {
      val banded = RangeJoin.bandedOverlap(left, right,
        "l_lo", "l_hi", "r_lo", "r_hi", w)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq
      // sequence equality (not sets): a pair sharing several bands must
      // appear exactly once — the first-overlap-band dedup
      assert(banded.sorted == theta.sorted, s"bandWidth=$w: $banded != $theta")
    }
  }

  test("bandedRange skew guard fails loudly on an interval spanning too many bands") {
    val points = Seq((1L, 5.0)).toDF("pid", "v")
    val wide = Seq((1L, 0.0, 1000.0)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.bandedRange(points, wide, "v", "lo", "hi",
        bandWidth = 1.0, maxBandsPerInterval = 10).count()
    }
    assert(messages(e).exists(_.contains("bandedRange")), s"got: ${messages(e)}")
  }
}
