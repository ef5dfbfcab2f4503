package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.PrefixSum

/** Two-pass global prefix sum vs the single-partition window it replaces:
  * bit-identical results (decimal accumulation), bucket-boundary coverage,
  * empty input.
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("matches single-partition window running sum exactly") {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_totalprice")
    val twoPass = PrefixSum.runningTotal(df, "o_orderkey", "o_totalprice", buckets = 16)
      .select($"o_orderkey", $"running_total".cast("double").alias("rt"))
    val w = Window.orderBy($"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val single = df
      .withColumn("rt", sum($"o_totalprice".cast("decimal(30,6)")).over(w).cast("double"))
      .select($"o_orderkey", $"rt")
    assert(twoPass.exceptAll(single).isEmpty && single.exceptAll(twoPass).isEmpty)
  }

  test("degenerate bucket counts still correct (1 bucket; more buckets than rows)") {
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    for (b <- Seq(1, 64)) {
      val out = PrefixSum.runningTotal(df, "k", "v", buckets = b)
        .select($"k", $"running_total".cast("double"))
        .as[(Long, Double)].collect().sortBy(_._1)
      assert(out.toSeq == Seq((1L, 10.0), (2L, 30.0), (3L, 60.0)), s"buckets=$b")
    }
  }

  test("null order key fails fast instead of silently dropping rows") {
    val df = Seq((Some(1L), 1.0), (None, 2.0), (Some(3L), 3.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      PrefixSum.runningTotal(df, "k", "v")
    }
    assert(e.getMessage.contains("null"))
  }

  test("all-null value bucket contributes 0, does not NPE") {
    // 2 buckets: keys 1,2 land in bucket 0 with only-null values
    val df = Seq((1L, None), (2L, None), (100L, Some(5.0)), (101L, Some(7.0)))
      .toDF("k", "v")
    val out = PrefixSum.runningTotal(df, "k", "v", buckets = 2)
      .select($"k", $"running_total".cast("double")).as[(Long, Option[Double])]
      .collect().toMap
    assert(out(100L).contains(5.0) && out(101L).contains(12.0))
  }

  test("empty input yields empty output with the result column") {
    val df = Seq((1L, 1.0)).toDF("k", "v").filter($"k" < 0)
    val out = PrefixSum.runningTotal(df, "k", "v")
    assert(out.columns.contains("running_total"))
    assert(out.isEmpty)
  }
}
