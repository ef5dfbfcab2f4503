package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** As-of join contracts: backward match, inclusive ties, null when no
  * preceding right row, per-key isolation.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    ("k1", 5L, "l1"), ("k1", 10L, "l2"), ("k1", 2L, "l3"),
    ("k2", 7L, "l4"),
    ("k3", 9L, "l5") // key with no right rows at all
  ).toDF("k", "ts", "lv")

  private def right = Seq(
    ("k1", 3L, "r@3"), ("k1", 5L, "r@5"), ("k1", 8L, "r@8"),
    ("k2", 99L, "r@99")
  ).toDF("k", "ts", "rv")
    .withColumnRenamed("ts", "rts")

  test("backward as-of: latest right row with rts <= ts, inclusive at equality") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts")
      .select($"k", $"ts", $"lv", $"rv").as[(String, Long, String, String)]
      .collect().map(r => (r._1, r._2) -> r._4).toMap
    assert(out(("k1", 2L)) == null)      // nothing at or before 2
    assert(out(("k1", 5L)) == "r@5")     // inclusive: rts == ts wins
    assert(out(("k1", 10L)) == "r@8")    // latest preceding
    assert(out(("k2", 7L)) == null)      // right row is in the future
    assert(out(("k3", 9L)) == null)      // key absent on right
  }

  test("left row count and columns are preserved") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts")
    assert(out.count() == left.count())
    assert(out.columns.toSeq == Seq("k", "ts", "lv", "rv"))
  }

  test("forward as-of: earliest right row with rts >= ts, inclusive at equality") {
    val out = AsOfJoin.forward(left, right, Seq("k"), "ts", "rts")
      .select($"k", $"ts", $"rv").as[(String, Long, String)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("k1", 2L)) == "r@3")     // next at or after 2
    assert(out(("k1", 5L)) == "r@5")     // inclusive at equality
    assert(out(("k1", 10L)) == null)     // nothing after 10
    assert(out(("k2", 7L)) == "r@99")    // future right row now matches
    assert(out(("k3", 9L)) == null)      // key absent on right
  }

  test("rejects payload columns that shadow left columns") {
    val clashing = right.withColumnRenamed("rv", "lv") // same name as a left col
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, clashing, Seq("k"), "ts", "rts")
    }
    assert(e.getMessage.contains("lv"))
  }

  test("rejects user columns named like join internals") {
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left.withColumn("__side", lit(1)), right, Seq("k"), "ts", "rts")
    }
    assert(e.getMessage.contains("__side"))
  }

  test("multiple payload columns travel together from the same right row") {
    val r2 = right.withColumn("rv2", concat($"rv", lit("-x")))
    val out = AsOfJoin.backward(left, r2, Seq("k"), "ts", "rts")
      .filter($"ts" === 10L && $"k" === "k1").head()
    assert(out.getAs[String]("rv") == "r@8" && out.getAs[String]("rv2") == "r@8-x")
  }
}
