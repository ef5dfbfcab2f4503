package graft

import org.apache.spark.sql.functions._
import graft.functions.Functions

/** Null contracts of SURVEY §2.10 (F1, F2, N6, N7, P1, P2, P5). */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("F1 hashId: sha1 hex; null and empty → null (utils.py:46-55)") {
    val df = Seq(Some("42"), Some(""), None).toDF("id")
      .select(Functions.hashId(col("id")).alias("h"))
    val got = df.collect().map(r => Option(r.getString(0)))
    // sha1("42") — well-known digest
    assert(got(0).contains("92cfceb39d57d914ed8b14d0e37643de0797ae56"))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("F1 hashId md5/sha256 variants") {
    val df = Seq("42").toDF("id").select(
      Functions.hashId(col("id"), "md5").alias("m"),
      Functions.hashId(col("id"), "sha256").alias("s"))
    val r = df.head()
    assert(r.getString(0) == "a1d0c6e83f027327d8461063f4ac58a6")
    assert(r.getString(1).length == 64)
  }

  test("F2 parseTimestamp: ISO-8601 Z format; unparseable/nan → null (utils.py:428-440)") {
    val df = Seq("2019-12-12T15:22:04.558Z", "nan", "abc").toDF("s")
      .select(Functions.parseTimestamp(col("s")).alias("ts"))
    val got = df.collect().map(r => Option(r.getTimestamp(0)))
    assert(got(0).map(_.toString).contains("2019-12-12 15:22:04.558"))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("F3 formatCtTimestamp matches ct wire format (ct_utils.py:9-16)") {
    val df = Seq("2019-12-12T15:22:04.558Z").toDF("s")
      .select(Functions.formatCtTimestamp(
        Functions.parseTimestamp(col("s"))).alias("f"))
    assert(df.head().getString(0) == "2019-12-12T15:22:04")
  }

  test("N6 jsonPath: dotted path with integer list index; missing → null (utils.py:417-425)") {
    val json = """{"a":{"b":[{"c":"x"},{"c":"y"}]}}"""
    val df = Seq(json).toDF("j").select(
      Functions.jsonPath(col("j"), "a.b.1.c").alias("hit"),
      Functions.jsonPath(col("j"), "a.nope.c").alias("miss"))
    val r = df.head()
    assert(r.getString(0) == "y")
    assert(r.isNullAt(1))
  }

  test("N7 checkForKey: null map → null, missing key → empty, hit → value (utils.py:443-453)") {
    val df = Seq(Some(Map("id" -> "7")), Some(Map("x" -> "1")), None).toDF("m")
      .select(Functions.checkForKey(col("m"), "id").alias("v"))
    val got = df.collect().map(r => Option(r.getString(0)))
    assert(got(0).contains("7"))
    assert(got(1).contains("empty"))
    assert(got(2).isEmpty)
  }

  test("P1 selectExisting drops absent columns silently (ct_utils.py:116-119)") {
    val df = Seq((1, "a")).toDF("x", "y")
    assert(Functions.selectExisting(df, Seq("y", "zzz")).columns.toSeq == Seq("y"))
  }

  test("P2 trimColumnNames (utils.py:276)") {
    val df = Seq((1, 2)).toDF(" a ", "b ")
    assert(Functions.trimColumnNames(df).columns.toSeq == Seq("a", "b"))
  }
}
