package graft

import scala.concurrent.duration._
import graft.core.{Deployment, Retry}
import graft.sources.{SheetSource, SqlScript}

/** SURVEY §2.12 — control-flow operators (C2, C3) + driver-side sources. */
class CoreSpec extends SparkSpec {

  test("C2 deployment truth table matches the reference's 9 branches (utils.py:58-114)") {
    import Deployment.shouldRun
    // both flags false → never run
    assert(!shouldRun(None, prod = false, dev = false))
    assert(!shouldRun(Some("prod"), prod = false, dev = false))
    assert(!shouldRun(Some("dev"), prod = false, dev = false))
    // env unset → run
    assert(shouldRun(None))
    // both true → run everywhere
    assert(shouldRun(Some("prod")) && shouldRun(Some("dev")))
    // prod-only
    assert(shouldRun(Some("prod"), prod = true, dev = false))
    assert(!shouldRun(Some("dev"), prod = true, dev = false))
    // dev-only
    assert(shouldRun(Some("dev"), prod = false, dev = true))
    assert(!shouldRun(Some("prod"), prod = false, dev = true))
    // unknown env falls through the reference's table → run
    assert(shouldRun(Some("staging")))
  }

  test("C3 retry: linear backoff (attempt+1)×base, ≤6 attempts (gs_utils.py:51-63)") {
    var calls = 0
    var sleeps = List.empty[FiniteDuration]
    val out = Retry.retry(6, Retry.linearBackoff(10.seconds), d => sleeps :+= d) {
      calls += 1
      if (calls < 4) sys.error("transient")
      "ok"
    }
    assert(out == "ok" && calls == 4)
    assert(sleeps == List(10.seconds, 20.seconds, 30.seconds))
  }

  test("C3 retry exhausts and rethrows after maxAttempts") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.retry(3, Retry.linearBackoff(1.millis), _ => ()) {
        calls += 1; sys.error("always")
      }
    }
    assert(e.getMessage == "always" && calls == 3)
  }

  test("S5 sheet source: header promotion + ragged row padding (gs_utils.py:68-70)") {
    val df = SheetSource.fromValues(spark, Seq(
      Seq("a", "b", "c"),
      Seq("1", "2", "3"),
      Seq("4", "5"),
      Seq("6", "7", "8")))
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    assert(df.count() == 3)
    assert(df.filter(df("c").isNull).count() == 1)
  }

  test("S5 sheet headers: duplicates uniquified, blanks become positional names") {
    val df = SheetSource.fromValues(spark, Seq(
      Seq("name", "name", "", "name"),
      Seq("1", "2", "3", "4")))
    assert(df.columns.toSeq == Seq("name", "name_2", "col_2", "name_3"))
    assert(df.select("name_2").head().getString(0) == "2") // selectable, not ambiguous
  }

  test("S3 fixture cursor reads the TOP-LEVEL sort field, not a nested decoy") {
    import graft.sources.KeysetSource
    val json = """{"meta":{"lastModifiedAt":"2099-01-01T00:00:00"},"lastModifiedAt":"2024-01-01T00:00:05"}"""
    assert(KeysetSource.ujsonField(json, "lastModifiedAt") == "2024-01-01T00:00:05")
    assert(KeysetSource.ujsonField("""{"a": 1}""", "lastModifiedAt") == null)
    assert(KeysetSource.ujsonField("not json", "lastModifiedAt") == null)
    assert(KeysetSource.ujsonField("""{"f":"a\"b"}""", "f") == "a\"b") // escaped quote
  }

  test("S5 sheet source retries the fetch (6 attempts)") {
    var calls = 0
    val df = SheetSource.load(spark, () => {
      calls += 1
      if (calls < 3) sys.error("http 500")
      Seq(Seq("h"), Seq("v"))
    }, sleep = _ => ())
    assert(calls == 3 && df.count() == 1)
  }

  test("F9/S6 SQL template rendering: params, escapes, missing raises (utils.py:332-333)") {
    assert(SqlScript.render("SELECT {a} FROM t WHERE x > {min}", Map("a" -> "c1", "min" -> 5))
      == "SELECT c1 FROM t WHERE x > 5")
    assert(SqlScript.render("{{literal}} {v}", Map("v" -> 1)) == "{literal} 1")
    intercept[IllegalArgumentException] {
      SqlScript.render("SELECT {missing}", Map.empty)
    }
  }

  test("S6 fromString executes against the session catalog (utils.py:312-339)") {
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("id", "v").createOrReplaceTempView("t_sqlscript")
    val df = SqlScript.fromString(spark,
      "SELECT count(*) AS n FROM t_sqlscript WHERE id > {min_id}", Map("min_id" -> 1))
    assert(df.head().getLong(0) == 1L)
  }

  test("query and oracle inventories are key-consistent") {
    // every driver-checked query has a DuckDB twin and vice versa — a typo
    // in either map silently downgrades the correctness gate; if a future
    // non-SQL-expressible row legitimately omits its oracle, list it here
    // explicitly rather than relaxing the assert
    val q = graft.Queries.all.keySet
    val o = graft.Oracles.all.keySet
    assert(q == o, s"query-only: ${(q -- o).toSeq.sorted}; oracle-only: ${(o -- q).toSeq.sorted}")
  }
}
