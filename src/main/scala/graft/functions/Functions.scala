package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY §2.10 F1-F10, §2.2 P1-P5).
  *
  * Every function here is a composition of built-in Catalyst expressions —
  * zero UDFs — so whole-stage codegen, constant folding, and predicate
  * pushdown stay intact. That is the deliberate inversion of the reference,
  * which applies row-at-a-time Python callables (`df.id.apply(hash_id)`,
  * `utils.py:48`).
  */
object Functions {

  /** F1 — `hash_id` (`utils.py:46-55`): SHA-1 hex of the UTF-8 string;
    * null or empty string → null. `sha1` is codegen'd; no UDF.
    */
  def hashId(c: Column): Column =
    when(c.isNull || c === lit(""), lit(null)).otherwise(sha1(c))

  /** F1 variant with a selectable digest (md5 | sha1 | sha256) — md5/sha256
    * exist in both Spark and common oracle engines, which keeps differential
    * testing possible where sha1 is unavailable.
    */
  def hashId(c: Column, algorithm: String): Column = {
    val digest = algorithm.toLowerCase match {
      case "md5"    => md5(c)
      case "sha1"   => sha1(c)
      case "sha256" => sha2(c, 256)
      case other    => throw new IllegalArgumentException(s"unsupported digest: $other")
    }
    when(c.isNull || c === lit(""), lit(null)).otherwise(digest)
  }

  /** F2 — `parse_timestamp` (`utils.py:428-440`): ISO-8601
    * `2019-12-12T15:22:04.558Z` → timestamp; null / unparseable (the
    * reference's len<5 "nan" guard) → null. We return a real TimestampType,
    * not the reference's string surgery — `to_timestamp` already yields null
    * on unparseable input, which subsumes the len<5 guard.
    */
  def parseTimestamp(c: Column, pattern: String = "yyyy-MM-dd'T'HH:mm:ss.SSSX"): Column =
    try_to_timestamp(c, lit(pattern))

  /** F3 — `parse_exa_to_ct_timestamp` (`ct_utils.py:9-16`): timestamp →
    * `yyyy-MM-ddTHH:mm:ss` string (the commercetools `where` predicate format).
    */
  def formatCtTimestamp(c: Column): Column =
    date_format(c, "yyyy-MM-dd'T'HH:mm:ss")

  /** F4 — watermark arithmetic (`ct_utils.py:29`): ts − n seconds. */
  def minusSeconds(c: Column, n: Long): Column =
    c - expr(s"INTERVAL $n SECONDS")

  /** F4 legacy — minute granularity (`commercetools_utils.py:29`). The
    * Exasol <100 interval-literal quirk is deliberately not replicated.
    */
  def minusMinutes(c: Column, n: Long): Column =
    c - expr(s"INTERVAL $n MINUTES")

  /** P5 — null/empty-string guard (`utils.py:52`). */
  def nullIfEmpty(c: Column): Column =
    when(c.isNull || c === lit(""), lit(null)).otherwise(c)

  /** N6/F10 — dotted-path extraction over JSON strings
    * (`utils.py:417-425`): path segments navigate objects, integer segments
    * index arrays, anything missing → null. `a.b.0.c` → `$.a.b[0].c`.
    */
  def jsonPath(c: Column, dottedPath: String): Column = {
    val jp = dottedPath.split('.').foldLeft("$") { (acc, seg) =>
      if (seg.forall(_.isDigit)) s"$acc[$seg]" else s"$acc.$seg"
    }
    get_json_object(c, jp)
  }

  /** N7 — `check_for_key` (`utils.py:443-453`) over a MapType column:
    * null map → null, key missing → "empty", else the value (as string to
    * keep the reference's dynamic contract).
    */
  def checkForKey(mapCol: Column, key: String): Column =
    when(mapCol.isNull, lit(null))
      .otherwise(coalesce(element_at(mapCol, key).cast("string"), lit("empty")))

  /** P1 — existence-tolerant projection (`ct_utils.py:116-119`): select the
    * requested columns that actually exist; silently drop the rest.
    */
  def selectExisting(df: DataFrame, requested: Seq[String]): DataFrame = {
    val present = df.columns.toSet
    val kept = requested.filter(present)
    df.select(kept.map(col): _*)
  }

  /** P2 — column-name whitespace normalization (`utils.py:276`). */
  def trimColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.trim): _*)

  /** Bounded top-k aggregate (native [[graft.functions.expressions.TopK]]):
    * k best values per group as a sorted array, with map-side partials —
    * shuffle volume O(groups·k) where the window top-N idiom moves O(rows).
    */
  def topK(c: Column, k: Int, descending: Boolean = true): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.TopK(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c), k, descending)
        .toAggregateExpression())

  /** max_by/min_by generalized to k: the payloads of the k best rows by
    * `value`, best first (ties broken by payload bytes, deterministically).
    * Same map-side-partial shuffle bound as [[topK]].
    */
  def topKBy(value: Column, payload: Column, k: Int,
      descending: Boolean = true): Column = {
    import org.apache.spark.sql.functions.{struct, transform}
    transform(
      topK(struct(value.alias("v"), payload.alias("p")), k, descending),
      s => s.getField("p"))
  }
}
