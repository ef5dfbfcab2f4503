package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.concurrent.duration._
import graft.core.Retry

/** Spreadsheet-range source (SURVEY §2.1 S5, reference `gs_utils.py:14-74`).
  *
  * The reference fetches an A1 range as a 2-D string array, retries ≤6 times
  * with linear backoff (`gs_utils.py:51-63`), and promotes the first row to
  * the header (`gs_utils.py:68-70`). The transport is pluggable here (a
  * `fetch` thunk) — production would wrap an HTTP client, tests a fixture —
  * and the frame-building semantics are exactly `spark.read.option("header",
  * true).csv`: header promotion, ragged rows padded with null, all-string
  * columns.
  *
  * Scale note: a spreadsheet is inherently driver-sized (Sheets caps at ~10M
  * cells); `createDataFrame` + an immediate repartition on first use is the
  * right shape. This is a dimension-table source — downstream joins should
  * `broadcast()` it.
  */
object SheetSource {

  /** Header promotion + ragged-row padding over driver-fetched values.
    * Header hygiene matches the csv header reader's guarantees: blank header
    * cells become positional `col_<i>` names, and duplicate headers are
    * uniquified (`name`, `name_2`, ...) — real spreadsheets have both, and
    * an ambiguous duplicate would make every later `col("name")` throw.
    */
  def fromValues(
      spark: SparkSession,
      values: Seq[Seq[String]],
      headerRow: Boolean = true
  ): DataFrame = {
    require(values.nonEmpty, "empty sheet range")
    val (names, data) =
      if (headerRow) (dedupeHeaders(values.head.map(_.trim)), values.tail)
      else (values.head.indices.map(i => s"col_$i"), values)
    val width = names.length
    val rows = data.map { r =>
      val padded = r.padTo(width, null).take(width)
      Row.fromSeq(padded)
    }
    val schema = StructType(names.map(n => StructField(n, StringType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toList), schema)
  }

  private[sources] def dedupeHeaders(raw: Seq[String]): Seq[String] = {
    val taken = scala.collection.mutable.HashSet.empty[String]
    raw.zipWithIndex.map { case (h, i) =>
      val base = if (h.isEmpty) s"col_$i" else h
      var cand = base
      var n = 2
      while (taken(cand)) { cand = s"${base}_$n"; n += 1 }
      taken += cand
      cand
    }
  }

  /** Full source: retried fetch (C3 semantics: 6 attempts, (n+1)×10 s) then
    * header promotion.
    */
  def load(
      spark: SparkSession,
      fetch: () => Seq[Seq[String]],
      maxAttempts: Int = 6,
      backoffBase: FiniteDuration = 10.seconds,
      sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis)
  ): DataFrame = {
    val values = Retry.retry(maxAttempts, Retry.linearBackoff(backoffBase), sleep)(fetch())
    fromValues(spark, values)
  }

  /** The REAL transport for the pluggable `fetch` seam: OAuth2 token dance
    * (POST `tokenForm` to `tokenUrl`, e.g. a refresh_token grant — the
    * reference's `gs_utils.py:33-47`) followed by the values-range GET
    * (`gs_utils.py:54-56`), parsed from the `{"values": [[...]]}` response.
    * Returned as a thunk so [[load]]'s retry wraps the WHOLE dance — an
    * expired token on attempt N re-exchanges on attempt N+1.
    *
    * `apiBase` defaults to the public Sheets v4 endpoint; tests point it at
    * an in-process loopback server (HttpTransportSpec).
    */
  def httpFetch(
      spreadsheetId: String,
      range: String,
      tokenUrl: String,
      tokenForm: Map[String, String],
      apiBase: String = "https://sheets.googleapis.com/v4"
  ): () => Seq[Seq[String]] = () => {
    val token = HttpTransport.bearerToken(tokenUrl, tokenForm)
    // PATH-segment encoding ('%20', never '+'): tab names with spaces —
    // "My Sheet!A1:B3" — are the common case
    val enc = HttpTransport.encodePathSegment _
    val body = HttpTransport.get(
      s"$apiBase/spreadsheets/${enc(spreadsheetId)}/values/${enc(range)}",
      Map("Authorization" -> s"Bearer $token"))
    HttpTransport.parseStringTable(body, "values")
  }

  /** [[load]] over [[httpFetch]] — the one-call live form. Unlike the
    * generic [[load]] (whose opaque thunk retries everything), this path
    * KNOWS its failures: only transient ones
    * ([[HttpTransport.isTransient]] — IO, 5xx, 429) retry; a 4xx (bad
    * credentials, wrong spreadsheet id) or a malformed response is a
    * caller bug and fails fast instead of burning the full backoff ladder.
    */
  def loadHttp(
      spark: SparkSession,
      spreadsheetId: String,
      range: String,
      tokenUrl: String,
      tokenForm: Map[String, String],
      apiBase: String = "https://sheets.googleapis.com/v4",
      maxAttempts: Int = 6,
      backoffBase: FiniteDuration = 10.seconds,
      sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis)
  ): DataFrame = {
    val fetch = httpFetch(spreadsheetId, range, tokenUrl, tokenForm, apiBase)
    // 401 retries AT MOST ONCE: the retry wraps the WHOLE dance, so one
    // re-attempt re-exchanges a bearer token that expired between the
    // exchange and the GET — the only transient 401. A second 401 means
    // the credentials themselves are bad, which must fail fast (the
    // contract above) instead of burning the full backoff ladder. Other
    // 4xx and malformed bodies stay fail-fast from the first.
    val unauthSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    def retriable(t: Throwable): Boolean = t match {
      case HttpTransport.HttpStatusException(401, _, _) =>
        unauthSeen.incrementAndGet() == 1
      case other => HttpTransport.isTransient(other)
    }
    fromValues(spark, Retry.retryWhen(retriable,
      maxAttempts, Retry.linearBackoff(backoffBase), sleep)(fetch()))
  }
}
