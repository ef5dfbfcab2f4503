package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Functions

/** Keyset-paginated incremental source (SURVEY §2.1 S2-S4, reference
  * `ct_utils.py:126-350`).
  *
  * The reference pages a REST endpoint ordered by a sort key
  * (`where sort_key > last_seen & sort=key asc`, `ct_utils.py:183-263`),
  * starting from a watermark read off the target table
  * (`get_max_modified_date_from_dwh`, `ct_utils.py:19-37`), with a page-size
  * cap of 500 (validated, `ct_utils.py:288-290`) and an iteration cap
  * (`max_iterations=250`, `ct_utils.py:199-201` — the pandas memory ceiling
  * this engine exists to remove).
  *
  * Design: the PAGE FETCH is inherently a driver-side iterator (remote keyset
  * cursors are sequential by construction — page N+1's `where` depends on
  * page N's last sort value). What must NOT be driver-side is the data volume
  * per unit of work: each page lands as a small DataFrame and the union is a
  * lazy plan; at scale the same contract runs as `Trigger.AvailableNow`
  * micro-batches (see graft.streaming.IncrementalLoad) so no run ever holds
  * more than a bounded window in memory. Filter pushdown is structural: the
  * watermark predicate IS the page query (`where=sort_key >= ts` travels to
  * the remote system), exactly what a DSv2 `SupportsPushDownFilters` source
  * would do.
  */
object KeysetSource {

  /** One page of raw JSON records + the page's max sort value (the keyset
    * cursor). `None` cursor ⇒ no more pages.
    */
  final case class Page(jsonRecords: Seq[String], lastSortValue: Option[String])

  /** A pluggable page fetcher: given (watermark, pageSize) → page. Production
    * wraps a REST client; tests replay fixture files.
    */
  type Fetcher = (Option[String], Int) => Page

  val MaxPageSize = 500
  val DefaultFallbackWatermark = "2020-01-01T00:00:00" // ct_utils.py:207

  /** S4 — delta-load watermark: MAX(sortCol) − overlap seconds from the
    * target, None when the target is empty (`ct_utils.py:19-37`; the 3-second
    * overlap re-reads a safety margin for late/concurrent writes — the batch
    * twin of a streaming watermark's allowed lateness).
    */
  def watermark(target: DataFrame, sortCol: String, overlapSeconds: Long = 3): Option[String] = {
    val row = target
      .agg(max(Functions.formatCtTimestamp(
        Functions.minusSeconds(col(s"`$sortCol`"), overlapSeconds))).alias("wm"))
      .head()
    Option(row.getString(0))
  }

  /** S3 — keyset pagination loop: fetch pages until exhausted or `maxPages`,
    * parse each page's JSON on the cluster, name-align the union (U1:
    * `unionByName(allowMissingColumns=true)` — page schemas may drift).
    *
    * @param columns optional existence-tolerant projection (P1)
    */
  def load(
      spark: SparkSession,
      fetch: Fetcher,
      startWatermark: Option[String] = None,
      pageSize: Int = MaxPageSize,
      maxPages: Int = 250,
      columns: Seq[String] = Nil
  ): DataFrame = {
    require(pageSize >= 1 && pageSize <= MaxPageSize,
      s"pageSize must be in [1, $MaxPageSize]") // ct_utils.py:288-290
    import spark.implicits._
    var cursor = startWatermark.orElse(Some(DefaultFallbackWatermark))
    // accumulate raw records, parse ONCE at the end: one schema-inference
    // job and a flat plan, instead of one inference job per page plus a
    // maxPages-deep union tree for Catalyst to analyze. Driver memory is
    // bounded by maxPages × pageSize records — the same ceiling the
    // reference enforces (ct_utils.py:199-201); the unbounded form is the
    // streaming path (IncrementalLoad). Global inference also merges
    // drifting page schemas more robustly than pairwise unionByName
    // (int-then-string drift widens instead of failing).
    val records = Seq.newBuilder[String]
    var n = 0
    var done = false
    while (!done && n < maxPages) {
      val page = fetch(cursor, pageSize)
      records ++= page.jsonRecords
      n += 1
      // the fetcher owns pagination-end signalling: None cursor ⇒ exhausted
      done = page.lastSortValue.isEmpty
      if (!done) cursor = page.lastSortValue
    }
    val all = records.result()
    if (all.isEmpty) spark.emptyDataFrame
    else {
      val parsed = spark.read.json(spark.createDataset(all))
      if (columns.nonEmpty) Functions.selectExisting(parsed, columns) else parsed
    }
  }

  /** S2 — offset pagination: `(offset, limit) → records`. The endpoint
    * signals exhaustion by returning fewer than `limit` records (the
    * reference's `basic_ct_pagination` loop, `ct_utils.py:126-158`).
    */
  type OffsetFetcher = (Long, Int) => Seq[String]

  /** Legacy endpoints cap the page size at 250 (`commercetools_utils.py:
    * 264-266`); the current API allows 500.
    */
  val LegacyMaxOffsetLimit = 250

  /** S2 — offset-pagination loop: fetch `(offset, limit)` slices until a
    * short page or `maxPages`. Unlike keyset paging there is no cursor —
    * the offset only ever advances by the returned record count, so a
    * concurrent insert can shift later pages (the documented reason keyset
    * is the recommended path); this loader exists for endpoints that offer
    * nothing better. Records parse ONCE at the end (same single-inference,
    * flat-plan design as [[load]]).
    *
    * @param legacyLimit validate against the legacy 250 cap instead of 500
    */
  def loadOffset(
      spark: SparkSession,
      fetch: OffsetFetcher,
      pageSize: Int = MaxPageSize,
      maxPages: Int = 250,
      columns: Seq[String] = Nil,
      legacyLimit: Boolean = false
  ): DataFrame = {
    val cap = if (legacyLimit) LegacyMaxOffsetLimit else MaxPageSize
    require(pageSize >= 1 && pageSize <= cap,
      s"pageSize must be in [1, $cap]") // ct_utils.py:288-290 / commercetools_utils.py:264-266
    val records = Seq.newBuilder[String]
    var offset = 0L
    var n = 0
    var done = false
    while (!done && n < maxPages) {
      val page = fetch(offset, pageSize)
      records ++= page
      offset += page.length
      n += 1
      done = page.length < pageSize // short page ⇒ exhausted
    }
    val all = records.result()
    if (all.isEmpty) spark.emptyDataFrame
    else {
      val parsed = spark.read.json(spark.createDataset(all)(org.apache.spark.sql.Encoders.STRING))
      if (columns.nonEmpty) Functions.selectExisting(parsed, columns) else parsed
    }
  }

  /** The REAL transport for the [[Fetcher]] seam: keyset page GET against a
    * REST endpoint (the reference's paged `requests.get` loop,
    * `ct_utils.py:183-263`), with the engine's C3 retry on transient
    * failures. Each page is
    * `GET endpoint?limit=N&sort=<sortField> asc[&where=<sortField> > "cursor"]`
    * with a bearer token from `token` (one OAuth2 exchange per load run —
    * [[HttpTransport.bearerToken]] composes the thunk; the reference's
    * client-credentials dance, `ct_utils.py:40-51`). The response's
    * `results` array yields the records; the cursor advances to the last
    * record's `sortField`; a short page ends the loop.
    *
    * Boundary-tie caveat (inherent to strict-`>` keyset cursors over a
    * NON-UNIQUE sort key): records sharing the exact boundary timestamp
    * split across a page edge are excluded by the next page's `>` cursor.
    * The engine's standing mitigation is the OVERLAP watermark
    * ([[watermark]] backs the start cursor up `overlapSeconds` for exactly
    * this class, and the PK merge dedups the re-read rows); endpoints
    * whose timestamps are coarse enough to span whole pages should page on
    * a composite unique sort key instead.
    */
  def httpFetcher(
      endpoint: String,
      token: () => String,
      sortField: String = "lastModifiedAt",
      resultsField: String = "results",
      extraParams: Map[String, String] = Map.empty,
      maxAttempts: Int = 6,
      backoffBase: scala.concurrent.duration.FiniteDuration =
        scala.concurrent.duration.DurationInt(10).seconds,
      sleep: scala.concurrent.duration.FiniteDuration => Unit =
        d => Thread.sleep(d.toMillis)
  ): Fetcher = {
    lazy val bearer = token() // one token per load run, like the reference
    val enc = HttpTransport.encodeQuery _
    // limit/sort ARE the pagination protocol — a caller override would
    // silently break cursor advancement (and a caller "where" must AND
    // with the cursor predicate below, never replace it: a replaced
    // cursor re-fetches page 1 forever)
    Seq("limit", "sort").foreach(k => require(!extraParams.contains(k),
      s"httpFetcher: extraParams may not override the pagination param '$k'"))
    val callerWhere = extraParams.get("where")
    val staticParams = extraParams - "where"
    // the cursor value lands inside a double-quoted predicate: escape the
    // quote and backslash so a string sort value containing either cannot
    // truncate or re-shape the where clause
    def quoted(c: String) =
      "\"" + c.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    (cursor: Option[String], pageSize: Int) => {
      val cursorClause = cursor.map(c => s"$sortField > ${quoted(c)}")
      val where = (callerWhere, cursorClause) match {
        case (Some(w), Some(c)) => Some(s"($w) and ($c)")
        case (a, b) => a.orElse(b)
      }
      val params = Map(
        "limit" -> pageSize.toString,
        "sort" -> s"$sortField asc") ++
        where.map("where" -> _) ++ staticParams
      val url = endpoint + "?" +
        params.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
      val body = HttpTransport.withRetry(maxAttempts, backoffBase, sleep)(
        HttpTransport.get(url, Map("Authorization" -> s"Bearer $bearer")))
      val recs = HttpTransport.parseRecords(body, resultsField, sortField)
      if (recs.size < pageSize) Page(recs.map(_._1), None)
      else recs.last._2 match {
        case some @ Some(_) => Page(recs.map(_._1), some)
        // a FULL page whose last record lacks the sort value cannot
        // advance the cursor — ending the loop here would silently
        // truncate the load (every later page never fetched), so fail
        // loudly instead: either the endpoint ignored the sort param or
        // the sortField name is wrong
        case None => throw new IllegalStateException(
          s"keyset page from $endpoint returned a full page whose last " +
            s"record has no '$sortField' — cannot advance the cursor; " +
            "check the sortField/endpoint (continuing would silently " +
            "drop all remaining pages)")
      }
    }
  }

  /** Fixture-backed offset fetcher over the same `page_*.json` files the
    * keyset fetcher replays: all records flattened in file order, served as
    * `(offset, limit)` slices.
    */
  def fixtureOffsetFetcher(dir: String): OffsetFetcher = {
    lazy val all: Vector[String] = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("page_") && f.getName.endsWith(".json"))
      .sortBy(_.getName)
      .toVector
      .flatMap { f =>
        val src = scala.io.Source.fromFile(f)("UTF-8")
        try src.getLines().filter(_.trim.nonEmpty).toList finally src.close()
      }
    (offset: Long, limit: Int) =>
      if (offset >= all.length) Nil
      // offset < all.length (an Int) is established by the guard above, so
      // the Long→Int narrowing cannot wrap here
      else all.slice(offset.toInt, math.min(offset + limit, all.length.toLong).toInt)
  }

  /** Fixture-backed fetcher: pages are files `page_*.json` (one JSON record
    * per line) in lexicographic order — the shape the tests and the Verify
    * queries replay. Sort values are read from each record's `sortField`.
    */
  def fixtureFetcher(dir: String, sortField: String = "lastModifiedAt"): Fetcher = {
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("page_") && f.getName.endsWith(".json"))
      .sortBy(_.getName)
    var idx = 0
    (watermarkVal: Option[String], _: Int) => {
      if (idx >= files.length) Page(Nil, None)
      else {
        val src = scala.io.Source.fromFile(files(idx))("UTF-8")
        val lines =
          try src.getLines().filter(_.trim.nonEmpty).toList
          finally src.close() // leak-free: one descriptor per page otherwise
        idx += 1
        // keyset contract: only records past the watermark are served
        val kept = watermarkVal match {
          case Some(wm) =>
            lines.filter { l =>
              val v = ujsonField(l, sortField)
              v == null || v >= wm
            }
          case None => lines
        }
        // advance the cursor to the page's max sort value; an all-filtered
        // page keeps the caller's watermark (keyset invariant: the cursor
        // never moves backwards)
        val last = kept.lastOption.map(ujsonField(_, sortField)).filter(_ != null)
        Page(kept, if (idx >= files.length) None else last.orElse(watermarkVal).orElse(Some("")))
      }
    }
  }

  /** Top-level string-field extractor for fixture cursors. A real JSON parse
    * (Jackson ships with Spark), not a regex: a regex would match the field
    * name inside NESTED objects or string values — a nested
    * `meta.lastModifiedAt` from the future would silently jump the cursor
    * and drop every later record. Top-level-only lookup, null on anything
    * unparseable or non-textual.
    */
  private[graft] def ujsonField(json: String, field: String): String =
    try {
      val node = KeysetSource.mapper.readTree(json)
      val v = if (node != null && node.isObject) node.get(field) else null
      if (v != null && v.isTextual) v.asText() else null
    } catch { case _: com.fasterxml.jackson.core.JacksonException => null }

  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
}
