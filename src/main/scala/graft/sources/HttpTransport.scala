package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import scala.concurrent.duration._
import graft.core.Retry

/** The ONE default HTTP transport behind the engine's live-connector seams
  * (SheetSource token + values fetch, KeysetSource page GET, SlackSink
  * webhook POST — the transports the reference implements with `requests`:
  * `gs_utils.py:33-56`, `ct_utils.py:40-51,183-263`, `utils.py:138-156`).
  *
  * Driver-side, deliberately minimal: `java.net.http.HttpClient` (JDK 11+,
  * no dependency), bounded timeouts, and the engine's own retry util
  * ([[graft.core.Retry]] — C3 semantics) wrapped around transient failures
  * (IO errors and 5xx/429; a 4xx is a caller bug and fails fast). Tests
  * exercise the seam against an in-process loopback server
  * (HttpTransportSpec) — no external network anywhere in the suite.
  */
object HttpTransport {

  /** Non-2xx response, status carried for the retry predicate. */
  final case class HttpStatusException(status: Int, url: String, body: String)
      extends RuntimeException(
        s"HTTP $status from $url: ${body.take(200)}")

  /** Retry transient failures only: connection-level IO errors, 5xx, 429.
    * Jackson's parse exceptions EXTEND IOException but are caller bugs
    * (a 200 with a malformed body re-reads the same bytes forever) —
    * excluded explicitly so the fail-fast contract holds.
    */
  def isTransient(t: Throwable): Boolean = t match {
    case HttpStatusException(s, _, _) => s >= 500 || s == 429
    case _: com.fasterxml.jackson.core.JacksonException => false
    case _: java.io.IOException => true
    case _ => false
  }

  /** Percent-encode a QUERY component (form encoding: space → '+'). */
  def encodeQuery(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)

  /** Percent-encode a PATH segment: like [[encodeQuery]] but space must be
    * %20 — '+' in a URI path is a literal plus, so form encoding there
    * targets the wrong resource (a sheet tab named "My Sheet" becomes
    * "My+Sheet").
    */
  def encodePathSegment(s: String): String =
    encodeQuery(s).replace("+", "%20")

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  private def execute(req: HttpRequest, url: String): String = {
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw HttpStatusException(resp.statusCode(), url, resp.body())
    resp.body()
  }

  private def builder(url: String, headers: Map[String, String],
      timeout: FiniteDuration): HttpRequest.Builder = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeout.toMillis))
    headers.foreach { case (k, v) => b.header(k, v) }
    b
  }

  /** GET returning the body; throws [[HttpStatusException]] on non-2xx. */
  def get(url: String, headers: Map[String, String] = Map.empty,
      timeout: FiniteDuration = 30.seconds): String =
    execute(builder(url, headers, timeout).GET().build(), url)

  /** POST a JSON body. */
  def postJson(url: String, body: String,
      headers: Map[String, String] = Map.empty,
      timeout: FiniteDuration = 30.seconds): String =
    execute(builder(url, headers + ("Content-Type" -> "application/json"), timeout)
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(), url)

  /** POST an `application/x-www-form-urlencoded` form — the OAuth2 token
    * exchange shape (client_credentials / refresh_token grants).
    */
  def postForm(url: String, form: Map[String, String],
      headers: Map[String, String] = Map.empty,
      timeout: FiniteDuration = 30.seconds): String = {
    val body = form.map { case (k, v) =>
      encodeQuery(k) + "=" + encodeQuery(v)
    }.mkString("&")
    execute(builder(url,
      headers + ("Content-Type" -> "application/x-www-form-urlencoded"), timeout)
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(), url)
  }

  /** `op` with the engine's C3 retry on TRANSIENT failures (6 attempts,
    * linear backoff — the reference's fetch-retry contract).
    */
  def withRetry[A](maxAttempts: Int = 6,
      backoffBase: FiniteDuration = 10.seconds,
      sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis))
      (op: => A): A =
    Retry.retryWhen(isTransient, maxAttempts,
      Retry.linearBackoff(backoffBase), sleep)(op)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Fetch an OAuth2 bearer token: POST `form` to `tokenUrl`, return the
    * response's `access_token` (the gs_utils refresh-token dance and the
    * ct_utils client-credentials dance are both this shape, differing only
    * in the grant fields the caller passes).
    */
  def bearerToken(tokenUrl: String, form: Map[String, String],
      timeout: FiniteDuration = 30.seconds): String = {
    val node = mapper.readTree(postForm(tokenUrl, form, timeout = timeout))
    val tok = node.path("access_token")
    require(tok.isTextual,
      s"token endpoint $tokenUrl returned no access_token: " +
        node.toString.take(200))
    tok.asText()
  }

  /** Parse a JSON body and return `field` as a 2-D string table — the
    * Sheets values-range response (`{"values": [[...]]}`); null cells
    * become nulls, non-string scalars stringify.
    */
  private[sources] def parseStringTable(body: String, field: String): Seq[Seq[String]] = {
    val node = mapper.readTree(body).path(field)
    require(node.isArray, s"expected JSON array at '$field', got: ${body.take(200)}")
    (0 until node.size).map { i =>
      val row = node.get(i)
      require(row.isArray, s"expected row array at '$field'[$i]")
      (0 until row.size).map { j =>
        val c = row.get(j)
        if (c.isNull) null else if (c.isTextual) c.asText() else c.toString
      }
    }
  }

  /** Parse a JSON body's `field` array into per-record JSON strings (the
    * keyset page shape: `{"results": [{...}, ...]}`), plus each record's
    * `sortField` text value for cursor advancement.
    */
  private[sources] def parseRecords(body: String, field: String,
      sortField: String): Seq[(String, Option[String])] = {
    val node = mapper.readTree(body).path(field)
    require(node.isArray, s"expected JSON array at '$field', got: ${body.take(200)}")
    (0 until node.size).map { i =>
      val rec = node.get(i)
      val sv = rec.path(sortField)
      (mapper.writeValueAsString(rec), if (sv.isMissingNode || sv.isNull) None else Some(sv.asText()))
    }
  }
}
