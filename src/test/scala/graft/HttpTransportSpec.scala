package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import graft.sources.{HttpTransport, KeysetSource, SheetSource}

/** The real HTTP transport behind the live-connector seams, exercised
  * against an in-process loopback server — no external network: the OAuth
  * token dance + Sheets values fetch, the keyset page GET loop with cursor
  * advancement, transient-retry semantics, and the Slack webhook POST.
  */
class HttpTransportSpec extends SparkSpec {
  import spark.implicits._

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Start a loopback server, run `f` against its base URL, always stop. */
  private def withServer(routes: (String, HttpExchange => Unit)*)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      server.createContext(path, (ex: HttpExchange) => h(ex))
    }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("sheet source end-to-end: token exchange, bearer-authorized values GET, header promotion") {
    var tokenForm: String = null
    var authHeader: String = null
    var rawPath: String = null
    withServer(
      "/token" -> { ex =>
        tokenForm = readBody(ex)
        respond(ex, 200, """{"access_token": "tok-123", "expires_in": 3600}""")
      },
      "/v4/spreadsheets" -> { ex =>
        authHeader = ex.getRequestHeaders.getFirst("Authorization")
        rawPath = ex.getRequestURI.getRawPath
        respond(ex, 200,
          """{"values": [["campaign", "budget"], ["summer", "1200"], ["winter"]]}""")
      }) { base =>
      val df = SheetSource.loadHttp(spark, "sheet-1", "My Tab!A1:B3",
        tokenUrl = s"$base/token",
        tokenForm = Map("grant_type" -> "refresh_token", "refresh_token" -> "rt-9"),
        apiBase = s"$base/v4")
      assert(tokenForm.contains("grant_type=refresh_token") &&
        tokenForm.contains("refresh_token=rt-9"))
      assert(authHeader == "Bearer tok-123")
      // PATH-segment encoding: a tab name with a space must travel as %20
      // ('+' in a URI path is a literal plus — the wrong resource)
      assert(rawPath.contains("My%20Tab") && !rawPath.contains("+"), rawPath)
      // header promoted, ragged row null-padded — fromValues semantics
      assert(df.columns.toSeq == Seq("campaign", "budget"))
      assert(df.as[(String, Option[String])].collect().toSet ==
        Set(("summer", Some("1200")), ("winter", None)))
    }
  }

  test("an expired bearer re-exchanges through the whole-dance 401 retry; malformed 200 bodies fail fast") {
    val tokens = new AtomicInteger
    withServer(
      "/token" -> { ex =>
        respond(ex, 200, s"""{"access_token": "tok-${tokens.incrementAndGet()}"}""")
      },
      "/v4/spreadsheets" -> { ex =>
        if (ex.getRequestHeaders.getFirst("Authorization") == "Bearer tok-1")
          respond(ex, 401, "expired")
        else respond(ex, 200, """{"values": [["h"], ["v"]]}""")
      }) { base =>
      val df = SheetSource.loadHttp(spark, "s", "r",
        tokenUrl = s"$base/token", tokenForm = Map.empty,
        apiBase = s"$base/v4", sleep = _ => ())
      assert(tokens.get() == 2, "401 must re-run the token exchange")
      assert(df.count() == 1)
    }
    // a PERSISTENT 401 (genuinely bad credentials) fails after exactly one
    // re-exchange — the docstring's fail-fast promise, not the full ladder
    val badCreds = new AtomicInteger
    withServer(
      "/token" -> (respond(_, 200, """{"access_token": "bad"}""")),
      "/v4/spreadsheets" -> { ex =>
        badCreds.incrementAndGet(); respond(ex, 401, "nope") }) { base =>
      val e = intercept[HttpTransport.HttpStatusException] {
        SheetSource.loadHttp(spark, "s", "r", tokenUrl = s"$base/token",
          tokenForm = Map.empty, apiBase = s"$base/v4", sleep = _ => ())
      }
      assert(e.status == 401)
      assert(badCreds.get() == 2,
        s"persistent 401 must stop after one re-exchange, saw ${badCreds.get()}")
    }
    // a 200 whose body is not JSON is a caller/endpoint bug: Jackson's
    // IOException subtypes are excluded from the transient class — one
    // attempt, loud failure, no backoff ladder
    val hits = new AtomicInteger
    withServer(
      "/token" -> (respond(_, 200, """{"access_token": "t"}""")),
      "/v4/spreadsheets" -> { ex =>
        hits.incrementAndGet(); respond(ex, 200, "<html>oops</html>") }) { base =>
      intercept[Exception] {
        SheetSource.loadHttp(spark, "s", "r", tokenUrl = s"$base/token",
          tokenForm = Map.empty, apiBase = s"$base/v4", sleep = _ => ())
      }
      assert(hits.get() == 1, s"malformed body retried ${hits.get()} times")
    }
  }

  test("transient failures retry through the whole dance; 4xx fails fast") {
    val hits = new AtomicInteger
    withServer(
      "/token" -> (respond(_, 200, """{"access_token": "t"}""")),
      "/v4/spreadsheets" -> { ex =>
        if (hits.incrementAndGet() < 3) respond(ex, 503, "busy")
        else respond(ex, 200, """{"values": [["h"], ["v"]]}""")
      }) { base =>
      val df = SheetSource.loadHttp(spark, "s", "r",
        tokenUrl = s"$base/token", tokenForm = Map.empty,
        apiBase = s"$base/v4", sleep = _ => ())
      assert(hits.get() == 3 && df.count() == 1)
    }
    // a 4xx is a caller bug: no retry, loud failure
    val clientErrs = new AtomicInteger
    withServer("/nope" -> { ex =>
      clientErrs.incrementAndGet(); respond(ex, 404, "missing") }) { base =>
      val e = intercept[HttpTransport.HttpStatusException] {
        HttpTransport.withRetry(sleep = _ => ())(HttpTransport.get(s"$base/nope"))
      }
      assert(e.status == 404 && clientErrs.get() == 1)
    }
  }

  test("keyset page GET: cursor advances through the where clause, short page terminates") {
    val records = (1 to 25).map(i =>
      (f"2024-01-$i%02dT00:00:00", s"""{"id": $i, "lastModifiedAt": "2024-01-$i%02dT00:00:00"}"""))
    val wheres = scala.collection.mutable.ArrayBuffer[String]()
    withServer(
      "/token" -> (respond(_, 200, """{"access_token": "kt"}""")),
      "/items" -> { ex =>
        val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        val params = q.split('&').map(_.split("=", 2)).collect {
          case Array(k, v) => k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
        }.toMap
        assert(ex.getRequestHeaders.getFirst("Authorization") == "Bearer kt")
        assert(params("sort") == "lastModifiedAt asc")
        val limit = params("limit").toInt
        val after = params.get("where").map { w =>
          wheres += w
          w.stripPrefix("lastModifiedAt > \"").stripSuffix("\"")
        }
        val page = records.filter(r => after.forall(r._1 > _)).take(limit)
        respond(ex, 200, page.map(_._2).mkString("""{"results": [""", ",", "]}"))
      }) { base =>
      val fetcher = KeysetSource.httpFetcher(s"$base/items",
        token = () => HttpTransport.bearerToken(s"$base/token", Map.empty),
        sleep = _ => ())
      val df = KeysetSource.load(spark, fetcher,
        startWatermark = Some("2024-01-05T00:00:00"), pageSize = 10)
      // watermark excludes ids 1..5; pages of 10 + short page terminate
      assert(df.select(col("id")).as[Long].collect().toSet == (6L to 25L).toSet)
      // first page's where IS the start watermark; later wheres advance
      assert(wheres.head == "lastModifiedAt > \"2024-01-05T00:00:00\"")
      assert(wheres.size == 2 || wheres.size == 3) // 10 + 10 + short
    }
  }

  test("a cursor containing quotes travels escaped inside the where clause") {
    val wheres = scala.collection.mutable.ArrayBuffer[String]()
    val page1 = Seq(
      """{"id": 1, "k": "plain"}""",
      """{"id": 2, "k": "ACME \"West\" \\ Corp"}""")
    val reqs = new AtomicInteger
    withServer("/items" -> { ex =>
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      q.split('&').map(_.split("=", 2)).collect {
        case Array("where", v) =>
          wheres += java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
      }
      val body = if (reqs.incrementAndGet() == 1) page1 else Nil
      respond(ex, 200, body.mkString("""{"results": [""", ",", "]}"))
    }) { base =>
      val fetcher = KeysetSource.httpFetcher(s"$base/items",
        token = () => "t", sortField = "k", sleep = _ => ())
      KeysetSource.load(spark, fetcher, startWatermark = None, pageSize = 2)
      // page 2's cursor is page 1's last k — quote and backslash escaped,
      // so the predicate cannot truncate or re-shape
      assert(wheres.exists(_ == """k > "ACME \"West\" \\ Corp""""), wheres)
    }
  }

  test("a caller 'where' filter ANDs with the keyset cursor instead of replacing it") {
    // the r10 regression: Map ++ extraParams let a static caller filter
    // OVERWRITE the cursor predicate, so every page re-fetched page 1 —
    // an infinite loop of identical records
    val records = (1 to 5).map(i =>
      s"""{"id": $i, "lastModifiedAt": "2024-01-0${i}T00:00:00", "status": "active"}""")
    val wheres = scala.collection.mutable.ArrayBuffer[String]()
    withServer("/items" -> { ex =>
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      val params = q.split('&').map(_.split("=", 2)).collect {
        case Array(k, v) => k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
      }.toMap
      params.get("where").foreach(wheres += _)
      // honor only the cursor half; the static filter matches everything
      val after = params.get("where")
        .flatMap("""lastModifiedAt > "([^"]+)"""".r.findFirstMatchIn(_))
        .map(_.group(1))
      val page = records.filter { r =>
        val ts = """"lastModifiedAt": "([^"]+)"""".r.findFirstMatchIn(r).get.group(1)
        after.forall(ts > _)
      }.take(params("limit").toInt)
      respond(ex, 200, page.mkString("""{"results": [""", ",", "]}"))
    }) { base =>
      val fetcher = KeysetSource.httpFetcher(s"$base/items",
        token = () => "t",
        extraParams = Map("where" -> """status = "active"""", "expand" -> "x"),
        sleep = _ => ())
      val df = KeysetSource.load(spark, fetcher, startWatermark = None,
        pageSize = 2)
      assert(df.select(col("id")).as[Long].collect().toSet == (1L to 5L).toSet)
      // every page (the load always seeds the fallback-watermark cursor):
      // static filter AND cursor — and the cursor ADVANCES, proving the
      // static filter never replaced it
      assert(wheres.size >= 3 && wheres.forall(w =>
        w.startsWith("""(status = "active") and (lastModifiedAt > """)), wheres)
      assert(wheres.distinct.size == wheres.size,
        s"cursor must advance every page: $wheres")
      // pagination params can never be overridden
      val e = intercept[IllegalArgumentException] {
        KeysetSource.httpFetcher(s"$base/items", token = () => "t",
          extraParams = Map("limit" -> "999"))
      }
      assert(e.getMessage.contains("limit"))
    }
  }

  test("a full page without a usable sort value fails loudly instead of truncating the load") {
    withServer(
      "/items" -> { ex =>
        // a FULL page (== limit) whose records lack the sort field: ending
        // the loop here would silently drop every remaining page
        respond(ex, 200, (1 to 3).map(i => s"""{"id": $i}""")
          .mkString("""{"results": [""", ",", "]}"))
      }) { base =>
      val fetcher = KeysetSource.httpFetcher(s"$base/items",
        token = () => "t", sleep = _ => ())
      val e = intercept[IllegalStateException] {
        KeysetSource.load(spark, fetcher, pageSize = 3)
      }
      assert(e.getMessage.contains("cannot advance the cursor"))
    }
  }

  test("slack webhook POST delivers each message through the shared transport") {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    withServer("/hook" -> { ex =>
      got.add(readBody(ex)); respond(ex, 200, "ok") }) { base =>
      val n = graft.operators.SlackSink.send(
        Seq("alert one", "alert \"two\"").toDF("message"), s"$base/hook")
      assert(n == 2)
      val bodies = got.toArray(Array.empty[String]).toSet
      assert(bodies == Set("""{"text": "alert one"}""",
        """{"text": "alert \"two\""}"""))
    }
  }
}
