package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slack webhook sink (SURVEY §2.1 S11, reference `utils.py:138-156`;
  * richer client `dlt_utils.py:37-40`).
  *
  * The reference POSTs `{"text": msg}` to a webhook URL and logs HTTP/URL
  * errors without failing the pipeline. Here the sink is a side-effecting
  * `foreachPartition` over a message column — executor-parallel delivery,
  * one HTTP client per partition (the production batch shape) — with the
  * transport resolved from the URL scheme so tests can observe delivery:
  *   - `http(s)://` → java.net.http.HttpClient POST
  *   - `memory://`  → in-JVM queue (local-mode tests / dry runs)
  *
  * Errors are caught per message (reference behavior: log, don't throw).
  */
object SlackSink {

  /** In-JVM sink for tests/dry-runs (valid in local mode only). */
  val memorySink = new ConcurrentLinkedQueue[String]()

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case '\n'          => "\\n"
      case '\r'          => "\\r"
      case '\t'          => "\\t"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }

  def payload(message: String): String = s"""{"text": "${jsonEscape(message)}"}"""

  /** C5 — deprecated alias kept for parity with the reference's renamed
    * entry point (`send_slack_alert`, `utils.py:117-123`, which warns and
    * forwards). Compile-time deprecation is strictly stronger than the
    * reference's runtime `warnings.warn`.
    */
  @deprecated("use SlackSink.send", "0.1.0")
  def sendSlackAlert(df: DataFrame, webhookUrl: String, messageCol: String = "message"): Long =
    send(df, webhookUrl, messageCol)

  /** Deliver every value of `messageCol` to the webhook. Returns the number
    * of rows attempted (delivery is at-least-once best-effort, like the
    * reference's fire-and-log contract).
    */
  def send(df: DataFrame, webhookUrl: String, messageCol: String = "message"): Long = {
    val url = webhookUrl
    val msgs = df.select(col(messageCol).cast("string"))
    val n = msgs.count()
    msgs.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (url.startsWith("memory://")) {
        it.foreach(r => if (!r.isNullAt(0)) memorySink.add(r.getString(0)))
      } else {
        // the shared engine transport (one JVM-wide client; executors in
        // local mode share it, a cluster gets one per executor JVM)
        it.foreach { r =>
          if (!r.isNullAt(0)) {
            try graft.sources.HttpTransport.postJson(url, payload(r.getString(0)))
            catch {
              case e: Exception =>
                // reference contract: log the failure, keep going (utils.py:153-156)
                System.err.println(s"[slack-sink] delivery failed: ${e.getMessage}")
            }
          }
        }
      }
    }
    n
  }
}
