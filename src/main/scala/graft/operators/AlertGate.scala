package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Alert dedup gate (SURVEY §2.12 C1 + §2.6 W1).
  *
  * The reference runs one point query per candidate alert
  * (`check_alert_history_if_should_send`, `utils.py:191-234`): fetch the most
  * recent value sent today for (identifier, dedup_key), then send iff no such
  * row exists OR `abs(current − last) >= resend_threshold`; each sent alert is
  * appended to the history table (`update_slack_alert_history`,
  * `utils.py:159-188`).
  *
  * Spark-first: the whole gate is ONE set-based pipeline over all candidates —
  * latest-per-key via a window (no per-key driver round-trips), left join,
  * one filter. At scale both sides shuffle once on the composite key; the
  * history side is typically small enough to broadcast.
  */
object AlertGate {

  val Identifier = "alert_identifier"
  val DedupKey = "alert_deduplication_key"
  val DedupValue = "alert_deduplication_value"
  val LastAlert = "last_alert"

  /** W1 — latest row per key: generalizes the reference's
    * `ORDER BY LAST_ALERT DESC LIMIT 1` point query (`utils.py:210-219`) into
    * a set-based latest-per-key. Single shuffle on the partition keys.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(c => col(s"`$c`")): _*).orderBy(col(s"`$orderCol`").desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Aggregation form of W1 for the top-1 case: `max(struct(order, rest))`
    * per key. Unlike the window form this gets map-side partial aggregation
    * (each partition reduces to one row per key before the shuffle) and
    * skips the per-partition sort — the shape that wins at 100 TB where
    * keys ≪ rows. Column order is preserved.
    */
  def latestPerKeyAgg(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val rest = df.columns.filterNot(c => keys.contains(c) || c == orderCol).toSeq
    val packed = struct((col(s"`$orderCol`") +: rest.map(c => col(s"`$c`"))): _*)
    val agg = df.groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(max(packed).alias("__top"))
    val out = keys.map(c => col(s"`$c`")) ++
      df.columns.filterNot(keys.contains).toSeq.map {
        case c if c == orderCol => col(s"__top.`$orderCol`").alias(orderCol)
        case c                  => col(s"__top.`$c`").alias(c)
      }
    agg.select(out: _*).select(df.columns.map(c => col(s"`$c`")): _*)
  }

  /** C1 — gate a frame of candidate alerts against history.
    *
    * @param candidates columns: alert_identifier, alert_deduplication_key,
    *                   alert_deduplication_value (+ payload)
    * @param history    columns: alert_identifier, alert_deduplication_key,
    *                   alert_deduplication_value, last_alert (timestamp)
    * @param resendThreshold send again iff abs(cur − last) >= threshold
    *                   (`utils.py:231`; 0 ⇒ resend always, like the reference)
    * @param asOfDate   "today" boundary — the reference's
    *                   `LAST_ALERT > CURRENT_DATE` (`utils.py:214`); injected
    *                   for deterministic tests (SURVEY §7.3's pinned-run-ts)
    * @return candidates that should be sent, with `last_value` attached
    */
  def shouldSend(
      candidates: DataFrame,
      history: DataFrame,
      resendThreshold: Double = 0.0,
      asOfDate: Column = current_date()
  ): DataFrame = {
    val todays = history.filter(col(LastAlert) > asOfDate)
    val latest = latestPerKeyAgg(todays, Seq(Identifier, DedupKey), LastAlert)
      .select(col(Identifier), col(DedupKey), col(DedupValue).alias("last_value"))
    candidates
      .join(latest, Seq(Identifier, DedupKey), "left")
      // coalesce(.., true): a null diff (null/non-numeric current or last
      // value) must FAIL OPEN — suppressing the alert on an unevaluable
      // threshold would break the "threshold 0 ⇒ resend always" contract,
      // and a gate that silently drops alerts is worse than a duplicate
      .filter(col("last_value").isNull ||
        coalesce(abs(col(DedupValue) - col("last_value")) >= lit(resendThreshold),
          lit(true)))
  }

  /** S8 — append sent alerts to the history table shape
    * (`utils.py:177-188`); `sentAt` injectable for idempotent reruns.
    */
  def recordSent(sent: DataFrame, sentAt: Column = current_timestamp()): DataFrame =
    sent.select(
      col(Identifier),
      sentAt.alias(LastAlert),
      col(DedupKey),
      col(DedupValue),
      col("message"))
}
