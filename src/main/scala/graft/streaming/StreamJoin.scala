package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.expr

/** Stream-stream event-time interval join (SURVEY §2.11 extension): the
  * streaming twin of the batch attribution query (q77) — match each left
  * event to right events of the same key whose timestamp falls in
  * `[leftTs - lookback, leftTs]`.
  *
  * Structured Streaming executes this with BOTH sides buffered in keyed
  * state; the two watermarks plus the time-range predicate are what make
  * the state bounded (each side evicts rows older than its watermark minus
  * the interval), so the operator holds at 100 TB/day ingest: state size is
  * O(events inside the lookback horizon), not O(stream).
  *
  * Emits candidate pairs (inner join, append mode). Reductions over the
  * pairs (e.g. last-touch = latest right per left) are downstream
  * aggregations — in batch, exactly q77's row_number pick.
  *
  * Reference behavior: the delta-load overlap re-read (`ct_utils.py:19`,
  * 3 s watermark margin) is the single-stream degenerate case of the same
  * bounded-buffer idea.
  */
object StreamJoin {

  /** Inner interval join of two streaming DataFrames.
    *
    * @param on        equality key columns present on both sides
    * @param leftTs    event-time column on the left (e.g. click time)
    * @param rightTs   event-time column on the right (e.g. view time)
    * @param lookback  SQL interval string, e.g. "12 hours" — right rows
    *                  qualify when `leftTs - lookback <= rightTs <= leftTs`
    * @param leftDelay / rightDelay watermark lateness per side
    * @return left columns + right's non-key columns
    */
  def intervalJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, lookback: String,
      leftDelay: String = "0 seconds", rightDelay: String = "0 seconds"): DataFrame = {
    require(on.nonEmpty, "interval join needs at least one key column")
    require(leftTs != rightTs,
      "left and right event-time columns must have distinct names " +
        "(the pair output carries both)")
    val rightPayload = right.columns.filterNot(on.contains)
    val clash = left.columns.toSet.intersect(rightPayload.toSet)
    require(clash.isEmpty,
      s"right payload columns ${clash.mkString(", ")} would shadow left columns; " +
        "rename them before joining")

    val l = left.withWatermark(leftTs, leftDelay)
    val r = right.withWatermark(rightTs, rightDelay)
    val keyCond: Column = on.map(k => l(k) === r(k)).reduce(_ && _)
    val rangeCond: Column =
      r(rightTs) <= l(leftTs) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $lookback")
    on.foldLeft(l.join(r, keyCond && rangeCond, "inner"))((d, k) => d.drop(r(k)))
  }
}
