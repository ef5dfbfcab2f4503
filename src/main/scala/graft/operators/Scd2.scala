package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) builder — the warehouse-side history
  * operator a BI utility library feeds (the reference maintains history via
  * MERGE + UPDATE_TIMESTAMP, `utils.py:263-296`; SCD2 is the standard
  * generalization: validity intervals instead of in-place overwrite).
  *
  * Shape at scale: both steps are ONE window shuffle on the business key —
  * no self-joins, no driver state. At 100 TB the partition key is the
  * dimension's natural key, so skew follows key cardinality (dimensions are
  * wide, not deep: millions of keys × short histories — the friendly case
  * for window functions).
  */
object Scd2 {

  /** Drop change-log rows whose tracked attributes are unchanged from the
    * previous row of the same key (change compression — the step that turns
    * an event log into a minimal SCD2 history).
    *
    * @param orderCols total order within a key (e.g. ts + a unique id as
    *                  tie-break; a non-total order makes lag() and the
    *                  resulting history nondeterministic)
    */
  def collapseUnchanged(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty && attrCols.nonEmpty)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)
    val cur = struct(attrCols.map(col): _*)
    val prev = lag(cur, 1).over(w)
    // null-SAFE inequality: plain =!= yields NULL when an attribute is null,
    // which would silently collapse a transition TO null as "unchanged"
    df.withColumn("__prev", prev)
      .filter(!(col("__prev") <=> cur))
      .drop("__prev")
  }

  /** Attach SCD2 validity columns to a (compressed) change log:
    * `valid_from` = the row's `tsCol`, `valid_to` = the next change's ts for
    * the same key (null while current), `is_current`.
    */
  def intervals(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieBreakCols).map(col): _*)
    df.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Full build: compress consecutive duplicates, then interval-ize. */
  def fromChangeLog(df: DataFrame, keyCols: Seq[String], tsCol: String,
      attrCols: Seq[String], tieBreakCols: Seq[String] = Nil): DataFrame =
    intervals(
      collapseUnchanged(df, keyCols, tsCol +: tieBreakCols, attrCols),
      keyCols, tsCol, tieBreakCols)
}
