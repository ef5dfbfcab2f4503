package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — flagged in SURVEY §2.3 J6 as an engine extension
  * the reference lacks: attach to each left row the payload of the latest
  * right row whose timestamp is ≤ the left row's timestamp, per key.
  *
  * Spark-first implementation: tag + union + one running window per key —
  * a SINGLE shuffle on the join key. The naive alternative (range-condition
  * join `l.k = r.k AND l.ts >= r.ts` + latest-per-pair dedup) explodes to
  * O(|matches|) intermediate rows, which at 100 TB is the difference
  * between a join and an outage. The union form is how kdb/Flink implement
  * as-of internally: sort right rows before left rows at equal timestamps
  * (inclusive semantics, same as DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`)
  * and carry the last-seen right payload forward.
  */
object AsOfJoin {

  /** Backward as-of join.
    *
    * @param on       equi-join key columns (must exist on both sides)
    * @param leftTs   left timestamp column (orderable, comparable to rightTs)
    * @param rightTs  right timestamp column
    * @return all left columns + the right payload columns (right columns
    *         minus keys minus rightTs), null when no right row precedes.
    *
    * Right rows must be unique per (key, rightTs) — with duplicates the
    * carried payload among equal timestamps is tie-broken arbitrarily
    * (dedupe first, e.g. via `AlertGate.latestPerKeyAgg`).
    */
  def backward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String): DataFrame =
    joined(left, right, on, leftTs, rightTs, forward = false)

  /** Forward as-of join: attach the payload of the EARLIEST right row whose
    * timestamp is ≥ the left row's timestamp, per key (inclusive at
    * equality) — the "next quote after the order" direction. Same
    * single-shuffle union+window plan as [[backward]], with the scan order
    * reversed.
    */
  def forward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String): DataFrame =
    joined(left, right, on, leftTs, rightTs, forward = true)

  private def joined(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, forward: Boolean): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one key column")
    val payloadCols = right.columns.filterNot(c => on.contains(c) || c == rightTs).toSeq
    require(payloadCols.nonEmpty, "right side has no payload columns")
    // Reject silently-ambiguous output up front: a payload column shadowing
    // a left column would emit two same-named columns, and user columns named
    // like our temporaries would collide with them inside the union.
    val shadowed = left.columns.toSet.intersect(payloadCols.toSet)
    require(shadowed.isEmpty,
      s"right payload columns ${shadowed.mkString(", ")} collide with left columns; " +
        "rename or drop them before the as-of join")
    val reserved = Set("__ts", "__side", "__pay", "__m")
    val clash = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(clash.isEmpty,
      s"columns ${clash.mkString(", ")} collide with as-of join internals; rename them")

    val lT = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val rT = right.select(
      on.map(col) ++ Seq(
        col(rightTs).alias("__ts"),
        lit(0).alias("__side"),
        struct(payloadCols.map(col): _*).alias("__pay")): _*)
    val unioned = lT.unionByName(rT, allowMissingColumns = true)

    // right (side 0) sorts before left (side 1) at equal __ts → inclusive;
    // forward direction just scans time in reverse
    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))

    filled
      .filter(col("__side") === 1)
      .select(left.columns.map(col).toSeq ++
        payloadCols.map(c => col("__m").getField(c).alias(c)): _*)
  }
}
