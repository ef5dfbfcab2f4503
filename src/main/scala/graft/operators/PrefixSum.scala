package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable GLOBAL running total — the answer to the classic
  * `Window.orderBy(ts)` scale bug: an unpartitioned window moves the whole
  * dataset to one partition (Spark even warns "No Partition Defined for
  * Window operation"), which is an outage at 100 TB.
  *
  * Two-pass prefix-sum instead:
  *   1. bucket rows by a deterministic uniform-width range over the order
  *      column; cumulative-sum WITHIN each bucket (parallel window, one
  *      shuffle on bucket id);
  *   2. per-bucket totals (≤ `buckets` rows) come to the driver, their
  *      exclusive prefix sums go back as a broadcast join.
  *
  * Values are accumulated in DECIMAL so the regrouped addition is exact —
  * the result is bit-identical to a single-partition `sum() OVER (ORDER
  * BY)` and to any other engine (differential-test requirement).
  */
object PrefixSum {

  /** Running total of `valueCol` over the global order of `orderCol`.
    *
    * @param orderCol numeric, UNIQUE per row (with duplicate keys a ROWS
    *                 running frame is nondeterministic in any engine)
    * @return input columns + `resultCol` (decimal(38,6))
    */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String,
      buckets: Int = 256, resultCol: String = "running_total"): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    // min/max/null-check in ONE pass; a null order key has no place in a
    // global order (any engine's ORDER BY would make its position a
    // convention, not a value) — fail fast instead of silently dropping it.
    val bounds = df.agg(
      min(col(orderCol)).cast("double").alias("mn"),
      max(col(orderCol)).cast("double").alias("mx"),
      count(when(col(orderCol).isNull, 1)).alias("nNull")).head()
    if (bounds.getLong(2) > 0)
      throw new IllegalArgumentException(
        s"runningTotal: order column '$orderCol' contains ${bounds.getLong(2)} null(s); " +
          "a global running order is undefined for null keys — filter them first")
    if (bounds.isNullAt(0)) // empty input: preserve schema, no rows
      return df.withColumn(resultCol, lit(null).cast("decimal(38,6)"))
    val mn = bounds.getDouble(0)
    val mx = bounds.getDouble(1)
    val width = math.max((mx - mn) / buckets, java.lang.Double.MIN_NORMAL)
    val bucket = least(lit(buckets - 1), greatest(lit(0),
      floor((col(orderCol).cast("double") - lit(mn)) / lit(width)))).cast("int")

    val v = col(valueCol).cast("decimal(30,6)")
    val withB = df.withColumn("__bucket", bucket)

    // pass 1: parallel within-bucket cumulative sums
    val wIn = Window.partitionBy(col("__bucket")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = withB.withColumn("__cum", sum(v).over(wIn))

    // pass 2: per-bucket totals → driver (≤ buckets scalars) → exclusive
    // prefix offsets → broadcast back. Driver-side on purpose: doing this
    // with an unpartitioned window would re-introduce the warning this
    // operator exists to remove.
    // coalesce: a bucket whose values are ALL null sums to null, which must
    // contribute 0 to downstream offsets (null-skipping sum semantics), not
    // NPE the driver-side accumulation.
    val totals = withB.groupBy(col("__bucket"))
      .agg(coalesce(sum(v), lit(0).cast("decimal(38,6)")).alias("__tot"))
      .collect().map(r => (r.getInt(0), r.getDecimal(1))).sortBy(_._1)
    var acc = java.math.BigDecimal.ZERO
    val offsetRows = totals.map { case (b, tot) =>
      val row = org.apache.spark.sql.Row(b, acc)
      acc = acc.add(tot)
      row
    }
    val spark = df.sparkSession
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__bucket",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("__off",
        org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6), nullable = false)))
    val offsets = spark.createDataFrame(
      java.util.Arrays.asList(offsetRows: _*), offSchema)

    inBucket.join(broadcast(offsets), Seq("__bucket"))
      .withColumn(resultCol, col("__cum") + col("__off"))
      .drop("__bucket", "__cum", "__off")
  }
}
