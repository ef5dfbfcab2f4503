package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations evaluated in ONE scan — the
  * validation layer between ingest and merge (the reference's diagnostics
  * prints, `utils.py:357-386`, turned into machine-checkable contracts;
  * cousin of the alert gate's threshold predicate, `utils.py:231`).
  *
  * All checks compile into a single `agg(...)` projection (conditional
  * counts + count-distincts), so a 100 TB table pays one pass and one
  * 1-row aggregation regardless of how many checks are declared; the
  * per-check report rows are exploded from that single row on the driver
  * side of the plan. No check sees data the others don't — the metrics are
  * consistent by construction (same snapshot, same scan).
  */
object QualityChecks {

  sealed trait Check { def name: String }

  /** Fraction of null values in `col` must be ≤ `maxNullFrac`. */
  case class NotNull(col: String, maxNullFrac: Double = 0.0) extends Check {
    def name: String = s"not_null_$col"
  }

  /** Rows duplicated on `cols` (beyond the first occurrence) must be ≤
    * `maxDupFrac` of all rows. Null-keyed rows are excluded from the
    * distinct count (SQL COUNT DISTINCT convention) but not from the total.
    */
  case class Unique(cols: Seq[String], maxDupFrac: Double = 0.0) extends Check {
    def name: String = s"unique_${cols.mkString("_")}"
  }

  /** Fraction of non-null values outside [lo, hi] must be ≤ `maxOutFrac`. */
  case class InRange(col: String, lo: Double, hi: Double,
      maxOutFrac: Double = 0.0) extends Check {
    def name: String = s"in_range_$col"
  }

  /** Fraction of rows violating `satisfied` must be ≤ `maxViolFrac`.
    * A null predicate result counts as a violation (unknown ≠ satisfied).
    */
  case class Satisfies(name: String, satisfied: Column,
      maxViolFrac: Double = 0.0) extends Check

  /** Evaluate all checks in one pass.
    *
    * @return one row per check: (check_name, metric, threshold, passed) —
    *         metric is the violation fraction in [0,1] (0 on an empty
    *         input: no rows, no violations)
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    val total = count(lit(1))
    // violation-count expression per check (aggregates, one agg projection)
    val violations: Seq[Column] = checks.map {
      case NotNull(c, _) =>
        count(when(col(c).isNull, 1)).cast("double")
      case Unique(cols, _) =>
        (total - countDistinct(col(cols.head), cols.tail.map(col): _*)).cast("double")
      case InRange(c, lo, hi, _) =>
        count(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1)).cast("double")
      case Satisfies(_, p, _) =>
        count(when(!coalesce(p, lit(false)), 1)).cast("double")
    }
    val thresholds = checks.map {
      case NotNull(_, t) => t
      case Unique(_, t) => t
      case InRange(_, _, _, t) => t
      case Satisfies(_, _, t) => t
    }
    val one = df.agg(total.alias("__n"),
      violations.zipWithIndex.map { case (v, i) => v.alias(s"__v$i") }: _*)
    val reports = checks.zip(thresholds).zipWithIndex.map { case ((chk, thr), i) =>
      // raw division of exact counts — one IEEE op, bit-identical in any
      // engine (no rounding step to diverge on)
      val metric = when(col("__n") === 0, lit(0.0))
        .otherwise(col(s"__v$i") / col("__n"))
      struct(lit(chk.name).alias("check_name"),
        metric.alias("metric"),
        lit(thr).alias("threshold"),
        (metric <= thr).alias("passed"))
    }
    one.select(explode(array(reports: _*)).alias("r"))
      .select(col("r.check_name"), col("r.metric"), col("r.threshold"), col("r.passed"))
  }
}
