package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (bucketed) range join — the large×large form of the interval
  * join (SCALE.md's named lever: "bucket the range").
  *
  * q52's broadcast theta-join is the right plan while one side is small;
  * when BOTH sides are large a theta-join degenerates into a product. This
  * operator makes the join an EQUI-join on a derived band id, which is the
  * shape that shuffles and scales:
  *
  *   - every point `p` lands in band `floor(p / bandWidth)` (one row);
  *   - every interval `[lo, hi)` is exploded to the bands it overlaps
  *     (`floor(lo/w) .. floor(hi/w)` — a few rows when `bandWidth` is
  *     chosen near the typical interval length);
  *   - the equi-join on band id shuffles both sides by band, and the exact
  *     range predicate filters band-mates that don't truly overlap.
  *
  * Cost: one shuffle per side on the band id + interval replication by its
  * band count. `maxBandsPerInterval` fails LOUDLY (raise_error, not a
  * silent drop) on a degenerate interval whose replication would explode —
  * the skew contract every capped operator here follows. Choose `bandWidth`
  * ≈ the typical interval length: too small replicates intervals, too
  * large packs unrelated rows into one band (the filter still corrects
  * results; only the candidate count suffers).
  *
  * Semantics: half-open containment `lo <= p < hi`, null point/bounds never
  * match (SQL comparison semantics — same as the theta form).
  */
object RangeJoin {

  /** Join `points` to the `intervals` containing them: result = all columns
    * of both inputs, one row per (point, containing interval).
    */
  def bandedRange(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bandWidth: Double,
      maxBandsPerInterval: Int = 1024
  ): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    require(maxBandsPerInterval >= 1, "maxBandsPerInterval must be >= 1")
    require(!points.columns.contains("__band") && !intervals.columns.contains("__band"),
      "bandedRange: inputs must not already have a __band column")
    val w = lit(bandWidth)
    // a point whose band index would leave long range can't be contained by
    // any valid interval (their bands are guarded below) — null band drops it
    val pBand = col(pointCol) / w
    val p = points
      .withColumn("__band",
        when(abs(pBand) > MaxBandMagnitude, lit(null))
          .otherwise(floor(pBand).cast("long")))
      .filter(col("__band").isNotNull) // null/NaN/out-of-range point matches nothing
    // shared banding with loud guards ([[bandsFor]]): invalid intervals
    // yield an empty band array — explode drops them, matching the theta
    // form's no-match; non-finite bounds and over-cap spans raise loudly
    val iv = intervals.withColumn("__band",
      explode(bandsFor(col(loCol), col(hiCol), w, maxBandsPerInterval, "bandedRange")))
    p.join(iv, Seq("__band"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__band")
  }

  /** Interval×interval OVERLAP join, banded — two large interval sets,
    * pairs where `[lLo, lHi)` and `[rLo, rHi)` intersect
    * (`lLo < rHi && rLo < lHi`), neither side broadcast.
    *
    * Both sides explode to the bands they cover and equi-join on band id.
    * A pair sharing several bands must still appear ONCE: the dedup is the
    * standard first-overlap-band trick — keep a pair only in the band of
    * `greatest(lLo, rLo)` (the first point both cover), a pure filter
    * instead of a distinct/shuffle. Same loud guards as [[bandedRange]].
    *
    * Ill-formed intervals (`lo >= hi`, i.e. EMPTY) match nothing — note
    * this is STRICTER than the naive theta predicate, which happens to
    * "match" an inverted interval that brackets the other side
    * (`lLo < rHi && rLo < lHi` does not encode well-formedness).
    */
  def bandedOverlap(
      left: DataFrame,
      right: DataFrame,
      lLoCol: String, lHiCol: String,
      rLoCol: String, rHiCol: String,
      bandWidth: Double,
      maxBandsPerInterval: Int = 1024
  ): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    require(maxBandsPerInterval >= 1, "maxBandsPerInterval must be >= 1")
    require(!left.columns.contains("__band") && !right.columns.contains("__band"),
      "bandedOverlap: inputs must not already have a __band column")
    val w = lit(bandWidth)
    val l = left.withColumn("__band",
      explode(bandsFor(col(lLoCol), col(lHiCol), w, maxBandsPerInterval, "bandedOverlap")))
    val r = right.withColumn("__band",
      explode(bandsFor(col(rLoCol), col(rHiCol), w, maxBandsPerInterval, "bandedOverlap")))
    l.join(r, Seq("__band"))
      .filter(col(lLoCol) < col(rHiCol) && col(rLoCol) < col(lHiCol))
      // once per pair: only the first band both intervals cover survives
      .filter(col("__band") ===
        floor(greatest(col(lLoCol), col(rLoCol)) / w).cast("long"))
      .drop("__band")
  }

  /** Bands covered by `[lo, hi)` as an array expression, with the shared
    * loud guards: invalid/null intervals → empty array (match nothing, like
    * the theta form); non-finite or out-of-range bounds and band counts
    * over the cap → raise_error naming the operator and the row.
    */
  private def bandsFor(lo: Column, hi: Column, w: Column,
      maxBands: Int, op: String): Column = {
    val loBand = floor(lo / w).cast("long")
    // INCLUSIVE upper band floor(hi/w), deliberately over-covering: for an
    // aligned hi (exact multiple of bandWidth) it adds one band containing
    // no matchable point, which the exact post-filter removes. The tighter
    // `ceil(hi/w) - 1` is WRONG under IEEE-754: hi/w and a point's p/w can
    // round to the same integer (e.g. w=0.1, hi=0.9000000000000001, p=0.9:
    // both quotients are exactly 9.0), and the tight bound then excludes
    // the band the matching point lands in — a silent missing row. Safe
    // over-approximation is the only robust choice; the cost is ≤1 extra
    // candidate band per interval.
    val hiBand = floor(hi / w).cast("long")
    val nBands = hiBand - loBand + lit(1L)
    val unbandable = isnan(lo) || isnan(hi) ||
      abs(lo / w) > MaxBandMagnitude || abs(hi / w) > MaxBandMagnitude
    // unbandable FIRST: a NaN lo would otherwise be swallowed by the
    // validity branch (Spark orders NaN largest, so NaN < hi is false) and
    // break the documented loud contract for non-finite bounds
    when(unbandable,
        raise_error(concat(lit(s"$op: non-finite or out-of-range interval " +
          "bound (NaN/Infinity cannot be banded): lo="), lo, lit(" hi="), hi))
          .cast("array<bigint>"))
      .when(lo.isNull || hi.isNull || !(lo < hi), array().cast("array<bigint>"))
      .when(nBands > maxBands,
        raise_error(concat(lit(s"$op: interval spans more than $maxBands " +
          "bands (widen bandWidth or raise the cap): lo="), lo, lit(" hi="), hi))
          .cast("array<bigint>"))
      .otherwise(sequence(loBand, hiBand))
  }

  /** Band indices must stay well inside long range: floor/cast on a larger
    * quotient would raise an operator-anonymous ANSI error first.
    */
  private val MaxBandMagnitude = 9.0e18
}
