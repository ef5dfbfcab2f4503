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
    val loBand = floor(col(loCol) / w).cast("long")
    // EXCLUSIVE upper band: the last band containing some p < hi. floor(hi/w)
    // would over-count by one whole band whenever hi is an exact multiple of
    // bandWidth — the recommended aligned configuration — doubling
    // replication and tripping the cap a band early.
    val hiBand = (ceil(col(hiCol) / w) - lit(1L)).cast("long")
    val nBands = hiBand - loBand + lit(1L)
    // non-finite or astronomically-large bounds cannot be banded: the theta
    // form would match (Spark orders NaN largest), so silence here would be
    // a WRONG answer and ANSI floor/cast would die with an error naming
    // neither the operator nor the row — fail loudly instead
    val unbandable = isnan(col(loCol)) || isnan(col(hiCol)) ||
      abs(col(loCol) / w) > MaxBandMagnitude || abs(col(hiCol) / w) > MaxBandMagnitude
    val iv = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) < col(hiCol))
      .withColumn("__band", explode(
        when(unbandable,
          raise_error(concat(lit("bandedRange: non-finite or out-of-range " +
            "interval bound (NaN/Infinity cannot be banded): lo="),
            col(loCol), lit(" hi="), col(hiCol))).cast("array<bigint>"))
        .when(nBands > maxBandsPerInterval,
          // loud skew guard: a silent drop would be a wrong answer
          raise_error(concat(lit(s"bandedRange: interval spans more than " +
            s"$maxBandsPerInterval bands (widen bandWidth or raise the cap): lo="),
            col(loCol), lit(" hi="), col(hiCol))).cast("array<bigint>"))
        .otherwise(sequence(loBand, hiBand))))
    p.join(iv, Seq("__band"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__band")
  }

  /** Band indices must stay well inside long range: floor/cast on a larger
    * quotient would raise an operator-anonymous ANSI error first.
    */
  private val MaxBandMagnitude = 9.0e18
}
