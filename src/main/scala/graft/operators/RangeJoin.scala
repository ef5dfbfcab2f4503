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
    val w = lit(bandWidth)
    val p = points.withColumn("__band", floor(col(pointCol) / w).cast("long"))
      .filter(col("__band").isNotNull) // null point matches nothing
    val loBand = floor(col(loCol) / w).cast("long")
    val hiBand = floor(col(hiCol) / w).cast("long")
    val nBands = hiBand - loBand + lit(1L)
    val iv = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) < col(hiCol))
      .withColumn("__band", explode(when(nBands > maxBandsPerInterval,
        // loud skew guard: a silent drop would be a wrong answer
        raise_error(concat(lit(s"bandedRange: interval spans more than " +
          s"$maxBandsPerInterval bands (widen bandWidth or raise the cap): lo="),
          col(loCol), lit(" hi="), col(hiCol))).cast("array<bigint>"))
        .otherwise(sequence(loBand, hiBand))))
    p.join(iv, Seq("__band"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__band")
  }
}
