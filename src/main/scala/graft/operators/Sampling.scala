package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. `df.sample()` is
  * seed-stable only for a fixed partitioning — repartition the input and the
  * sample changes, which breaks reproducible corpus builds. Hash-bucket
  * sampling depends only on ROW CONTENT: the same key always lands in the
  * same bucket, on any cluster layout, in any engine (md5 is the portable
  * choice; the differential-test requirement).
  */
object Sampling {

  /** Content-derived bucket in [0, buckets): first 8 md5 hex digits of the
    * '|'-joined key columns. Uniform for any key distribution.
    */
  def hashBucket(keys: Seq[Column], buckets: Int): Column = {
    require(keys.nonEmpty, "hashBucket needs at least one key column")
    require(buckets >= 1 && buckets <= (1 << 30), "buckets out of range")
    conv(substring(md5(concat_ws("|", keys: _*)), 1, 8), 16, 10)
      .cast("long") % buckets
  }

  /** Bernoulli sample at `rate` keyed on `keys` (reproducible everywhere). */
  def hashSample(df: DataFrame, keys: Seq[Column], rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0,1]")
    df.filter(hashBucket(keys, 10000) < lit((rate * 10000).toLong))
  }

  /** Stratified hash sample: per-stratum rates (e.g. per-language corpus
    * mixing weights), strata missing from `rates` get `defaultRate`. One
    * scan, no shuffle — the filter is a pure row-local predicate, so it
    * composes with pushdown and survives any scale.
    */
  def stratified(df: DataFrame, strataCol: String, rates: Map[String, Double],
      keys: Seq[Column], defaultRate: Double = 0.0): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0.0 && r <= 1.0))
    val rateEntries = rates.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit((v * 10000).toLong)) }
    val threshold = coalesce(
      element_at(map(rateEntries: _*), col(strataCol)),
      lit((defaultRate * 10000).toLong))
    df.filter(hashBucket(keys, 10000) < threshold)
  }
}
