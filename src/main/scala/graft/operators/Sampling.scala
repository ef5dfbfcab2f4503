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

  /** Sample DOWN to a target domain mixture — the data-mixing step of a
    * corpus build: given target weights per stratum (summing to 1), derive
    * the per-stratum Bernoulli rates that realize the LARGEST corpus
    * honoring the mixture without upsampling, then apply them via
    * [[stratified]] (content-hash filter: row-local, reproducible on any
    * layout). The binding stratum (smallest `count/weight`) samples at
    * rate 1; every other stratum downsamples proportionally; strata
    * without a weight drop.
    *
    * The derivation needs one map-side-combined count per WEIGHTED stratum
    * — a driver collect bounded by `weights.size` (domains/languages:
    * small by contract), the same constant-bounded shape as the Lloyd
    * centroid grids. A weighted stratum with zero rows fails loudly: the
    * mixture is infeasible without upsampling, and silently returning an
    * empty corpus (the limit of "honor the mixture") helps nobody.
    *
    * Realized proportions quantize at the 1/10000 bucket granularity of
    * [[hashBucket]] — ±1e-4 of target, the documented contract.
    */
  def toMixture(df: DataFrame, strataCol: String, weights: Map[String, Double],
      keys: Seq[Column]): DataFrame = {
    require(weights.nonEmpty, "toMixture needs at least one target weight")
    require(weights.values.forall(w => w > 0.0 && w <= 1.0),
      s"weights must be in (0,1], got $weights")
    val tot = weights.values.sum
    require(math.abs(tot - 1.0) <= 1e-9, s"weights must sum to 1, got $tot")
    val counts = df.filter(col(strataCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(strataCol)).agg(count(lit(1)).alias("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = weights.keySet -- counts.keySet
    require(missing.isEmpty,
      s"strata with a target weight but NO rows: ${missing.toSeq.sorted.mkString(", ")} " +
        "— the mixture is infeasible without upsampling")
    // feasible corpus size: the binding stratum is exhausted, none oversampled
    val scale = weights.map { case (d, w) => counts(d).toDouble / w }.min
    // fp guard: the binding stratum's w*(n/w)/n can land a ulp above 1
    val rates = weights.map { case (d, w) =>
      d -> math.min(1.0, w * scale / counts(d))
    }
    stratified(df, strataCol, rates, keys)
  }

  /** Deterministic shard assignment for training-data export: `shard` =
    * content hash of the key columns in [0, nShards). The assignment
    * depends only on row content — re-running the export on a different
    * cluster layout, partition count, or engine yields the SAME shards
    * (the reproducibility contract training jobs need for resumable /
    * auditable data loading). The frame comes back repartitioned BY the
    * shard column, so `.write.partitionBy("shard")` emits each shard as
    * one contiguous file set with no extra shuffle; one scan, one
    * hash-partitioned exchange, regardless of corpus size.
    */
  def toShards(df: DataFrame, keys: Seq[Column], nShards: Int): DataFrame = {
    require(nShards >= 1 && nShards <= (1 << 20), s"nShards out of range: $nShards")
    df.withColumn("shard", hashBucket(keys, nShards))
      .repartition(nShards, col("shard"))
  }
}
