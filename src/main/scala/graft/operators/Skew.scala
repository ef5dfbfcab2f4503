package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities — the 100 TB design point.
  *
  * WHEN AQE SUFFICES vs WHEN TO SALT (decision rule, asserted in PlanSpec's
  * `skew=true` test): AQE's skew-join split (`OptimizeSkewedJoin`) detects
  * an oversized shuffle partition AT RUNTIME and splits it across tasks —
  * it handles the sort-merge/shuffle-hash equi-join case with zero code
  * changes and should be the FIRST answer to skew. Reach for manual
  * salting only where AQE cannot act: (a) skewed AGGREGATIONS (AQE splits
  * join partitions, not groupBy state), (b) a hot key known in advance
  * whose split must be deterministic across reruns (AQE's task splits
  * depend on runtime block sizes), (c) joins AQE won't touch (broadcast
  * side already chosen, or non-shuffle operators downstream that must see
  * a stable partitioning). This helper covers the planned-salting case and
  * stays fully deterministic: the salt is a hash of stable columns, never
  * `rand()`, so retried tasks and reruns produce identical partitioning.
  *
  * Shape: the LARGE side gets `salt = pmod(hash(saltBy...), factor)`; the
  * SMALL side is exploded `factor`× (one copy per salt value); the join key
  * becomes (keys..., salt). Each hot key's rows now spread over `factor`
  * reducers at the cost of replicating the small side `factor`×.
  */
object Skew {

  /** Add a deterministic salt column derived from `saltBy` columns. */
  def withSalt(df: DataFrame, factor: Int, saltBy: Seq[Column], name: String = "__salt"): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    df.withColumn(name, pmod(hash(saltBy: _*), lit(factor)))
  }

  /** Explode the small side across all salt values. */
  def replicateForSalt(df: DataFrame, factor: Int, name: String = "__salt"): DataFrame =
    df.withColumn(name, explode(sequence(lit(0), lit(factor - 1))))

  /** Salted equi-join: join big ⋈ small on (keys..., salt). `saltBy` defaults
    * to a stable per-row discriminator on the big side (all join keys plus a
    * line-level column would be ideal; callers pick).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      factor: Int,
      saltBy: Seq[Column],
      joinType: String = "inner"
  ): DataFrame = {
    val b = withSalt(big, factor, saltBy)
    val s = replicateForSalt(small, factor)
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
