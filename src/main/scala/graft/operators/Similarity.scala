package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (BASELINE north star).
  *
  * Two access paths, same contract:
  *   - `bruteForceTopK`: exact cosine top-k — query ⨯ corpus join with the
  *     dot product as a `zip_with`/`aggregate` expression (codegen'd, no
  *     UDF). Correct baseline at any scale where |queries| is small: the
  *     query side broadcasts, the corpus is scanned once, top-k is a
  *     per-query window over k·|queries| rows.
  *   - `lshTopK`: approximate — random-hyperplane LSH buckets (deterministic
  *     seed-derived planes) shrink the candidate set before exact re-scoring.
  *     The scale path: candidates come from a bucket equi-join (shuffle on
  *     bucket id), not a cross join. An IVF variant would swap the bucketer
  *     for k-means cells; the plumbing is identical.
  *
  * Embeddings are `array<float>`; arithmetic is done in double (deterministic
  * IEEE ops — differential-testable against any engine).
  */
object Similarity {

  /** Cosine similarity between two array<numeric> columns as a pure
    * expression: dot(a,b) / (‖a‖·‖b‖); null/zero vectors → null.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    when(na === 0.0 || nb === 0.0, lit(null)).otherwise(dot / (na * nb))
  }

  /** Exact brute-force top-k neighbors for each query vector.
    *
    * @param queries (queryIdCol, vecCol)
    * @param corpus  (idCol, vecCol)
    * @return (query_id, neighbor_id, rank, cosine) — self-matches excluded
    *         when ids collide
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      queryIdCol: String = "query_id", idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(queryIdCol).alias("query_id"),
      col(vecCol).alias("__qv")))
    val c = corpus.select(col(idCol).alias("neighbor_id"), col(vecCol).alias("__cv"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .filter(col("cosine").isNotNull)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component for (seed, plane,
    * dimension): md5-derived uniform in [-1, 1).
    */
  private def planeComponent(plane: Int, dim: Column): Column = {
    val h = conv(substring(md5(concat(lit(s"plane$plane|"), dim.cast("string"))), 1, 8), 16, 10)
      .cast("double")
    h / lit(math.pow(16, 8) / 2) - 1.0
  }

  /** Random-hyperplane LSH bucket id: `numPlanes` sign bits of ⟨v, r_p⟩. */
  def hyperplaneBucket(vec: Column, numPlanes: Int = 8): Column = {
    val signs = (0 until numPlanes).map { p =>
      val dotRp = aggregate(zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x.cast("double") * planeComponent(p, i)), lit(0.0), (acc, v) => acc + v)
      when(dotRp >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    signs.reduce(_ + _)
  }

  /** Approximate top-k: bucket-join candidates (same hyperplane bucket) then
    * exact cosine re-scoring. Recall is tunable via numPlanes (fewer planes →
    * bigger buckets → higher recall, more compute).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      queryIdCol: String = "query_id", idCol: String = "vec_id",
      vecCol: String = "embedding", numPlanes: Int = 6): DataFrame = {
    val q = queries.select(col(queryIdCol).alias("query_id"), col(vecCol).alias("__qv"),
      hyperplaneBucket(col(vecCol), numPlanes).alias("__bucket"))
    val c = corpus.select(col(idCol).alias("neighbor_id"), col(vecCol).alias("__cv"),
      hyperplaneBucket(col(vecCol), numPlanes).alias("__bucket"))
    val scored = q.join(c, Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .filter(col("cosine").isNotNull)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs (dedup by embedding): LSH-bucketed
    * self-join, exact cosine ≥ threshold. The all-pairs fallback within a
    * bucket is bounded by bucket size — same skew guard story as Dedup.
    */
  def embeddingNearDuplicates(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      numPlanes: Int = 6): DataFrame = {
    val withBucket = corpus.select(col(idCol), col(vecCol),
      hyperplaneBucket(col(vecCol), numPlanes).alias("__bucket"))
    val a = withBucket.select(col("__bucket"), col(idCol).alias("id_a"), col(vecCol).alias("__va"))
    val b = withBucket.select(col("__bucket"), col(idCol).alias("id_b"), col(vecCol).alias("__vb"))
    a.join(b, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
