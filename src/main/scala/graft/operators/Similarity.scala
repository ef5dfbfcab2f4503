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

  /** Cosine similarity between two array<numeric> columns: the native
    * codegen'd kernel (one fused loop, no per-row allocation — see
    * [[graft.functions.expressions.CosineSimilarity]]); null input/element,
    * dimension mismatch, or zero norm → null. Semantics and arithmetic are
    * bit-identical to the higher-order-function formulation in
    * [[cosineBuiltin]].
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.CosineSimilarity(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  /** Built-in-only formulation (`zip_with` + `aggregate`) — kept as the
    * cross-check twin for the native expression and for environments that
    * reject custom expressions.
    */
  def cosineBuiltin(a: Column, b: Column): Column = {
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
  /** ‖v‖ as a single array pass. */
  def norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      queryIdCol: String = "query_id", idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(queryIdCol).alias("query_id"),
      col(vecCol).alias("__qv")))
    val c = corpus.select(col(idCol).alias("neighbor_id"), col(vecCol).alias("__cv"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    rankByCosine(scored, k)
  }

  /** Shared exact-ranking tail for every cosine top-k path: per-query desc
    * window, top-k, THEN the null filter. The order is load-bearing — a
    * pre-window isNotNull filter pushes into the join condition and
    * evaluates the cosine kernel twice per pair; desc ordering ranks nulls
    * last, so non-null ranks are identical either way.
    */
  private def rankByCosine(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .filter(col("cosine").isNotNull)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * md5-derived uniform in [-1, 1). Computed ONCE on the driver — the
    * planes are constants, so evaluating the digest per row (500k+ md5
    * expression calls at corpus scale) would be pure waste.
    */
  private[graft] def planeComponent(plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"plane$plane|$dim".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16).toDouble / (math.pow(16, 8) / 2) - 1.0
  }

  /** Random-hyperplane LSH bucket id: `numPlanes` sign bits of ⟨v, r_p⟩,
    * computed by the native fused kernel
    * ([[graft.functions.expressions.HyperplaneBuckets]] — one codegen'd
    * loop, no per-plane intermediate arrays or interpreted lambdas). The
    * plane matrix is driver-precomputed and rides the plan as one
    * reference object. Arithmetic is bit-identical to
    * [[hyperplaneBucketBuiltin]], the HOF cross-check twin (use the twin
    * for non-float/double element types).
    *
    * @param maxDims plane length; vectors longer than this use only the
    *                first maxDims components for bucketing (still a valid
    *                LSH — bucketing needs consistency, not completeness)
    * @param band    independent plane-set selector: band `b` uses planes
    *                `b*numPlanes ... (b+1)*numPlanes - 1`, so different
    *                bands bucket the same vector independently (the LSH
    *                banding trick: candidates = union over bands)
    */
  def hyperplaneBucket(vec: Column, numPlanes: Int = 8, maxDims: Int = 1024,
      band: Int = 0): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.HyperplaneBuckets(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(vec),
        Array.tabulate(numPlanes, maxDims)((p0, d) =>
          planeComponent(band * numPlanes + p0, d))))

  /** Built-in-only formulation of [[hyperplaneBucket]] (`aggregate` over
    * `zip_with` per plane) — kept as the differential cross-check twin for
    * the native kernel and for element types it rejects.
    */
  def hyperplaneBucketBuiltin(vec: Column, numPlanes: Int = 8, maxDims: Int = 1024,
      band: Int = 0): Column = {
    val signs = (0 until numPlanes).map { p0 =>
      val p = band * numPlanes + p0
      // one ArrayType literal per plane (typedlit), not 1024 scalar literals
      val plane = typedLit((0 until maxDims).map(d => planeComponent(p, d)))
      val dotRp = aggregate(
        zip_with(vec, slice(plane, lit(1), greatest(size(vec), lit(1))),
          (x, r) => x.cast("double") * r),
        lit(0.0), (acc, v) => acc + coalesce(v, lit(0.0)))
      when(dotRp >= 0, shiftleft(lit(1L), p0)).otherwise(lit(0L))
    }
    signs.reduce(_ + _)
  }

  /** Approximate top-k: bucket-join candidates (same hyperplane bucket) then
    * exact cosine re-scoring. Recall is tunable on two axes: numPlanes
    * (fewer planes → bigger buckets → higher recall, more compute) and
    * `bands` — the standard LSH amplification: each band buckets the corpus
    * with an INDEPENDENT plane set, candidates are the union over bands, so
    * a true neighbor is missed only if it disagrees with the query in EVERY
    * band (miss probability (1-p^r)^b instead of 1-p^r). The same trick
    * [[graft.operators.Dedup]] applies to MinHash.
    *
    * Per-query candidate cost is ~bands·|C|/2^numPlanes — sublinear by a
    * constant factor, which is the LSH contract. The failure mode at scale
    * is a DEGENERATE bucket (e.g. a mass of near-identical embeddings
    * landing in one bucket): `maxBucketSize` drops corpus buckets above the
    * cap via a window count on the join's own key (no extra shuffle) — the
    * same skew guard as [[embeddingNearDuplicates]]. Default = uncapped,
    * preserving exact recall semantics; set it when the corpus distribution
    * is untrusted.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      queryIdCol: String = "query_id", idCol: String = "vec_id",
      vecCol: String = "embedding", numPlanes: Int = 6,
      maxBucketSize: Int = Int.MaxValue, bands: Int = 1): DataFrame = {
    require(maxBucketSize >= 1, "maxBucketSize must be >= 1")
    require(bands >= 1, "bands must be >= 1")
    val candidates = (0 until bands).map { b =>
      val q = queries.select(col(queryIdCol).alias("query_id"), col(vecCol).alias("__qv"),
        hyperplaneBucket(col(vecCol), numPlanes, band = b).alias("__bucket"))
      val c0 = corpus.select(col(idCol).alias("neighbor_id"), col(vecCol).alias("__cv"),
        hyperplaneBucket(col(vecCol), numPlanes, band = b).alias("__bucket"))
      val c =
        if (maxBucketSize == Int.MaxValue) c0
        else c0
          .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__bucket"))))
          .filter(col("__n") <= maxBucketSize)
          .drop("__n")
      q.join(c, Seq("__bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("__qv"), col("neighbor_id"), col("__cv"))
    }
    // union-of-bands candidate set: distinct BEFORE scoring, so a pair seen
    // in several bands is scored once and can't occupy several ranks
    val uniq =
      if (bands == 1) candidates.head
      else candidates.reduce(_ unionByName _)
        .groupBy(col("query_id"), col("neighbor_id"))
        .agg(first(col("__qv")).alias("__qv"), first(col("__cv")).alias("__cv"))
    val scored = uniq.withColumn("cosine", cosine(col("__qv"), col("__cv")))
    rankByCosine(scored, k)
  }

  /** IVF (inverted-file) ANN — the other standard scale path next to LSH:
    * partition the corpus into `k` cells around deterministic centroids,
    * probe only the `nprobe` nearest cells per query, re-score exactly.
    *
    * Initial centroids are a deterministic hash-ordered sample of the corpus;
    * `refineIters` fixed Lloyd passes (see [[refineCentroids]]) then move
    * them to per-cell means — deterministic end to end, so the DuckDB oracle
    * replays the refined pipeline verbatim. At scale: the centroid table is
    * tiny and broadcast twice (assignment + probe); the only big shuffle is
    * the candidate equi-join on cell id.
    */
  def ivfAssignCells(corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      refineIters: Int = 0): (DataFrame, DataFrame) = {
    require(refineIters >= 0, "refineIters must be >= 0")
    // k centroid rows are collected to the driver: k is a small constant
    // (≤ a few thousand cells even at 100 TB), and numbering them locally
    // avoids a single-partition global window (WindowExec would move data
    // to one partition — fine for k rows, but a scale smell worth zero).
    val spark = corpus.sparkSession
    // md5-derived sample order (not Spark's murmur3 `hash`): the election is
    // part of the operator's contract and must be reproducible by any engine
    // (the DuckDB oracle replays it verbatim)
    val sampleKey = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long"),
      lit(104729L))
    val sample = corpus
      .select(col(idCol), col(vecCol))
      .orderBy(sampleKey.asc, col(idCol).asc)
      .limit(k)
      .orderBy(col(idCol))
      .collect()
    val vecType = corpus.schema(vecCol).dataType
    val centroidSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell_id", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("__centroid", vecType, nullable = true)))
    val initial = spark.createDataFrame(
      java.util.Arrays.asList(sample.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(i + 1, r.get(1))
      }: _*), centroidSchema)
    val centroids = refineCentroids(corpus, initial, refineIters, idCol, vecCol)
    (assignToCells(corpus, centroids, idCol, vecCol), centroids)
  }

  /** Assign a NEW batch of vectors to an EXISTING (frozen) centroid table —
    * the incremental-maintenance half of IVF: an index built once by
    * [[ivfAssignCells]] absorbs appended corpus batches without recomputing
    * centroids (no Lloyd pass, no resampling — the serving contract stays
    * bit-stable while the corpus grows). Same semantics as the bootstrap
    * assignment: max cosine, ties to the lower cell id, null/zero-norm
    * vectors drop out. Monitor [[ivfCellStats]] for drift; when appended
    * mass degrades per-cell cohesion, rebuild with [[ivfAssignCells]].
    * Row-local per batch row (centroids are literals) — no shuffle at all.
    */
  def ivfAssignWith(batch: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assignToCells(batch, centroids, idCol, vecCol)

  /** Per-cell occupancy + cohesion of an IVF index — the drift monitor for
    * incrementally-maintained indexes ([[ivfAssignWith]] /
    * [[graft.streaming.StreamingAnnIngest]]): `n_vectors` exposes cell
    * imbalance (one cell absorbing appended mass → probe cost skews),
    * `mean_cos` exposes cohesion decay (appended vectors far from their
    * frozen centroid → recall decays; falling mean = rebuild signal).
    * The mean goes through DECIMAL(30,6) sums — exact, order-independent,
    * engine-replayable, like every distributed mean here. One scan + one
    * map-side-combined aggregation on the (small) cell-id key space.
    */
  def ivfCellStats(assigned: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assigned.join(broadcast(centroids.select(col("cell_id"), col("__centroid"))),
        Seq("cell_id"))
      .withColumn("__cos", cosine(col(vecCol), col("__centroid")))
      .groupBy(col("cell_id"))
      .agg(count(lit(1)).alias("n_vectors"),
        // exact BIGINT membership witness: any vector moving cells shifts
        // two cells' id-sums — integer, so differential-hash safe, unlike
        // ANY float derivative (even CAST(double AS DECIMAL) diverges
        // across engines at scale midpoints — the r9 q115 lesson)
        sum(col(idCol).cast("long")).alias("sum_vec_id"),
        // float cohesion signals for monitoring callers — never hashed;
        // tolerance-gated in ThresholdsSpec
        sum(col("__cos").cast("decimal(30,6)")).cast("decimal(38,6)")
          .alias("sum_cos"),
        (sum(col("__cos").cast("decimal(30,6)")).cast("double") /
          count(col("__cos"))).alias("mean_cos"))

  /** Nearest-centroid assignment by cosine (deterministic tie-break: lower
    * cell id; zero-norm/null vectors drop out). The shared step of IVF
    * indexing and Lloyd refinement.
    *
    * ROW-LOCAL by construction: the k centroids (a constant-sized table)
    * become literal arrays, each corpus row evaluates k fused cosine
    * kernels and picks the argmax inside one projection — no crossJoin row
    * explosion, no per-id shuffle. The previous shape (crossJoin ×k + a
    * per-id top-1) shuffled the whole corpus ONCE PER LLOYD PASS; this one
    * makes a refinement pass scan + (cell,dim) partial-sum shuffle only,
    * which is the cost profile that survives 100 TB. Semantics are
    * bit-identical: same kernel, same operand order, max cosine with ties
    * to the lower cell id, null/zero-norm rows dropped.
    */
  private def assignToCells(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    // k centroid rows to the driver — the same constant the broadcast
    // carried; a null centroid (an initial sample from a null vector) can
    // never win (its cosine is null), so it is dropped up front
    // a centroid containing a null COMPONENT is dropped too, matching the
    // crossJoin-era semantics where its cosine was null and it never won —
    // a corpus whose sample includes such a vector degrades, not crashes
    val cents: Array[(Int, Seq[Double])] = centroids
      .select(col("cell_id"), col("__centroid")).collect()
      .flatMap { r =>
        Option(r.get(1)).map(v =>
          (r.getInt(0), v.asInstanceOf[scala.collection.Seq[Any]]))
      }
      .collect { case (cellId, vec) if !vec.contains(null) =>
        (cellId, vec.map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toSeq)
      }
      .sortBy(_._1)
    require(cents.nonEmpty, "assignToCells: no non-null centroids")
    // struct (sim, -cell_id): array_max's lexicographic struct ordering
    // then yields max sim, ties to the LOWEST cell id — exactly the window
    // ordering (__sim desc, cell_id asc) this replaces
    val scoredArr = array(cents.map { case (cellId, vec) =>
      struct(cosine(col(vecCol), typedLit(vec)).alias("s"),
        lit(-cellId).alias("negCell"))
    }: _*)
    val best = array_max(filter(scoredArr, e => e.getField("s").isNotNull))
    corpus.select(col(idCol), col(vecCol), best.alias("__best"))
      .filter(col("__best").isNotNull)
      .select(col(idCol), col(vecCol),
        (-col("__best").getField("negCell")).cast("int").alias("cell_id"))
  }

  /** Fixed-iteration Lloyd refinement of IVF centroids, deterministic and
    * engine-replayable: each pass reassigns every vector to its cosine-
    * nearest centroid, then recomputes each cell's centroid as the per-
    * dimension mean. The mean is computed with DECIMAL(30,6) sums — exact,
    * therefore ORDER-INDEPENDENT, so the distributed aggregation commits to
    * the same bits regardless of partitioning, and DuckDB reproduces it
    * (the same convention every aggregate query here uses). Cells that
    * capture no vectors keep their previous centroid. Cost per pass: one
    * corpus scan + one map-side-combined shuffle of N·dim (cell, dim)
    * partial sums; the k·dim mean grid collected to the driver is constant-
    * sized (IVF centroid tables are small by construction).
    */
  def refineCentroids(corpus: DataFrame, initial: DataFrame, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    if (iters <= 0) return initial
    // centroids live as double arrays from here on (float→double is exact,
    // and the cosine kernel computes in double either way)
    // a centroid containing a null COMPONENT degrades to an absent centroid
    // (its cosine would be null — it can never attract a vector), the same
    // contract as assignToCells: a corpus whose elected sample includes
    // such a vector degrades, not crashes
    var cur: Array[(Int, Option[Array[Double]])] = initial
      .select(col("cell_id"), col("__centroid"))
      .collect()
      .map { r =>
        val vec = Option(r.get(1)).map(_.asInstanceOf[scala.collection.Seq[Any]])
          .filterNot(_.contains(null))
          .map(_.map {
            case f: Float => f.toDouble
            case d: Double => d
          }.toArray)
        (r.getInt(0), vec)
      }
      .sortBy(_._1)
    val centroidSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell_id", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("__centroid",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType), nullable = true)))
    def toDf(cs: Array[(Int, Option[Array[Double]])]): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(cs.map { case (id, v) =>
          org.apache.spark.sql.Row(id, v.map(_.toSeq).orNull)
        }: _*), centroidSchema)
    for (_ <- 0 until iters) {
      val stats = assignToCells(corpus, toDf(cur), idCol, vecCol)
        .select(col("cell_id"), posexplode(col(vecCol)).as(Seq("d", "comp")))
        .groupBy(col("cell_id"), col("d"))
        .agg(sum(col("comp").cast("double").cast("decimal(30,6)")).alias("csum"),
          count(lit(1)).alias("n"))
        .collect()
      val next = cur.map { case (id, v) => (id, v.map(_.clone())) }.toMap
      stats.foreach { r =>
        val cell = r.getInt(0); val d = r.getInt(1)
        next(cell).foreach(_(d) = r.getDecimal(2).doubleValue() / r.getLong(3))
      }
      cur = cur.map { case (id, _) => (id, next(id)) }
    }
    toDf(cur)
  }

  /** IVF top-k: probe the `nprobe` nearest cells per query, exact cosine over
    * the union of those cells' members. Builds the index inline; for the
    * serving deployment (one corpus, many query batches) materialize
    * [[ivfAssignCells]]'s two frames ONCE (both are plain DataFrames —
    * parquet round-trips them) and call [[ivfTopKFromIndex]] per batch:
    * the corpus is then never rescanned or reassigned per query batch.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      cells: Int = 16, nprobe: Int = 4,
      queryIdCol: String = "query_id", idCol: String = "vec_id",
      vecCol: String = "embedding", refineIters: Int = 0): DataFrame = {
    val (assigned, centroids) = ivfAssignCells(corpus, cells, idCol, vecCol, refineIters)
    ivfTopKFromIndex(queries, assigned, centroids, k, nprobe, queryIdCol, idCol, vecCol)
  }

  /** IVF top-k served from a materialized index — `assigned`/`centroids`
    * as returned by [[ivfAssignCells]] (possibly persisted and reloaded).
    * Per batch: the k-row centroid table broadcasts for probing, and the
    * only corpus-sized operation is the cell-id equi-join against the
    * probed cells.
    */
  def ivfTopKFromIndex(queries: DataFrame, assigned: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int = 4,
      queryIdCol: String = "query_id", idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val qCells = queries
      .select(col(queryIdCol).alias("query_id"), col(vecCol).alias("__qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("__sim", cosine(col("__qv"), col("__centroid")))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("__sim").desc, col("cell_id").asc)
    val probes = qCells.withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .filter(col("__sim").isNotNull)
      .select(col("query_id"), col("__qv"), col("cell_id"))
    val cands = probes.join(
      assigned.select(col("cell_id"), col(idCol).alias("neighbor_id"), col(vecCol).alias("__cv")),
      Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    rankByCosine(cands, k)
  }

  /** PQ codebook: `k` deterministically-sampled corpus vectors (the same
    * md5-ordered election as IVF centroids — engine-replayable), each split
    * into `m` subvectors: `codebook(s)(j)` = subvector `s` of sample `j`,
    * then `refineIters` fixed Lloyd passes per subspace (see
    * [[refinePqCodebook]]). Driver-side by design: the codebook is
    * m·k·(dim/m) doubles, a constant.
    */
  def pqCodebook(corpus: DataFrame, m: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      refineIters: Int = 0): Array[Array[Array[Double]]] = {
    // codes are signed bytes: k > 127 would wrap negative and silently null
    // every ADC score downstream
    require(k >= 1 && k <= 127, s"numCentroids must be in [1, 127], got $k")
    val sampleKey = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long"),
      lit(104729L))
    val sample = corpus
      .select(col(idCol), col(vecCol))
      .orderBy(sampleKey.asc, col(idCol).asc)
      .limit(k)
      .orderBy(col(idCol))
      .collect()
    require(sample.nonEmpty, "pqCodebook: corpus is empty")
    val vecs = sample.map(_.getSeq[Any](1).map {
      case f: Float => f.toDouble
      case d: Double => d
      case null => throw new IllegalArgumentException("pqCodebook: sampled vector has null element")
    }.toArray)
    val dim = vecs.head.length
    require(dim % m == 0, s"pqCodebook: dim $dim not divisible by m=$m")
    require(vecs.forall(_.length == dim), "pqCodebook: ragged sampled vectors")
    val sub = dim / m
    val sampled = Array.tabulate(m, vecs.length)((s, j) => vecs(j).slice(s * sub, s * sub + sub))
    refinePqCodebook(corpus, sampled, refineIters, vecCol)
  }

  /** Fixed-iteration Lloyd refinement of a PQ codebook, deterministic and
    * engine-replayable. Each pass: (1) re-encode the corpus against the
    * current codebook — [[graft.functions.expressions.PqEncode]] IS the
    * assignment step (strict first-min L2² argmin per subspace); (2) move
    * each (subspace, centroid) to the per-dimension mean of its assigned
    * subvectors. Means use DECIMAL(30,6) sums — exact, therefore order-
    * independent, so the distributed aggregation commits to the same bits
    * regardless of partitioning and DuckDB replays it. Centroids that win
    * no subvectors keep their previous value. Cost per pass: one corpus
    * scan + one map-side-combined shuffle of N·dim (s, j, d) partial sums;
    * the collected mean grid is k·dim rows — a constant.
    */
  def refinePqCodebook(corpus: DataFrame, cb: Array[Array[Array[Double]]],
      iters: Int, vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
    require(iters >= 0, "refineIters must be >= 0")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    var cur = cb
    val sub = cb(0)(0).length
    for (_ <- 0 until iters) {
      val stats = corpus
        .select(ColumnBridge.column(graft.functions.expressions.PqEncode(
          ColumnBridge.expression(col(vecCol)), cur)).alias("__codes"),
          col(vecCol).alias("__v"))
        .select(posexplode(col("__codes")).as(Seq("s", "j")), col("__v"))
        .select(col("s"), col("j").cast("int").alias("j"),
          posexplode(slice(col("__v"), col("s") * lit(sub) + lit(1), lit(sub)))
            .as(Seq("d", "comp")))
        .groupBy(col("s"), col("j"), col("d"))
        .agg(sum(col("comp").cast("double").cast("decimal(30,6)")).alias("csum"),
          count(lit(1)).alias("n"))
        .collect()
      val next = cur.map(_.map(_.clone()))
      stats.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          r.getDecimal(3).doubleValue() / r.getLong(4)
      }
      cur = next
    }
    cur
  }

  /** PQ top-k (ADC): encode the corpus to m-byte codes, precompute each
    * query's subspace distance table once, score every candidate with m
    * table lookups, rank ascending by approximate distance.
    *
    * Scale shape: codes are m bytes/vector (the 100 TB corpus shrinks 64×
    * for 64-dim float64), the query side (table included) broadcasts, and
    * the per-pair cost is O(m) — compare [[bruteForceTopK]]'s O(dim).
    * Compose with [[cosine]] over the top candidates for exact re-ranking.
    *
    * @return (query_id, neighbor_id, rank, score) — score = approximate
    *         squared L2 distance, rank 1 = nearest
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 8, numCentroids: Int = 16,
      queryIdCol: String = "query_id", idCol: String = "vec_id",
      vecCol: String = "embedding", refineIters: Int = 0): DataFrame = {
    val cb = pqCodebook(corpus, m, numCentroids, idCol, vecCol, refineIters)
    pqTopKFromCodes(queries, pqEncodeCorpus(corpus, cb, idCol, vecCol), cb, k,
      queryIdCol, vecCol)
  }

  /** Corpus encoded to PQ byte codes: `(neighbor_id, __codes)` — the
    * m-bytes-per-vector artifact a serving deployment materializes ONCE
    * (64× smaller than the float64 vectors it replaces) and scores every
    * query batch against via [[pqTopKFromCodes]]. The codebook itself is a
    * deterministic pure function of (corpus, m, k, refineIters), so
    * re-deriving it for later batches is exact — or persist it alongside
    * the codes with your artifact store of choice.
    */
  def pqEncodeCorpus(corpus: DataFrame, cb: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // no isNotNull filter on __codes: it would push past the projection and
    // re-evaluate the encode kernel inside the scan filter (doubling the
    // expensive pass); a null codes row nulls the ADC score downstream and
    // the score filter drops it there
    corpus.select(col(idCol).alias("neighbor_id"),
      ColumnBridge.column(graft.functions.expressions.PqEncode(
        ColumnBridge.expression(col(vecCol)), cb)).alias("__codes"))
  }

  /** PQ top-k served from a materialized code table ([[pqEncodeCorpus]],
    * possibly persisted and reloaded): per batch, only the query side is
    * (re)computed — its ADC tables broadcast, and the corpus-sized work is
    * m byte-lookups per (query, code row) pair.
    */
  def pqTopKFromCodes(queries: DataFrame, codes: DataFrame,
      cb: Array[Array[Array[Double]]], k: Int,
      queryIdCol: String = "query_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val q = broadcast(queries.select(col(queryIdCol).alias("query_id"),
      ColumnBridge.column(graft.functions.expressions.PqDistTable(
        ColumnBridge.expression(col(vecCol)), cb)).alias("__tab")))
    val scored = q.crossJoin(codes)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", ColumnBridge.column(graft.functions.expressions.PqAdcScore(
        ColumnBridge.expression(col("__tab")), ColumnBridge.expression(col("__codes")))))
      .filter(col("score").isNotNull)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").asc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }

  /** IVF-PQ: coarse IVF cell restriction + PQ byte-code ADC scoring within
    * the probed cells — the standard inverted-file-with-product-quantization
    * serving composition, from this engine's existing parts: cells come
    * from [[ivfAssignCells]], codes from the same fused PQ kernels. Builds
    * both index artifacts inline; a serving deployment materializes
    * `(codedCells, centroids)` + the codebook ONCE and calls
    * [[ivfPqTopKFromIndex]] per query batch.
    *
    * This is the raw-vector variant (codes encode the vectors themselves,
    * one ADC table per query); the classical residual refinement (encode
    * `v − centroid(cell)`, one table per probed cell) is the known
    * accuracy lever and costs nprobe× the table builds — left out until a
    * recall gate demands it.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      cells: Int = 16, nprobe: Int = 4, m: Int = 8, numCentroids: Int = 16,
      queryIdCol: String = "query_id", idCol: String = "vec_id",
      vecCol: String = "embedding", refineIters: Int = 0): DataFrame = {
    val (assigned, centroids) = ivfAssignCells(corpus, cells, idCol, vecCol, refineIters)
    val cb = pqCodebook(corpus, m, numCentroids, idCol, vecCol, refineIters)
    ivfPqTopKFromIndex(queries, pqEncodeCells(assigned, cb, idCol, vecCol),
      centroids, cb, k, nprobe, queryIdCol, vecCol)
  }

  /** Cell-tagged PQ code table `(cell_id, neighbor_id, __codes)` — the
    * IVF-PQ serving artifact: m bytes per vector AND cell-prunable, so a
    * probed query batch reads only its cells' code partitions (partition
    * the parquet by `cell_id` at write time).
    */
  def pqEncodeCells(assigned: DataFrame, cb: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    assigned.select(col("cell_id"), col(idCol).alias("neighbor_id"),
      ColumnBridge.column(graft.functions.expressions.PqEncode(
        ColumnBridge.expression(col(vecCol)), cb)).alias("__codes"))
  }

  /** IVF-PQ served from materialized artifacts ([[pqEncodeCells]] +
    * [[ivfAssignCells]]'s centroids + the deterministic codebook): probe
    * the `nprobe` nearest cells per query (k-row centroid broadcast), then
    * ADC-score ONLY those cells' byte codes — the per-batch corpus operand
    * is the coded cell table, raw vectors never touched, and the cell join
    * is the only corpus-sized operation.
    */
  def ivfPqTopKFromIndex(queries: DataFrame, codedCells: DataFrame,
      centroids: DataFrame, cb: Array[Array[Array[Double]]], k: Int,
      nprobe: Int = 4, queryIdCol: String = "query_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val qCells = queries
      .select(col(queryIdCol).alias("query_id"), col(vecCol).alias("__qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("__sim", cosine(col("__qv"), col("__centroid")))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("cell_id").asc)
    val probes = qCells.withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .filter(col("__sim").isNotNull)
      // the ADC table is built AFTER the probe window so the window rows
      // stay slim; nprobe table builds per query are m·k L2 sums — noise
      .select(col("query_id"), col("cell_id"),
        ColumnBridge.column(graft.functions.expressions.PqDistTable(
          ColumnBridge.expression(col("__qv")), cb)).alias("__tab"))
    val scored = probes.join(codedCells, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", ColumnBridge.column(graft.functions.expressions.PqAdcScore(
        ColumnBridge.expression(col("__tab")), ColumnBridge.expression(col("__codes")))))
      .filter(col("score").isNotNull)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").asc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }

  /** PQ with exact re-ranking — the standard two-stage ANN deployment:
    * [[pqTopK]] shortlists `candidates` neighbors per query from the byte
    * codes (m lookups/pair over the whole corpus), then only the shortlist
    * (candidates·|Q| rows, corpus-independent) is re-scored with the exact
    * cosine kernel. At 100 TB the raw vectors are touched for shortlist
    * rows only.
    *
    * @return (query_id, neighbor_id, rank, cosine) — rank by exact cosine
    */
  def pqRerankTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      candidates: Int = 20, m: Int = 8, numCentroids: Int = 16,
      queryIdCol: String = "query_id", idCol: String = "vec_id",
      vecCol: String = "embedding", refineIters: Int = 0): DataFrame = {
    require(candidates >= k, "candidate shortlist must be at least k")
    val shortlist = pqTopK(queries, corpus, candidates, m, numCentroids,
      queryIdCol, idCol, vecCol, refineIters)
      .select(col("query_id"), col("neighbor_id"))
    val q = queries.select(col(queryIdCol).alias("query_id"), col(vecCol).alias("__qv"))
    val c = corpus.select(col(idCol).alias("neighbor_id"), col(vecCol).alias("__cv"))
    // the shortlist (candidates x |Q| rows, corpus-independent) carries the
    // query vectors and BROADCASTS against the corpus — without the hint
    // this join would shuffle every raw corpus vector, which is exactly
    // what the two-stage design exists to avoid
    val scored = broadcast(shortlist.join(q, Seq("query_id")))
      .join(c, Seq("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    rankByCosine(scored, k)
  }

  /** Recall@k of an approximate ANN result against the exact result — the
    * standard evaluation for every approximate path here (LSH/IVF/PQ): per
    * query, |approx ∩ exact| / k. Both inputs are `(query_id, neighbor_id,
    * ..., rank?)` frames (e.g. [[lshTopK]] vs [[bruteForceTopK]]); when a
    * `rank` column is present, rows beyond rank k are ignored, so passing a
    * wider shortlist cannot inflate the metric past 1. The metric is TOTAL:
    * every query present in `exact` gets a row, including recall 0.0. One
    * left join + one keyed count — evaluation cost is shortlist-sized,
    * corpus-independent.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int,
      queryIdCol: String = "query_id", idCol: String = "neighbor_id"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    def topK(df: DataFrame) = {
      val capped = if (df.columns.contains("rank")) df.filter(col("rank") <= k) else df
      // distinct makes the ≤1.0 guarantee unconditional: a caller passing an
      // un-deduplicated rank-less candidate frame would otherwise multiply
      // exact rows through the left join and inflate the metric
      capped.select(col(queryIdCol).alias("query_id"), col(idCol).alias("neighbor_id"))
        .distinct()
    }
    topK(exact)
      .join(topK(approx).withColumn("__hit", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((sum(coalesce(col("__hit"), lit(0))).cast("double") / k).alias("recall"))
  }

  /** Symmetric int8 quantization of an embedding column — the storage/ANN
    * scale lever (4× smaller than float32, 8× smaller than float64; the
    * format IVF/PQ-style indexes score against). Per vector:
    * `scale = 127 / max|x|`, `q_i = floor(x_i·scale + 0.5)` — floor(x+.5)
    * instead of round() because half-way rounding is engine-convention
    * territory while floor is IEEE-pinned (differential-test requirement).
    * Zero/empty vectors quantize to scale 0 and all-zero codes.
    *
    * Evaluated by the fused native kernel
    * ([[graft.functions.expressions.Int8Quantize]] — one codegen'd
    * two-pass loop, no intermediate arrays); [[quantizeInt8Builtin]] is the
    * built-in-expression differential twin — use the twin for element
    * types the kernel rejects (decimal arrays), same convention as
    * [[hyperplaneBucketBuiltin]].
    */
  def quantizeInt8(v: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.Int8Quantize(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(v)))

  /** Built-in-only formulation of [[quantizeInt8]] — the differential
    * cross-check twin (three higher-order passes; same bits).
    */
  def quantizeInt8Builtin(v: Column): Column = {
    val mabs = array_max(transform(v, x => abs(x.cast("double"))))
    val scale = when(mabs.isNull || mabs === 0.0, lit(0.0)).otherwise(lit(127.0) / mabs)
    struct(
      scale.alias("scale"),
      // tinyint, not int: codes are in [-127,127] by construction, and the
      // 1-byte physical type is the entire point of the operator (4× vs
      // float32); an int column would store 4 bytes per code
      transform(v, x => floor(x.cast("double") * scale + 0.5).cast("byte")).alias("codes"))
  }

  /** Dequantize int8 codes back to doubles (`x ≈ code / scale`) — native
    * kernel ([[graft.functions.expressions.Int8Dequantize]]);
    * [[dequantizeInt8Builtin]] is the differential twin.
    */
  def dequantizeInt8(q: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.Int8Dequantize(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(q)))

  /** Built-in-only formulation of [[dequantizeInt8]] (differential twin). */
  def dequantizeInt8Builtin(q: Column): Column =
    when(q.getField("scale") === 0.0,
      transform(q.getField("codes"), _ => lit(0.0)))
      .otherwise(transform(q.getField("codes"),
        c => c.cast("double") / q.getField("scale")))

  /** SemDeDup-style semantic deduplication: embedding near-dup pairs →
    * connected components → keep the minimum-id representative per cluster.
    * Returns one row per corpus id: `(idCol, cluster_id, kept)` — singletons
    * are their own representative, so `filter(kept)` is the deduplicated
    * corpus. Scale shape: [[embeddingNearDuplicates]] is LSH-bucketed (never
    * all-pairs) and [[Dedup.clusters]] is the bounded min-label fixpoint;
    * the final join is one shuffle on the id.
    */
  def semanticDedup(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      numPlanes: Int = 6, keepBy: Option[Column] = None): DataFrame = {
    val pairs = embeddingNearDuplicates(corpus, threshold, idCol, vecCol, numPlanes)
    val labels = Dedup.clusters(pairs).withColumnRenamed("id", idCol)
    val labeled = corpus.select(col(idCol) +: keepBy.map(_.alias("__keep_by")).toSeq: _*)
      .join(labels, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).alias("cluster_id"),
        keepBy.map(_ => col("__keep_by")).getOrElse(lit(null)).alias("__keep_by"))
    keepBy match {
      // default: the min-id member (== the cluster label) represents — no
      // extra shuffle, `kept` is a row-local comparison
      case None =>
        labeled.select(col(idCol), col("cluster_id"),
          (col(idCol) === col("cluster_id")).alias("kept"))
      // quality election: keep the HIGHEST-keepBy member per cluster
      // (deterministic — ties break to the smaller id; nulls sort last so a
      // null quality never beats a scored one). Real pipelines keep the
      // best-quality duplicate, not the smallest id.
      case Some(_) =>
        val w = Window.partitionBy(col("cluster_id"))
          .orderBy(col("__keep_by").desc_nulls_last, col(idCol).asc)
        labeled
          .withColumn("kept", row_number().over(w) === 1)
          .select(col(idCol), col("cluster_id"), col("kept"))
    }
  }

  /** Embedding-cosine near-duplicate pairs (dedup by embedding): LSH-bucketed
    * self-join, exact cosine ≥ threshold.
    *
    * Scale guards (the bucket count 2^numPlanes is a CONSTANT, so at 100×
    * data an unguarded bucket join is O((N/2^planes)²) — quadratic in the
    * corpus):
    *   - `maxBucketSize` drops degenerate buckets via a window count over
    *     the join's own partition key (no extra shuffle, no re-evaluation
    *     of the bucketing lineage) — the same skew cap as the MinHash
    *     (`Dedup.nearDuplicates`) and SimHash (`Dedup.simhashNearDuplicates`)
    *     paths.
    *   - `numBands` independent plane sets (band b = planes b·numPlanes…)
    *     union their candidates, so a pair lost to a capped bucket in one
    *     band — or to an unlucky plane split — is still found by another.
    *     Candidate pairs are deduplicated BEFORE the exact kernel runs, so
    *     each surviving pair is scored exactly once.
    */
  def embeddingNearDuplicates(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      numPlanes: Int = 6, numBands: Int = 2, maxBucketSize: Int = 10000): DataFrame = {
    require(numPlanes >= 1, "numPlanes must be >= 1")
    require(numBands >= 1, "numBands must be >= 1")
    require(maxBucketSize >= 1, "maxBucketSize must be >= 1")
    val base = corpus.select(col(idCol), col(vecCol))
    val candidates = (0 until numBands).map { band =>
      val withBucket = base.select(col(idCol), col(vecCol),
        hyperplaneBucket(col(vecCol), numPlanes, band = band).alias("__bucket"))
      // cap via a window count sharing the self-join's __bucket partitioning
      val capped = withBucket
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__bucket"))))
        .filter(col("__n") <= maxBucketSize)
        .drop("__n")
      val a = capped.select(col("__bucket"), col(idCol).alias("id_a"), col(vecCol).alias("__va"))
      val b = capped.select(col("__bucket"), col(idCol).alias("id_b"), col(vecCol).alias("__vb"))
      a.join(b, Seq("__bucket"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("__va"), col("__vb"))
    }.reduce(_ unionByName _)
      // same (id_a, id_b) carries identical vectors in every band, so a
      // plain distinct dedups candidates without a join-back to the corpus
      .distinct()
    candidates
      .withColumn("cosine", cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
