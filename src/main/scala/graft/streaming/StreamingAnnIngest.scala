package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Similarity

/** Streaming ANN index maintenance — the continuous-ingest loop for an IVF
  * index: bootstrap once ([[Similarity.ivfAssignCells]] — deterministic
  * sampling + optional Lloyd refinement), then absorb each micro-batch of
  * new embeddings by assigning it to the FROZEN centroid table
  * ([[Similarity.ivfAssignWith]] — row-local, no shuffle) and appending the
  * assignment as a marker-committed delta. Serving
  * ([[Similarity.ivfTopKFromIndex]]) reads base + committed deltas, so new
  * vectors become searchable at batch granularity without ever rebuilding
  * the index.
  *
  * Index layout under `indexDir` (the [[MarkerLog]] base+delta protocol,
  * shared with [[StreamingDedup]] — same crash/replay/compaction
  * reasoning):
  * {{{
  *   indexDir/centroids/               // frozen centroid table (bootstrap)
  *   indexDir/base/                    // bootstrap corpus assignment
  *   indexDir/delta-[app-]00000000/    // batch 0's assigned vectors
  *   indexDir/delta-[app-]00000000.committed
  * }}}
  * foreachBatch is at-least-once; a replayed batch finds its marker and
  * skips, so the index grows EXACTLY-ONCE across restarts (markers keyed
  * (txnAppId, batchId) — see [[StreamingDedup]]'s restart contract, which
  * applies verbatim). Exact duplicate rows WITHIN a batch (an overlap
  * re-read) collapse via distinct; vector ids must otherwise be unique
  * across the stream — the standard append-only corpus contract.
  *
  * Centroids are FROZEN by design: assignment stays bit-stable as the
  * corpus grows (a Lloyd pass over base+deltas would silently re-cell
  * already-served vectors). The cost is drift — appended mass may fit the
  * frozen cells poorly. [[cellStats]] is the monitor: falling `mean_cos`
  * or a cell absorbing disproportionate `n_vectors` is the rebuild signal,
  * answered by [[rebuild]] (raw) / [[rebuildCoded]] (coded): retrain
  * centroids (+codebook), re-assign everything, publish as a new
  * generation under the same atomic marker swap as [[compactIndex]] —
  * the stream resumes on the new generation with its checkpoint intact.
  *
  * 100 TB shape: per batch, zero shuffles (centroid literals evaluate
  * row-local) and one small parquet append; serving's only corpus-sized
  * operation is the cell-id equi-join against probed cells. The delta
  * population grows by one dir per batch; [[compactIndex]] folds the log
  * back into a single generation (stream stopped, single-writer).
  */
object StreamingAnnIngest {
  import MarkerLog.{keyedName, validateAppId}

  /** Build the index at `indexDir`: frozen centroids + the bootstrap
    * corpus assignment (generation-0 base).
    *
    * Crash contract: `base/` is written LAST, staged and renamed into
    * place, so its existence is the bootstrap's commit point (matching
    * [[MarkerLog]]'s "generation 0 committed by existence"). A crash
    * mid-bootstrap leaves no base → every reader/ingest refuses with
    * "call bootstrapIndex first", and RE-RUNNING the bootstrap recovers:
    * partial artifacts (centroids/codebook without a base) are cleared
    * and rewritten. A COMPLETED bootstrap is never overwritten — rebuild
    * or clear the dir explicitly.
    */
  def bootstrapIndex(spark: SparkSession, corpus: DataFrame, indexDir: String,
      cells: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      refineIters: Int = 0): Unit = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    clearCrashedBootstrap(fs, root)
    val (assigned, centroids) =
      Similarity.ivfAssignCells(corpus, cells, idCol, vecCol, refineIters)
    centroids.write.parquet(new Path(indexDir, "centroids").toString)
    publishBase(assigned, root, fs)
  }

  /** Re-running a bootstrap whose previous attempt crashed must recover,
    * not trip over the partial artifacts: base absent (written last) means
    * nothing is committed, so centroids/codebook/staging are crashed-
    * attempt garbage — cleared here. Base PRESENT is a live index: fail
    * loudly rather than silently clobber what a stream may be serving.
    */
  private def clearCrashedBootstrap(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Unit = {
    // liveness = the RESOLVED base, not the literal "base" dir: after a
    // generation fold the plain dir is swept and the live base is
    // base-<gen>/ — testing only "base" would misclassify a folded live
    // index as crashed garbage and destroy it
    if (fs.exists(root) && fs.exists(MarkerLog.resolveBase(fs, root)._1))
      throw new IllegalStateException(
        s"StreamingAnnIngest: $root already holds a bootstrapped index — " +
          "bootstrap never overwrites a live index; use rebuild, or clear " +
          "the directory explicitly")
    Seq("centroids", "codebook", BaseStaging).foreach { n =>
      val p = new Path(root, n)
      if (fs.exists(p) && !fs.delete(p, true))
        throw new java.io.IOException(
          s"StreamingAnnIngest: cannot clear crashed bootstrap artifact $p")
    }
  }

  private val BaseStaging = ".bootstrap-base-tmp"

  /** Stage the base assignment and rename it into place — the bootstrap's
    * single commit point (dir rename is atomic on HDFS-like filesystems;
    * on object stores run bootstrap under the same no-concurrent-reader
    * regime as any one-time build job).
    */
  private def publishBase(df: DataFrame, root: Path,
      fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val tmp = new Path(root, BaseStaging)
    df.write.parquet(tmp.toString)
    if (!fs.rename(tmp, new Path(root, "base")))
      throw new java.io.IOException(
        s"StreamingAnnIngest: cannot publish bootstrap base under $root")
  }

  /** The frozen centroid table of the CURRENT generation: the bootstrap's
    * `centroids/` until a [[rebuild]] commits a generation-numbered
    * successor (`centroids-<gen>/`), after which the highest one at or
    * below the current base generation wins — a plain [[compactIndex]]
    * bumps the base generation without retraining, so resolution is
    * "highest at-or-below", not "exact".
    */
  def centroids(spark: SparkSession, indexDir: String): DataFrame = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(resolveArtifact(fs, root, "centroids").getOrElse(
      throw new IllegalStateException(
        s"StreamingAnnIngest: no centroid table under $indexDir")).toString)
  }

  private def artifactRe(name: String) =
    (java.util.regex.Pattern.quote(name) + "-(\\d{8,})").r

  /** Resolve artifact `name` ("centroids"/"codebook") for the current base
    * generation: the highest `name-<g>` dir with `g` at or below the base
    * generation, else the plain bootstrap dir, else None. Dirs ABOVE the
    * base generation are crashed rebuild staging — never resolved.
    */
  private def resolveArtifact(fs: org.apache.hadoop.fs.FileSystem, root: Path,
      name: String): Option[Path] = {
    if (!fs.exists(root)) return None
    val gen = MarkerLog.generationOf(MarkerLog.resolveBase(fs, root)._1.getName)
    val re = artifactRe(name)
    val gens = fs.listStatus(root).toSeq.flatMap(s => s.getPath.getName match {
      case re(g) if s.isDirectory && g.toLong <= gen => Some(g.toLong)
      case _ => None
    })
    if (gens.nonEmpty) Some(new Path(root, f"$name-${gens.max}%08d"))
    else Some(new Path(root, name)).filter(fs.exists)
  }

  /** Deferred sweep of superseded/crashed artifact dirs — the sidecar twin
    * of [[MarkerLog.compact]]'s data sweep, run at the START of each
    * rebuild so in-flight readers of the previous generation get a full
    * rebuild interval to finish.
    */
  private def sweepStaleArtifacts(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Unit =
    Seq("centroids", "codebook").foreach { name =>
      val resolved = resolveArtifact(fs, root, name)
      val doomed = fs.listStatus(root).toSeq.filter { s =>
        val n = s.getPath.getName
        s.isDirectory &&
          (n == name ||
            n.matches(java.util.regex.Pattern.quote(name) + "-\\d{8,}")) &&
          !resolved.map(_.getName).contains(n)
      }
      doomed.foreach { s =>
        if (!fs.delete(s.getPath, true))
          throw new java.io.IOException(
            s"StreamingAnnIngest: cannot sweep stale artifact ${s.getPath}")
      }
    }

  /** The committed assignment: base generation + unsuperseded committed
    * deltas (marker-driven listing — see [[MarkerLog.currentPaths]]).
    */
  def currentIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(MarkerLog.currentPaths(fs, root, "delta").map(_.toString): _*)
  }

  /** Ingest the stream to completion (AvailableNow): each batch is
    * assigned to the frozen centroids and committed as one delta.
    * Restart-safe via (txnAppId, batchId) markers — re-run with the same
    * checkpoint and committed batches are skipped. Refuses a CODED index
    * (a raw-vector delta in a coded log would silently vanish from ADC
    * serving) — use [[runAvailableNowCoded]] there.
    */
  def runAvailableNow(
      spark: SparkSession,
      stream: DataFrame,
      indexDir: String,
      checkpointDir: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      txnAppId: String = ""
  ): Unit =
    runIngest(spark, stream, indexDir, checkpointDir, idCol, vecCol, txnAppId,
      coded = false) { (rows, cents, _) =>
      Similarity.ivfAssignWith(rows, cents, idCol, vecCol)
    }

  /** The one ingest loop both delta flavors share: guard the index shape,
    * load the frozen artifacts once, then per batch — marker check,
    * distinct (overlap re-reads), transform, marker-commit. The raw and
    * coded paths differ ONLY in the transform and in which artifacts must
    * exist, so the restart/exactly-once contract lives exactly once.
    */
  private def runIngest(spark: SparkSession, stream: DataFrame, indexDir: String,
      checkpointDir: String, idCol: String, vecCol: String, txnAppId: String,
      coded: Boolean)(
      transform: (DataFrame, DataFrame, Option[Array[Array[Array[Double]]]]) => DataFrame): Unit = {
    validateAppId(txnAppId)
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasCodebook = resolveArtifact(fs, root, "codebook").isDefined
    if (resolveArtifact(fs, root, "centroids").isEmpty ||
        !fs.exists(MarkerLog.resolveBase(fs, root)._1) || (coded && !hasCodebook))
      throw new IllegalStateException(
        s"StreamingAnnIngest: no ${if (coded) "coded " else ""}bootstrap index at " +
          s"$indexDir — call bootstrap${if (coded) "Coded" else ""}Index first")
    // a codebook marks the index as byte-coded: mixing raw-vector deltas
    // into it would type-skew the log and silently drop those vectors from
    // ADC serving — fail loudly instead
    if (!coded && hasCodebook)
      throw new IllegalStateException(
        s"StreamingAnnIngest: $indexDir is a CODED index (codebook present) — " +
          "use runAvailableNowCoded")
    // loaded ONCE per run, not per batch: the artifacts are frozen and tiny
    // (both become row-local literals inside the transform anyway)
    val cents = centroids(spark, indexDir).localCheckpoint(true)
    val cb = if (coded) Some(codebook(spark, indexDir)) else None
    val query = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val marker = new Path(root,
          keyedName("delta", txnAppId, batchId) + ".committed")
        if (!fs.exists(marker)) { // exactly-once: marker absent → process
          // distinct absorbs exact duplicate rows from an overlap re-read;
          // ids are otherwise unique across the stream by contract (two
          // DIFFERENT vectors under one id are that contract broken, not
          // data this operator can arbitrate)
          val rows = batch.select(col(idCol), col(vecCol)).distinct()
          MarkerLog.commitDir(transform(rows, cents, cb),
            new Path(root, keyedName("delta", txnAppId, batchId)), fs)
        }
        ()
      }
      .start()
    query.awaitTermination()
  }

  /** Serve a query batch from the committed index — base + every delta
    * ingested so far, probed and scored exactly like the bootstrap-only
    * index ([[Similarity.ivfTopKFromIndex]]).
    */
  def serveTopK(spark: SparkSession, indexDir: String, queries: DataFrame,
      k: Int, nprobe: Int = 4, queryIdCol: String = "query_id",
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (resolveArtifact(fs, root, "codebook").isDefined)
      throw new IllegalStateException(
        s"StreamingAnnIngest: $indexDir is a CODED index (codebook present) — " +
          "use serveCodedTopK")
    Similarity.ivfTopKFromIndex(queries, currentIndex(spark, indexDir),
      centroids(spark, indexDir), k, nprobe, queryIdCol, idCol, vecCol)
  }

  /** Drift monitor over the committed index — see
    * [[Similarity.ivfCellStats]].
    */
  def cellStats(spark: SparkSession, indexDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Similarity.ivfCellStats(currentIndex(spark, indexDir),
      centroids(spark, indexDir), idCol, vecCol)

  // =========================================================================
  // Byte-code (IVF-PQ) variant: deltas carry m-byte PQ codes instead of raw
  // vectors — the serving-memory shape for 100 TB corpora (the coded cell
  // table is ~dim·8/m times smaller than the float vectors it replaces).
  // Centroids AND codebook are frozen at bootstrap; both persist so restart
  // serves/ingests with the exact trained artifacts, never a re-derivation.
  // =========================================================================

  /** Bootstrap the coded index: frozen IVF centroids + frozen PQ codebook
    * + the coded bootstrap assignment as the base generation. Same crash
    * contract as [[bootstrapIndex]]: base is staged and published last, a
    * crashed attempt re-runs cleanly, a live index is never overwritten.
    */
  def bootstrapCodedIndex(spark: SparkSession, corpus: DataFrame, indexDir: String,
      cells: Int, m: Int, numCentroids: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      refineIters: Int = 0): Unit = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    clearCrashedBootstrap(fs, root)
    val (assigned, centroids) =
      Similarity.ivfAssignCells(corpus, cells, idCol, vecCol, refineIters)
    val cb = Similarity.pqCodebook(corpus, m, numCentroids, idCol, vecCol, refineIters)
    centroids.write.parquet(new Path(indexDir, "centroids").toString)
    writeCodebook(spark, cb, new Path(indexDir, "codebook").toString)
    publishBase(Similarity.pqEncodeCells(assigned, cb, idCol, vecCol), root, fs)
  }

  /** The frozen PQ codebook written at bootstrap, reconstructed exactly
    * (doubles round-trip parquet bit-for-bit).
    */
  def codebook(spark: SparkSession, indexDir: String): Array[Array[Array[Double]]] = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = resolveArtifact(fs, root, "codebook").getOrElse(
      throw new IllegalStateException(
        s"StreamingAnnIngest: no codebook under $indexDir"))
    val rows = spark.read.parquet(dir.toString)
      .collect().map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Double](2).toArray))
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val cb = Array.ofDim[Array[Double]](m, k)
    rows.foreach { case (s, j, v) => cb(s)(j) = v }
    cb.map(_.toArray)
  }

  private def codebookFrame(spark: SparkSession,
      cb: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    cb.zipWithIndex.flatMap { case (sub, s) =>
      sub.zipWithIndex.map { case (v, j) => (s, j, v.toSeq) }
    }.toSeq.toDF("s", "j", "centroid").coalesce(1)
  }

  private def writeCodebook(spark: SparkSession,
      cb: Array[Array[Array[Double]]], dir: String): Unit =
    codebookFrame(spark, cb).write.parquet(dir)

  /** Coded twin of [[runAvailableNow]]: each batch is assigned to the
    * frozen centroids, PQ-encoded with the frozen codebook (both row-local
    * — zero shuffles per batch), and committed as one coded delta. Same
    * marker/restart contract ([[runIngest]]).
    */
  def runAvailableNowCoded(
      spark: SparkSession,
      stream: DataFrame,
      indexDir: String,
      checkpointDir: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      txnAppId: String = ""
  ): Unit =
    runIngest(spark, stream, indexDir, checkpointDir, idCol, vecCol, txnAppId,
      coded = true) { (rows, cents, cb) =>
      Similarity.pqEncodeCells(
        Similarity.ivfAssignWith(rows, cents, idCol, vecCol), cb.get, idCol, vecCol)
    }

  /** Serve ADC top-k from the committed coded index — base + every coded
    * delta, probed and byte-scored like the bootstrap-only index
    * ([[Similarity.ivfPqTopKFromIndex]]).
    */
  def serveCodedTopK(spark: SparkSession, indexDir: String, queries: DataFrame,
      k: Int, nprobe: Int = 4, queryIdCol: String = "query_id",
      vecCol: String = "embedding"): DataFrame =
    Similarity.ivfPqTopKFromIndex(queries, currentIndex(spark, indexDir),
      centroids(spark, indexDir), codebook(spark, indexDir), k, nprobe,
      queryIdCol, vecCol)

  /** Fold base + committed deltas into a new single generation — the
    * [[MarkerLog.compact]] protocol (stream stopped, single-writer).
    * Stale artifact staging is swept FIRST, while the base generation is
    * still the old one: a crashed rebuild's `centroids-<gen+1>` orphan is
    * unresolvable now, but would become the resolved artifact the moment
    * this fold bumps the base generation past it — silently serving
    * centroids the committed assignment was never built against.
    */
  def compactIndex(spark: SparkSession, indexDir: String): Option[String] = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    sweepStaleArtifacts(fs, root)
    MarkerLog.compact(spark, root, "delta")
  }

  /** Rebuild the RAW index in place: retrain centroids from the vectors the
    * committed index holds (base + every committed delta — the raw index IS
    * the corpus), re-assign everything, and publish assignment + new
    * centroid table (`centroids-<gen>/`) as one new generation. The marker
    * publish is the single commit point — a crash leaves the old
    * generation fully served and the half-built artifacts as invisible
    * garbage the next rebuild sweeps. Folded deltas' markers stay as
    * replay tombstones, so the stream RESUMES on the rebuilt index with
    * its checkpoint intact (re-delivered batches skip; new batches assign
    * against the new centroids — [[centroids]] resolves per generation).
    *
    * Single-writer maintenance op: run with the stream STOPPED, like
    * [[compactIndex]]. Deterministic end to end (the [[Similarity
    * .ivfAssignCells]] election), so rebuilding equals a fresh bootstrap
    * of the same vectors — the spec pins that.
    *
    * @return the new base generation's dir name
    */
  def rebuild(spark: SparkSession, indexDir: String, cells: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      refineIters: Int = 0): String = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (resolveArtifact(fs, root, "codebook").isDefined)
      throw new IllegalStateException(
        s"StreamingAnnIngest: $indexDir is a CODED index (codebook present) — " +
          "use rebuildCoded")
    sweepStaleArtifacts(fs, root)
    MarkerLog.foldGeneration(spark, root, "delta", requireDeltas = false) {
      (data, newGen) =>
        val (assigned, cents) = Similarity.ivfAssignCells(
          data.select(col(idCol), col(vecCol)), cells, idCol, vecCol, refineIters)
        stageArtifact(fs, root, "centroids", newGen, cents)
        assigned
    }.get // requireDeltas=false: a rebuild always commits
  }

  /** Rebuild the CODED index: PQ codes are lossy, so the committed index
    * cannot reproduce the raw vectors — the caller supplies `corpus`, the
    * raw source of truth, which must cover EXACTLY the indexed ids
    * (checked; a drifted corpus would silently rebuild a different index).
    * Retrains centroids AND codebook, re-encodes everything, and publishes
    * code table + `centroids-<gen>/` + `codebook-<gen>/` as one new
    * generation under the same crash/replay contract as [[rebuild]].
    */
  def rebuildCoded(spark: SparkSession, corpus: DataFrame, indexDir: String,
      cells: Int, m: Int, numCentroids: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      refineIters: Int = 0): String = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (resolveArtifact(fs, root, "codebook").isEmpty)
      throw new IllegalStateException(
        s"StreamingAnnIngest: $indexDir is a RAW index (no codebook) — use rebuild")
    sweepStaleArtifacts(fs, root)
    MarkerLog.foldGeneration(spark, root, "delta", requireDeltas = false) {
      (data, newGen) =>
        // bag-equality in ONE job (signed union + group-by + net-count
        // probe) instead of two exceptAll shuffles + two actions
        val idxIds = data.select(col("neighbor_id").alias("__id"),
          org.apache.spark.sql.functions.lit(1L).alias("__sgn"))
        val corpIds = corpus.select(col(idCol).alias("__id"),
          org.apache.spark.sql.functions.lit(-1L).alias("__sgn"))
        require(idxIds.unionByName(corpIds).groupBy(col("__id"))
            .agg(org.apache.spark.sql.functions.sum(col("__sgn")).alias("__net"))
            .filter(col("__net") =!= 0L).isEmpty,
          "rebuildCoded: corpus must cover exactly the indexed ids — " +
            "codes are lossy, so the raw corpus is the rebuild's source of truth")
        val (assigned, cents) = Similarity.ivfAssignCells(
          corpus.select(col(idCol), col(vecCol)), cells, idCol, vecCol, refineIters)
        val cb = Similarity.pqCodebook(corpus, m, numCentroids, idCol, vecCol, refineIters)
        stageArtifact(fs, root, "centroids", newGen, cents)
        stageArtifact(fs, root, "codebook", newGen, codebookFrame(spark, cb))
        Similarity.pqEncodeCells(assigned, cb, idCol, vecCol)
    }.get
  }

  /** Stage a generation-numbered sidecar artifact before the fold's marker
    * publish — clearing any same-name crashed attempt first.
    */
  private def stageArtifact(fs: org.apache.hadoop.fs.FileSystem, root: Path,
      name: String, gen: Long, df: DataFrame): Unit = {
    val dir = new Path(root, f"$name-$gen%08d")
    if (fs.exists(dir) && !fs.delete(dir, true))
      throw new java.io.IOException(
        s"StreamingAnnIngest: cannot clear stale artifact attempt $dir")
    df.write.parquet(dir.toString)
  }

  /** Prune folded deltas' replay tombstones for batches the checkpoint has
    * durably committed past — see [[StreamingDedup.pruneTombstones]].
    */
  def pruneTombstones(spark: SparkSession, indexDir: String,
      upToBatchId: Long, txnAppId: String = ""): Seq[String] =
    MarkerLog.pruneTombstones(spark, new Path(indexDir), "delta", upToBatchId, txnAppId)
}
