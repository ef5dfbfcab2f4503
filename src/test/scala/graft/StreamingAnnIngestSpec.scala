package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.streaming.StreamingAnnIngest

/** Streaming IVF index maintenance end-to-end: exactly-once delta commits
  * across a forced restart, serving parity with the equivalent batch
  * pipeline (bootstrap assignment ∪ frozen-centroid append), crash-window
  * invisibility of uncommitted deltas, compaction, and the drift monitor.
  */
class StreamingAnnIngestSpec extends SparkSpec {
  import spark.implicits._

  // two clear directions in 3-D so cell structure is stable under any
  // deterministic centroid election
  private val corpus = Seq(
    (1L, Array(1.0, 0.05, 0.0)),
    (2L, Array(0.9, 0.1, 0.0)),
    (3L, Array(0.0, 0.1, 1.0)),
    (4L, Array(0.05, 0.0, 0.95))
  ).toDF("vec_id", "embedding")

  private val batch0 = Seq(
    (101L, Array(0.95, 0.02, 0.1)),
    (101L, Array(0.95, 0.02, 0.1)), // exact duplicate row (overlap re-read)
    (102L, Array(0.02, 0.05, 0.9)))
  private val batch1 = Seq(
    (201L, Array(0.85, 0.2, 0.05)))

  private def ingest(mem: MemoryStream[(Long, Array[Double])],
      indexDir: String, ckpt: String): Unit =
    StreamingAnnIngest.runAvailableNow(spark,
      mem.toDF().toDF("vec_id", "embedding"), indexDir, ckpt)

  test("exactly-once ingest, batch-parity serving, crash window, compaction, drift stats") {
    val root = Files.createTempDirectory("sann").toString
    val indexDir = s"$root/index"
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    StreamingAnnIngest.bootstrapIndex(spark, corpus, indexDir, cells = 2, refineIters = 1)
    assert(StreamingAnnIngest.currentIndex(spark, indexDir).count() == 4)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Double])]
    mem.addData(batch0)
    ingest(mem, indexDir, s"$root/ckpt1")
    // duplicate row collapsed by distinct, both ids admitted
    assert(StreamingAnnIngest.currentIndex(spark, indexDir).count() == 6)
    assert(spark.read.parquet(s"$indexDir/delta-00000000").count() == 2)

    mem.addData(batch1)
    ingest(mem, indexDir, s"$root/ckpt1")
    assert(StreamingAnnIngest.currentIndex(spark, indexDir).count() == 7)

    // serving parity with the equivalent batch pipeline: bootstrap
    // assignment ∪ frozen-centroid append of everything streamed
    val queries = Seq((1L, Array(1.0, 0.0, 0.0)), (2L, Array(0.0, 0.0, 1.0)))
      .toDF("query_id", "embedding")
    val served = StreamingAnnIngest.serveTopK(spark, indexDir, queries, k = 3, nprobe = 1)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val cents = StreamingAnnIngest.centroids(spark, indexDir)
    // dedup in Spark (structural array equality), mirroring the ingest path —
    // Scala's .distinct on Array-bearing tuples compares by reference
    val appended = (batch0 ++ batch1).toDF("vec_id", "embedding").distinct()
    val batchTwin = Similarity.ivfTopKFromIndex(queries,
      spark.read.parquet(s"$indexDir/base")
        .unionByName(Similarity.ivfAssignWith(appended, cents)),
      cents, k = 3, nprobe = 1)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(served == batchTwin && served.nonEmpty)

    // replay the whole source under a fresh checkpoint: markers skip both
    // batches, nothing double-appends
    val mem2 = MemoryStream[(Long, Array[Double])]
    mem2.addData(batch0)
    ingest(mem2, indexDir, s"$root/ckpt2")
    mem2.addData(batch1)
    ingest(mem2, indexDir, s"$root/ckpt2")
    assert(StreamingAnnIngest.currentIndex(spark, indexDir).count() == 7)

    // crash window: marker deleted (commit never happened) → the delta dir
    // is invisible to readers; a replay rewrites and recommits it
    assert(fs.delete(new Path(indexDir, "delta-00000001.committed"), false))
    assert(StreamingAnnIngest.currentIndex(spark, indexDir).count() == 6)
    val mem3 = MemoryStream[(Long, Array[Double])]
    mem3.addData(batch0)
    ingest(mem3, indexDir, s"$root/ckpt3")
    mem3.addData(batch1)
    ingest(mem3, indexDir, s"$root/ckpt3")
    assert(StreamingAnnIngest.currentIndex(spark, indexDir).count() == 7)

    // drift monitor: occupancy sums to the index size, cohesion in (0, 1]
    val stats = StreamingAnnIngest.cellStats(spark, indexDir)
      .select("cell_id", "n_vectors", "mean_cos").as[(Int, Long, Double)].collect()
    assert(stats.map(_._2).sum == 7)
    assert(stats.forall(s => s._3 > 0.0 && s._3 <= 1.0))

    // compaction folds base + deltas into one generation; serving unchanged
    assert(StreamingAnnIngest.compactIndex(spark, indexDir).contains("base-00000001"))
    assert(StreamingAnnIngest.currentIndex(spark, indexDir).count() == 7)
    val servedAfter = StreamingAnnIngest.serveTopK(spark, indexDir, queries, k = 3, nprobe = 1)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(servedAfter == served)
  }

  test("coded ingest: frozen codebook round-trips exactly; serving matches the batch twin; replay skips") {
    val root = Files.createTempDirectory("sannc").toString
    val indexDir = s"$root/index"
    // dim 3 isn't divisible by typical m; use dim-4 vectors, m=2 subspaces
    val corpus4 = Seq(
      (1L, Array(1.0, 0.05, 0.0, 0.1)), (2L, Array(0.0, 0.1, 1.0, 0.05)),
      (3L, Array(0.9, 0.1, 0.05, 0.0)), (4L, Array(0.05, 0.0, 0.95, 0.1))
    ).toDF("vec_id", "embedding")
    StreamingAnnIngest.bootstrapCodedIndex(spark, corpus4, indexDir,
      cells = 2, m = 2, numCentroids = 3, refineIters = 1)
    // the persisted codebook reconstructs bit-for-bit
    val cb = StreamingAnnIngest.codebook(spark, indexDir)
    val cbDirect = Similarity.pqCodebook(corpus4, m = 2, k = 3, refineIters = 1)
    assert(cb.length == cbDirect.length &&
      cb.flatten.flatten.toSeq == cbDirect.flatten.flatten.toSeq)

    implicit val sqlCtx = spark.sqlContext
    val appended = Seq((10L, Array(0.95, 0.02, 0.1, 0.05)),
      (11L, Array(0.02, 0.05, 0.9, 0.0)))
    val mem = MemoryStream[(Long, Array[Double])]
    mem.addData(appended)
    StreamingAnnIngest.runAvailableNowCoded(spark,
      mem.toDF().toDF("vec_id", "embedding"), indexDir, s"$root/ckpt1")
    assert(StreamingAnnIngest.currentIndex(spark, indexDir).count() == 6)

    val queries = Seq((100L, Array(1.0, 0.0, 0.0, 0.0))).toDF("query_id", "embedding")
    val served = StreamingAnnIngest.serveCodedTopK(spark, indexDir, queries,
      k = 3, nprobe = 1)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val cents = StreamingAnnIngest.centroids(spark, indexDir)
    val codedTwin = Similarity.ivfPqTopKFromIndex(queries,
      spark.read.parquet(s"$indexDir/base").unionByName(
        Similarity.pqEncodeCells(
          Similarity.ivfAssignWith(appended.toDF("vec_id", "embedding"), cents), cb)),
      cents, cb, k = 3, nprobe = 1)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(served == codedTwin && served.nonEmpty)

    // wholesale replay under a fresh checkpoint: the marker skips batch 0
    val mem2 = MemoryStream[(Long, Array[Double])]
    mem2.addData(appended)
    StreamingAnnIngest.runAvailableNowCoded(spark,
      mem2.toDF().toDF("vec_id", "embedding"), indexDir, s"$root/ckpt2")
    assert(StreamingAnnIngest.currentIndex(spark, indexDir).count() == 6)
  }

  test("mixing raw ingest/serving into a CODED index fails fast (no silent type skew)") {
    val root = Files.createTempDirectory("sannm").toString
    val indexDir = s"$root/index"
    val corpus4 = Seq(
      (1L, Array(1.0, 0.05, 0.0, 0.1)), (2L, Array(0.0, 0.1, 1.0, 0.05)),
      (3L, Array(0.9, 0.1, 0.05, 0.0)), (4L, Array(0.05, 0.0, 0.95, 0.1))
    ).toDF("vec_id", "embedding")
    StreamingAnnIngest.bootstrapCodedIndex(spark, corpus4, indexDir,
      cells = 2, m = 2, numCentroids = 3)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Double])]
    mem.addData(Seq((10L, Array(0.5, 0.5, 0.5, 0.5))))
    val e1 = intercept[IllegalStateException] { ingest(mem, indexDir, s"$root/ckpt") }
    assert(e1.getMessage.contains("CODED"))
    val queries = Seq((100L, Array(1.0, 0.0, 0.0, 0.0))).toDF("query_id", "embedding")
    val e2 = intercept[IllegalStateException] {
      StreamingAnnIngest.serveTopK(spark, indexDir, queries, k = 1)
    }
    assert(e2.getMessage.contains("serveCodedTopK"))
  }

  test("runAvailableNow without a bootstrap index fails fast") {
    val root = Files.createTempDirectory("sann2").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Double])]
    mem.addData(batch0)
    val e = intercept[IllegalStateException] {
      ingest(mem, s"$root/missing", s"$root/ckpt")
    }
    assert(e.getMessage.contains("bootstrapIndex"))
  }

  test("rebuild: retrain from the committed index equals a fresh bootstrap; stream resumes on the new generation") {
    val root = Files.createTempDirectory("sannr").toString
    val indexDir = s"$root/index"
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    StreamingAnnIngest.bootstrapIndex(spark, corpus, indexDir, cells = 2, refineIters = 1)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Double])]
    mem.addData(batch0)
    ingest(mem, indexDir, s"$root/ckpt1")
    assert(StreamingAnnIngest.currentIndex(spark, indexDir).count() == 6)

    // the drift answer: retrain on ALL committed vectors, swap generations
    assert(StreamingAnnIngest.rebuild(spark, indexDir, cells = 2, refineIters = 1)
      == "base-00000001")
    assert(StreamingAnnIngest.currentIndex(spark, indexDir).count() == 6)
    assert(fs.exists(new Path(indexDir, "centroids-00000001")))

    // parity: a fresh bootstrap over the same 6 vectors serves identically
    // (the deterministic centroid election sees the same rows)
    val full = corpus.unionByName(batch0.toDF("vec_id", "embedding")).distinct()
    val freshDir = s"$root/fresh"
    StreamingAnnIngest.bootstrapIndex(spark, full, freshDir, cells = 2, refineIters = 1)
    val queries = Seq((1L, Array(1.0, 0.0, 0.0)), (2L, Array(0.0, 0.0, 1.0)))
      .toDF("query_id", "embedding")
    def serve(dir: String) =
      StreamingAnnIngest.serveTopK(spark, dir, queries, k = 3, nprobe = 1)
        .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val rebuilt = serve(indexDir)
    assert(rebuilt == serve(freshDir) && rebuilt.nonEmpty)
    assert(StreamingAnnIngest.centroids(spark, indexDir)
      .collect().map(_.toString).sorted.toSeq ==
      StreamingAnnIngest.centroids(spark, freshDir)
        .collect().map(_.toString).sorted.toSeq)

    // the SAME checkpoint resumes: the next batch assigns against the NEW
    // centroids and the index keeps growing
    mem.addData(batch1)
    ingest(mem, indexDir, s"$root/ckpt1")
    assert(StreamingAnnIngest.currentIndex(spark, indexDir).count() == 7)
    // folded batches stay skipped under a wholesale replay (tombstones)
    val mem2 = MemoryStream[(Long, Array[Double])]
    mem2.addData(batch0)
    ingest(mem2, indexDir, s"$root/ckpt2")
    mem2.addData(batch1)
    ingest(mem2, indexDir, s"$root/ckpt2")
    assert(StreamingAnnIngest.currentIndex(spark, indexDir).count() == 7)

    // a second rebuild sweeps the superseded artifacts (deferred one
    // interval: the PREVIOUS generation's table survives for in-flight
    // readers; the one before it goes)
    assert(StreamingAnnIngest.rebuild(spark, indexDir, cells = 2, refineIters = 1)
      == "base-00000002")
    assert(!fs.exists(new Path(indexDir, "centroids")))
    assert(fs.exists(new Path(indexDir, "centroids-00000001")))
    assert(fs.exists(new Path(indexDir, "centroids-00000002")))
    assert(StreamingAnnIngest.currentIndex(spark, indexDir).count() == 7)

    // wrong-flavor guard
    val e = intercept[IllegalStateException](StreamingAnnIngest.rebuildCoded(
      spark, full, indexDir, cells = 2, m = 1, numCentroids = 2))
    assert(e.getMessage.contains("RAW"))
  }

  test("rebuildCoded: retrain from the raw corpus equals a fresh coded bootstrap; corpus drift rejected") {
    val root = Files.createTempDirectory("sanncr").toString
    val indexDir = s"$root/index"
    val corpus4 = Seq(
      (1L, Array(1.0, 0.05, 0.0, 0.1)), (2L, Array(0.0, 0.1, 1.0, 0.05)),
      (3L, Array(0.9, 0.1, 0.05, 0.0)), (4L, Array(0.05, 0.0, 0.95, 0.1))
    ).toDF("vec_id", "embedding")
    StreamingAnnIngest.bootstrapCodedIndex(spark, corpus4, indexDir,
      cells = 2, m = 2, numCentroids = 3, refineIters = 1)
    implicit val sqlCtx = spark.sqlContext
    val appended = Seq((10L, Array(0.95, 0.02, 0.1, 0.05)),
      (11L, Array(0.02, 0.05, 0.9, 0.0)))
    val mem = MemoryStream[(Long, Array[Double])]
    mem.addData(appended)
    StreamingAnnIngest.runAvailableNowCoded(spark,
      mem.toDF().toDF("vec_id", "embedding"), indexDir, s"$root/ckpt1")
    assert(StreamingAnnIngest.currentIndex(spark, indexDir).count() == 6)

    // codes are lossy → a drifted corpus is rejected before any retraining
    val e = intercept[IllegalArgumentException](StreamingAnnIngest.rebuildCoded(
      spark, corpus4, indexDir, cells = 2, m = 2, numCentroids = 3))
    assert(e.getMessage.contains("source of truth"))

    val full4 = corpus4.unionByName(appended.toDF("vec_id", "embedding")).distinct()
    assert(StreamingAnnIngest.rebuildCoded(spark, full4, indexDir,
      cells = 2, m = 2, numCentroids = 3, refineIters = 1) == "base-00000001")
    // parity with a fresh coded bootstrap of the same corpus
    val freshDir = s"$root/fresh"
    StreamingAnnIngest.bootstrapCodedIndex(spark, full4, freshDir,
      cells = 2, m = 2, numCentroids = 3, refineIters = 1)
    val queries = Seq((100L, Array(1.0, 0.0, 0.0, 0.0))).toDF("query_id", "embedding")
    def serve(dir: String) =
      StreamingAnnIngest.serveCodedTopK(spark, dir, queries, k = 3, nprobe = 1)
        .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val rebuilt = serve(indexDir)
    assert(rebuilt == serve(freshDir) && rebuilt.nonEmpty)
    // the rebuilt generation's codebook equals the fresh training
    assert(StreamingAnnIngest.codebook(spark, indexDir).flatten.flatten.toSeq ==
      StreamingAnnIngest.codebook(spark, freshDir).flatten.flatten.toSeq)
  }

  test("crashed bootstrap recovers on re-run; a completed index is never overwritten") {
    val root = Files.createTempDirectory("sann3").toString
    val indexDir = s"$root/index"
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash after the centroids write and mid-base-staging:
    // centroids + staging exist, base (the commit point, written last) does
    // not — previously the re-run died on the already-existing centroids dir
    corpus.limit(1).write.parquet(s"$indexDir/centroids")
    corpus.limit(1).write.parquet(s"$indexDir/.bootstrap-base-tmp")
    StreamingAnnIngest.bootstrapIndex(spark, corpus, indexDir, cells = 2, refineIters = 1)
    assert(StreamingAnnIngest.currentIndex(spark, indexDir).count() == 4)
    assert(!fs.exists(new Path(indexDir, ".bootstrap-base-tmp")))
    // a COMPLETED bootstrap refuses to be clobbered
    val e = intercept[IllegalStateException] {
      StreamingAnnIngest.bootstrapIndex(spark, corpus, indexDir, cells = 2)
    }
    assert(e.getMessage.contains("never overwrites"))
  }

  test("bootstrap refuses a GENERATION-FOLDED live index (liveness = resolved base)") {
    val root = Files.createTempDirectory("sann4").toString
    val indexDir = s"$root/index"
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    StreamingAnnIngest.bootstrapIndex(spark, corpus, indexDir, cells = 2, refineIters = 1)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Double])]
    mem.addData(batch0)
    ingest(mem, indexDir, s"$root/ck")
    // two folds: the second one's deferred sweep deletes the plain base dir
    assert(StreamingAnnIngest.compactIndex(spark, indexDir).contains("base-00000001"))
    // second stream needs its OWN txnAppId — its batch 0 would otherwise
    // alias the first checkpoint's batch-0 marker and be skipped
    val mem2 = MemoryStream[(Long, Array[Double])]
    mem2.addData(batch1)
    StreamingAnnIngest.runAvailableNow(spark,
      mem2.toDF().toDF("vec_id", "embedding"), indexDir, s"$root/ck2",
      txnAppId = "second")
    assert(StreamingAnnIngest.compactIndex(spark, indexDir).contains("base-00000002"))
    assert(!fs.exists(new Path(indexDir, "base")), "plain base swept by the second fold")
    // the index is LIVE (served through base-00000002): bootstrap must
    // refuse, not classify it as crashed garbage and destroy it
    val e = intercept[IllegalStateException] {
      StreamingAnnIngest.bootstrapIndex(spark, corpus, indexDir, cells = 2)
    }
    assert(e.getMessage.contains("never overwrites"))
    // 4 bootstrap + 2 from batch0 (dup row collapsed) + 1 from batch1
    assert(StreamingAnnIngest.currentIndex(spark, indexDir).count() == 7)
  }

  test("compactIndex sweeps a crashed rebuild's orphaned artifacts before bumping the generation") {
    val root = Files.createTempDirectory("sann5").toString
    val indexDir = s"$root/index"
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    StreamingAnnIngest.bootstrapIndex(spark, corpus, indexDir, cells = 2, refineIters = 1)
    val before = StreamingAnnIngest.centroids(spark, indexDir)
      .collect().map(_.toString).sorted.toSeq
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Double])]
    mem.addData(batch0)
    ingest(mem, indexDir, s"$root/ck")
    // crashed rebuild: centroids-00000001 staged, marker never published
    corpus.limit(1).write.parquet(s"$indexDir/centroids-00000001")
    // a plain compact bumps the base generation to 1 — without the sweep,
    // the orphan would suddenly resolve as the live centroid table
    assert(StreamingAnnIngest.compactIndex(spark, indexDir).contains("base-00000001"))
    assert(!fs.exists(new Path(indexDir, "centroids-00000001")),
      "orphaned rebuild staging swept before the generation bump")
    val after = StreamingAnnIngest.centroids(spark, indexDir)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before, "compaction must not change the served centroids")
  }
}
