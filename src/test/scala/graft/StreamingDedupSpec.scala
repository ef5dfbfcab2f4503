package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDedup

/** Streaming incremental dedup end-to-end: a growing signature index served
  * to later batches, exactly-once growth across a forced restart, the
  * crash window between the matches commit and the index-delta commit,
  * and invisibility of uncommitted staging data.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different content about spark engines and scale"),
    (4L, "the quick brown fox jumps over the lazy dog"),
    (5L, "")
  ).toDF("doc_id", "text")

  private val batch0 = Seq(
    (101L, "the quick brown fox jumps over the lazy dog"), // dup of 1/2/4
    (102L, "totally novel content about deep sea creatures and their bioluminescent signalling patterns"))
  private val batch1 = Seq(
    (201L, "totally novel content about deep sea creatures and their bioluminescent signalling patterns indeed"), // near-dup of 102 — only in the GROWN index
    (202L, "totally novel content about deep sea creatures and their bioluminescent signalling patterns indeed")) // exact dup of 201, same batch

  test("index grows exactly-once; grown index serves later batches; crash window converges") {
    val root = Files.createTempDirectory("sdedup").toString
    val (indexDir, matchesDir) = (s"$root/index", s"$root/matches")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    StreamingDedup.bootstrapIndex(spark, corpus, indexDir)
    assert(StreamingDedup.currentIndex(spark, indexDir).count() == 5)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    def run(ckpt: String) = StreamingDedup.runAvailableNow(spark,
      mem.toDF().toDF("doc_id", "text"), indexDir, matchesDir, ckpt,
      threshold = 0.5)

    // batch 0: 101 matches the bootstrap corpus; 102 is novel → admitted
    mem.addData(batch0)
    val m0 = run(s"$root/ckpt1")
      .select("new_id", "corpus_id", "batch_id").as[(Long, Long, Long)].collect().toSet
    assert(m0 == Set((101L, 1L, 0L), (101L, 2L, 0L), (101L, 4L, 0L)))
    assert(StreamingDedup.currentIndex(spark, indexDir).count() == 6) // +102 only
    assert(spark.read.parquet(s"$indexDir/delta-00000000").count() == 1)

    // batch 1 (same checkpoint): 202 collapses to 201 within the batch;
    // 201 matches 102 — a member that exists ONLY because the index grew
    mem.addData(batch1)
    val m1 = run(s"$root/ckpt1")
      .select("new_id", "corpus_id", "batch_id").as[(Long, Long, Long)].collect().toSet
    assert(m1.contains((201L, 102L, 1L)) && m1.contains((202L, 201L, 1L)))
    assert(m1.size == 5)
    assert(StreamingDedup.currentIndex(spark, indexDir).count() == 6) // nothing admitted
    assert(spark.read.parquet(s"$indexDir/delta-00000001").count() == 0)

    // crash injection: the batch-1 writer died AFTER committing its matches
    // but BEFORE the index-delta commit — its delta dir may exist partially
    // written, but the marker (the commit) does not
    assert(fs.delete(new Path(indexDir, "delta-00000001.committed"), false))
    // the uncommitted dir is invisible to readers (marker-driven listing)
    assert(StreamingDedup.currentIndex(spark, indexDir).count() == 6)

    // forced restart replaying the source wholesale under a fresh checkpoint:
    // batch 0 re-delivers → marker present → skipped outright;
    // batch 1 re-delivers → recomputed against the identical pre-batch
    // index, matches commit skips (marker present), stale delta dir is
    // cleared and rewritten, delta commits
    val mem2 = MemoryStream[(Long, String)]
    def rerun(ckpt: String) = StreamingDedup.runAvailableNow(spark,
      mem2.toDF().toDF("doc_id", "text"), indexDir, matchesDir, ckpt,
      threshold = 0.5)
    mem2.addData(batch0)
    rerun(s"$root/ckpt2")
    mem2.addData(batch1)
    val mr = rerun(s"$root/ckpt2")
      .select("new_id", "corpus_id", "batch_id").as[(Long, Long, Long)].collect().toSet
    assert(mr == m1)                                                  // matches exactly-once
    assert(StreamingDedup.currentIndex(spark, indexDir).count() == 6) // index exactly-once
    assert(fs.exists(new Path(indexDir, "delta-00000001.committed"))) // marker restored
  }

  test("uncommitted staging dirs are invisible; empty stream returns an empty typed frame") {
    val root = Files.createTempDirectory("sdedup2").toString
    val (indexDir, matchesDir) = (s"$root/index", s"$root/matches")
    StreamingDedup.bootstrapIndex(spark, corpus, indexDir)
    // a crashed writer left a partially-written delta with NO marker — it
    // must not be read (and a half-written parquet dir would even fail to
    // parse, so visibility here means a crashed stream wedges on restart)
    Seq((999L, Array(1L, 2L, 3L))).toDF("doc_id", "__sig")
      .write.parquet(s"$indexDir/delta-00000007")
    assert(StreamingDedup.currentIndex(spark, indexDir).count() == 5)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    // no data added: zero batches fire, no matches dir is ever created —
    // an idle ingest tick must return an empty frame, not throw
    val out = StreamingDedup.runAvailableNow(spark,
      mem.toDF().toDF("doc_id", "text"), indexDir, matchesDir, s"$root/ckpt")
    assert(out.isEmpty)
    assert(out.columns.toSeq == Seq("new_id", "corpus_id", "jaccard_est", "batch_id"))
  }

  test("null-text documents are never cross-matched; each is admitted separately") {
    val root = Files.createTempDirectory("sdedup_null").toString
    StreamingDedup.bootstrapIndex(spark, corpus, s"$root/index")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(Seq((301L, null: String), (302L, null: String),
      (303L, "a real document about entirely fresh things never indexed before")))
    val out = StreamingDedup.runAvailableNow(spark,
      mem.toDF().toDF("doc_id", "text"), s"$root/index", s"$root/matches",
      s"$root/ckpt", threshold = 0.5)
    // the two null-text docs share a null fingerprint but must NOT be
    // reported as duplicates of each other
    assert(out.isEmpty)
    assert(StreamingDedup.currentIndex(spark, s"$root/index").count() == 5 + 3)
  }

  test("signature-length mismatch with the bootstrap index fails fast") {
    val root = Files.createTempDirectory("sdedup3").toString
    StreamingDedup.bootstrapIndex(spark, corpus, s"$root/index", numHashes = 8)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val e = intercept[IllegalArgumentException] {
      StreamingDedup.runAvailableNow(spark, mem.toDF().toDF("doc_id", "text"),
        s"$root/index", s"$root/matches", s"$root/ckpt") // wants 4*3 = 12
    }
    assert(e.getMessage.contains("(8)") && e.getMessage.contains("= 12"))
  }

  test("MIXED-length index (delta appended with a different numHashes) fails fast") {
    // a single-row sample can land on a matching row and pass; the distinct-
    // length audit must catch the mismatched SUBSET (the ADVICE race: base
    // at 12 hashes, a later delta at 8 — its bands would silently drop)
    val root = Files.createTempDirectory("sdedup5").toString
    StreamingDedup.bootstrapIndex(spark, corpus, s"$root/index", numHashes = 12)
    import graft.operators.Dedup
    val rogue = Dedup.signatureIndex(
      Seq((99L, "a rogue delta built with the wrong hash count")).toDF("doc_id", "text"),
      "doc_id", "text", numHashes = 8)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    rogue.write.parquet(s"$root/index/delta-00000000")
    fs.create(new Path(s"$root/index/delta-00000000.committed"), true).close()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val e = intercept[IllegalArgumentException] {
      StreamingDedup.runAvailableNow(spark, mem.toDF().toDF("doc_id", "text"),
        s"$root/index", s"$root/matches", s"$root/ckpt")
    }
    assert(e.getMessage.contains("8") && e.getMessage.contains("12"))
  }

  test("compactIndex: atomic generation swap, stream continues, crashed sweep stays invisible") {
    val root = Files.createTempDirectory("sdedup_compact").toString
    val (indexDir, matchesDir) = (s"$root/index", s"$root/matches")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    StreamingDedup.bootstrapIndex(spark, corpus, indexDir)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    def run() = StreamingDedup.runAvailableNow(spark,
      mem.toDF().toDF("doc_id", "text"), indexDir, matchesDir, s"$root/ckpt",
      threshold = 0.5)
    mem.addData(batch0)
    run()
    def indexRows() = StreamingDedup.currentIndex(spark, indexDir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val before = indexRows()
    assert(before.length == 6 && fs.exists(new Path(indexDir, "delta-00000000")))

    // compact: one new generation, identical contents. Superseded DATA dirs
    // are swept DEFERRED (an in-flight reader of the old generation gets a
    // full compaction interval), and the folded delta's MARKER stays behind
    // as a replay tombstone (the crash window between a delta commit and
    // Spark's offset-log write replays the batch — only the marker's
    // existence stops a re-append)
    assert(StreamingDedup.compactIndex(spark, indexDir).contains("base-00000001"))
    assert(indexRows() == before)
    assert(fs.exists(new Path(indexDir, "base-00000001.committed")))
    assert(fs.exists(new Path(indexDir, "base")) &&
      fs.exists(new Path(indexDir, "delta-00000000")),
      "superseded data dirs are retained until the NEXT compaction")
    assert(fs.exists(new Path(indexDir, "delta-00000000.committed")),
      "folded delta marker must survive as a replay tombstone")

    // nothing left to fold — but the deferred sweep of generation 1's
    // superseded dirs runs now
    assert(StreamingDedup.compactIndex(spark, indexDir).isEmpty)
    assert(!fs.exists(new Path(indexDir, "base")))
    assert(!fs.exists(new Path(indexDir, "delta-00000000")))

    // the stream keeps running against the compacted base (same checkpoint):
    // 201 matches 102 — a member that now lives only in base-00000001
    mem.addData(batch1)
    val m1 = run().select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(m1.contains((201L, 102L)) && m1.contains((202L, 201L)))
    assert(indexRows() == before) // batch1 admitted nothing

    // crash window: a compaction that published its marker but died before
    // the sweep leaves folded dirs on disk — recreate that state for a dir
    // the CURRENT base marker lists as superseded, with poisoned contents
    import graft.operators.Dedup
    Dedup.signatureIndex(Seq((999L, "poison row that must never be read"))
        .toDF("doc_id", "text"), "doc_id", "text", 12)
      .write.parquet(s"$indexDir/delta-00000000")
    fs.create(new Path(s"$indexDir/delta-00000000.committed"), true).close()
    assert(indexRows() == before, "superseded dir must stay invisible to readers")

    // the next compaction sweeps the recreated leftover (start-of-call
    // sweep of generation-1 folds) and folds the live (empty)
    // delta-00000001 into generation 2; the CUMULATIVE superseded list
    // keeps generation-1 folds invisible too. base-00000001's DATA dir is
    // deferred-retained; its marker goes immediately (markers are never
    // read by in-flight scans)
    assert(StreamingDedup.compactIndex(spark, indexDir).contains("base-00000002"))
    assert(indexRows() == before)
    assert(!fs.exists(new Path(indexDir, "delta-00000000")))
    assert(fs.exists(new Path(indexDir, "base-00000001")),
      "just-superseded base data dir is deferred-retained")
    assert(!fs.exists(new Path(indexDir, "base-00000001.committed")),
      "old base marker is not a tombstone — no batch is keyed by it")
    assert(fs.exists(new Path(indexDir, "delta-00000000.committed")) &&
      fs.exists(new Path(indexDir, "delta-00000001.committed")),
      "every folded delta keeps its tombstone across generations")

    // crash-window replay AFTER compaction: the source re-delivers the
    // folded batches wholesale (fresh checkpoint = the at-least-once
    // worst case). Tombstones make every replayed batch skip — the index
    // must not grow a second copy of any folded signature.
    val mem2 = MemoryStream[(Long, String)]
    mem2.addData(batch0)
    mem2.addData(batch1)
    StreamingDedup.runAvailableNow(spark,
      mem2.toDF().toDF("doc_id", "text"), indexDir, matchesDir,
      s"$root/ckpt_replay", threshold = 0.5)
    assert(indexRows() == before,
      "replayed folded batches must not re-append their signatures")

    // tombstone pruning: only FOLDED markers at or below the horizon go;
    // live deltas' markers are commits and must survive any horizon.
    // (ckpt_replay's replay batch committed as delta-00000000 again under
    // the same names — markers unchanged, so the folded set is stable.)
    mem.addData(Seq((301L, "fresh content that joins the corpus after the compactions")))
    run() // live delta-00000002 under the original checkpoint
    val live = new Path(indexDir, "delta-00000002.committed")
    assert(fs.exists(live))
    val pruned = StreamingDedup.pruneTombstones(spark, indexDir, upToBatchId = 0L)
    assert(pruned == Seq("delta-00000000.committed"), s"got $pruned")
    assert(!fs.exists(new Path(indexDir, "delta-00000000.committed")))
    assert(fs.exists(new Path(indexDir, "delta-00000001.committed")),
      "tombstone above the horizon must survive")
    assert(fs.exists(live), "live delta marker must never be pruned")
    // index contents unaffected; a later compaction still works
    assert(indexRows().length == before.length + 1)
    assert(StreamingDedup.compactIndex(spark, indexDir).contains("base-00000003"))
    assert(indexRows().length == before.length + 1)
  }

  test("distinct streams feeding one index: txnAppId prevents batch-id aliasing") {
    val root = Files.createTempDirectory("sdedup_appid").toString
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    StreamingDedup.bootstrapIndex(spark, corpus, s"$root/index")
    implicit val sqlCtx = spark.sqlContext
    def ingest(docs: Seq[(Long, String)], ckpt: String, appId: String) = {
      val mem = MemoryStream[(Long, String)]
      mem.addData(docs)
      StreamingDedup.runAvailableNow(spark, mem.toDF().toDF("doc_id", "text"),
        s"$root/index", s"$root/matches", s"$root/ckpt_$ckpt",
        threshold = 0.5, txnAppId = appId)
    }
    def members() = StreamingDedup.currentIndex(spark, s"$root/index")
      .select("doc_id").as[Long].collect().toSet
    ingest(Seq((100L, "stream A's novel document about marker keyed commits")), "a", "")
    assert(members().contains(100L))
    // stream B, OWN checkpoint, no appId: its batch 0 finds stream A's
    // delta-00000000 marker and is silently skipped — the documented hazard
    ingest(Seq((200L, "stream B's different novel document lost to aliasing")), "b", "")
    assert(!members().contains(200L), "aliasing hazard must reproduce without txnAppId")
    // with its own txnAppId the same ingest commits under its own key
    ingest(Seq((200L, "stream B's different novel document lost to aliasing")), "b2", "appB")
    assert(members().contains(200L))
    assert(fs.exists(new Path(s"$root/index", "delta-appB-00000000.committed")))
    // invalid app ids are rejected before any work
    val e = intercept[IllegalArgumentException](
      ingest(Seq((300L, "x")), "c", "bad-id!"))
    assert(e.getMessage.contains("txnAppId"))
  }

  test("running without a bootstrap index fails loudly") {
    val root = Files.createTempDirectory("sdedup4").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val e = intercept[IllegalStateException] {
      StreamingDedup.runAvailableNow(spark, mem.toDF().toDF("doc_id", "text"),
        s"$root/index", s"$root/matches", s"$root/ckpt")
    }
    assert(e.getMessage.contains("bootstrapIndex"))
  }

  test("compact sweeps a stale lower-generation base marker left by a crash") {
    import graft.streaming.MarkerLog
    import graft.sources.CommitProtocol
    val root = new Path(Files.createTempDirectory("mlog1").toString)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((1L, "a")).toDF("id", "x").write.parquet(new Path(root, "base").toString)
    MarkerLog.commitDir(Seq((2L, "b")).toDF("id", "x"),
      new Path(root, MarkerLog.keyedName("delta", "", 0L)), fs)
    assert(MarkerLog.compact(spark, root, "delta").contains("base-00000001"))
    // crash simulation: a prior compaction published its new generation but
    // died before deleting the old base marker — resurrect one by hand.
    // resolveBase still reads generation 1 (max wins), but the stale marker
    // would otherwise linger forever
    CommitProtocol.publishFile(fs, new Path(root, "base-00000000.committed"),
      "never-read\n".getBytes("UTF-8"))
    // even a nothing-to-fold compact performs the start-of-call sweep
    assert(MarkerLog.compact(spark, root, "delta").isEmpty)
    assert(!fs.exists(new Path(root, "base-00000000.committed")))
    assert(fs.exists(new Path(root, "base-00000001.committed")))
    assert(spark.read.parquet(
      MarkerLog.currentPaths(fs, root, "delta").map(_.toString): _*).count() == 2)
  }

  test("keyed-name grammar: prefixes with dashes or digits are rejected at build AND parse entry") {
    import graft.streaming.MarkerLog
    val e1 = intercept[IllegalArgumentException](
      MarkerLog.keyedName("my-delta", "", 0L))
    assert(e1.getMessage.contains("prefix"))
    val e2 = intercept[IllegalArgumentException](MarkerLog.markerRe("delta2"))
    assert(e2.getMessage.contains("prefix"))
  }
}
