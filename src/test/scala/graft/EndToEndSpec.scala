package graft

import org.apache.spark.sql.functions._
import graft.nested.Normalize
import graft.operators.{AlertGate, SlackSink, Upsert}
import graft.sources.KeysetSource

/** SURVEY §5.2 item 4 — the full reference pipeline in one flow:
  * keyset source → recursive normalize → MERGE upsert → latest-per-key +
  * alert gate → slack sink → history append → audit count.
  */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("training-data flow: stream-dedup → manifest-table merge → compact → vacuum") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.SnapshotManifest
    import graft.streaming.StreamingDedup
    val root = java.nio.file.Files.createTempDirectory("e2e_corpus").toString

    // 0. bootstrap: a curated corpus lives in a snapshot-manifest table and
    //    its signature index is materialized once
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different content about spark engines and scale")
    ).toDF("doc_id", "text")
    val t0 = lit("2024-01-01 00:00:00").cast("timestamp")
    SnapshotManifest.commit(spark, s"$root/table",
      corpus.withColumn(Upsert.InsertTs, t0).withColumn(Upsert.UpdateTs, t0))
    StreamingDedup.bootstrapIndex(spark, corpus, s"$root/index")

    // 1. a crawl stream arrives: one duplicate of the corpus, two novel
    //    docs (one of them duplicated inside the batch)
    implicit val sqlCtx = spark.sqlContext
    val crawl = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "fresh material never seen before about distributed snapshot protocols"),
      (12L, "fresh material never seen before about distributed snapshot protocols"))
    val mem = MemoryStream[(Long, String)]
    mem.addData(crawl)
    val matches = StreamingDedup.runAvailableNow(spark,
      mem.toDF().toDF("doc_id", "text"), s"$root/index", s"$root/matches",
      s"$root/ckpt", threshold = 0.5)
    val dupIds = matches.select("new_id").as[Long].collect().toSet
    assert(dupIds == Set(10L, 12L)) // 11 survives as the novel representative

    // 2. the surviving docs MERGE into the corpus table via the atomic
    //    manifest commit (no delete-then-rename window)
    val survivors = crawl.toDF("doc_id", "text")
      .join(matches.select(col("new_id").alias("doc_id")), Seq("doc_id"), "left_anti")
    val (v1, _) = Upsert.mergeAndCommit(spark, s"$root/table",
      survivors
        .withColumn(Upsert.InsertTs, current_timestamp())
        .withColumn(Upsert.UpdateTs, current_timestamp())
        .select(col("doc_id"), col("text"), col(Upsert.InsertTs), col(Upsert.UpdateTs)),
      Seq("doc_id"))
    assert(v1 == 1L)
    assert(SnapshotManifest.read(spark, s"$root/table")
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 11L))

    // 3. a SECOND crawl arrives through the DSv2 keyset source (the
    //    REST-cursor stand-in, sort-key-watermark offsets): one dup of a
    //    doc admitted in step 1, one novel
    val pages = java.nio.file.Files.createTempDirectory("e2e_pages")
    java.nio.file.Files.writeString(pages.resolve("page_00.json"),
      """{"doc_id":20,"lastModifiedAt":"2024-02-01T00:00:00","text":"fresh material never seen before about distributed snapshot protocols"}
        |{"doc_id":21,"lastModifiedAt":"2024-02-01T00:00:01","text":"a final novel document closing out the second crawl"}
        |""".stripMargin)
    val stream2 = spark.readStream.format("graft-keyset")
      .option("path", pages.toString).option("sortField", "lastModifiedAt").load()
      .select(col("doc_id"), col("text"))
    // a DISTINCT stream (own checkpoint, batch ids restart at 0) needs its
    // own txnAppId, or its batch 0 would alias crawl 1's batch-0 marker
    val matches2 = StreamingDedup.runAvailableNow(spark, stream2,
      s"$root/index", s"$root/matches2", s"$root/ckpt2", threshold = 0.5,
      txnAppId = "crawl2")
    assert(matches2.select("new_id", "corpus_id").as[(Long, Long)].collect().toSet ==
      Set((20L, 11L))) // 20 duplicates step-1's admitted member; 21 is novel

    // 4. index maintenance: fold the delta log into one base generation,
    //    prune tombstones behind the committed horizon — dedup results
    //    unchanged for the NEXT crawl
    assert(StreamingDedup.compactIndex(spark, s"$root/index").contains("base-00000001"))
    StreamingDedup.pruneTombstones(spark, s"$root/index", upToBatchId = 0L)
    assert(StreamingDedup.currentIndex(spark, s"$root/index")
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 11L, 21L))

    // 5. a downstream aggregate table tracks the corpus incrementally: the
    //    refresh after each merge commit reads only the churn
    import graft.operators.IncrementalRollup
    val aggs = Seq(count(lit(1)).alias("n_docs"),
      max(length(col("text"))).alias("max_len"))
    IncrementalRollup.refreshBy(spark, s"$root/table", s"$root/rollup",
      Seq("doc_id"), Seq("corpus" -> lit("all")), aggs) // global group via a derived key
    def rollupRows = IncrementalRollup.read(spark, s"$root/rollup")
      .select("n_docs").as[Long].collect().toSeq
    assert(rollupRows == Seq(3L))

    // 6. rollup resilience across maintenance:
    //    (a) a rewrite-only commit (same rows, new files) refreshes as a
    //        no-churn incremental pass — the file-level diff finds nothing
    SnapshotManifest.commit(spark, s"$root/table",
      SnapshotManifest.read(spark, s"$root/table"))
    IncrementalRollup.refreshBy(spark, s"$root/table", s"$root/rollup",
      Seq("doc_id"), Seq("corpus" -> lit("all")), aggs)
    assert(rollupRows == Seq(3L))
    //    (b) vacuum that erases the rollup's reflected from-version forces
    //        the next refresh into the full-rebuild fallback (before the
    //        guard this threw FileNotFoundException from changesBetween)
    SnapshotManifest.commit(spark, s"$root/table",
      SnapshotManifest.read(spark, s"$root/table"))
    SnapshotManifest.vacuum(spark, s"$root/table", keep = 1)
    IncrementalRollup.refreshBy(spark, s"$root/table", s"$root/rollup",
      Seq("doc_id"), Seq("corpus" -> lit("all")), aggs)
    assert(rollupRows == Seq(3L))
    val fin = SnapshotManifest.read(spark, s"$root/table")
    assert(fin.count() == 3)
    assert(fin.columns.contains("text"))
  }

  test("embedding flow: keyset-fed stream → ANN ingest → serve → compact") {
    import graft.streaming.StreamingAnnIngest
    val root = java.nio.file.Files.createTempDirectory("e2e_ann").toString
    val corpus = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)),
      (3L, Array(0.9, 0.1)), (4L, Array(0.1, 0.9))
    ).toDF("vec_id", "embedding")
    StreamingAnnIngest.bootstrapIndex(spark, corpus, s"$root/index",
      cells = 2, refineIters = 1)

    // new embeddings arrive through the DSv2 keyset source (the REST-cursor
    // stand-in) — the same source contract the document crawl uses
    val pages = java.nio.file.Files.createTempDirectory("e2e_ann_pages")
    java.nio.file.Files.writeString(pages.resolve("page_00.json"),
      """{"vec_id":10,"lastModifiedAt":"2024-03-01T00:00:00","embedding":[0.95,0.05]}
        |{"vec_id":11,"lastModifiedAt":"2024-03-01T00:00:01","embedding":[0.05,0.95]}
        |""".stripMargin)
    val stream = spark.readStream.format("graft-keyset")
      .option("path", pages.toString).option("sortField", "lastModifiedAt").load()
      .select(col("vec_id"), col("embedding"))
    StreamingAnnIngest.runAvailableNow(spark, stream, s"$root/index", s"$root/ckpt")
    assert(StreamingAnnIngest.currentIndex(spark, s"$root/index").count() == 6)

    // the freshly streamed vector is immediately servable
    val queries = Seq((100L, Array(1.0, 0.0))).toDF("query_id", "embedding")
    def top2 = StreamingAnnIngest.serveTopK(spark, s"$root/index", queries,
      k = 2, nprobe = 1)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toSet
    assert(top2 == Set((1, 1L), (2, 10L)))

    // maintenance folds the delta log; serving is unchanged
    assert(StreamingAnnIngest.compactIndex(spark, s"$root/index")
      .contains("base-00000001"))
    assert(top2 == Set((1, 1L), (2, 10L)))
  }

  test("keyset → normalize → merge → alert gate → sink → audit") {
    val pagesDir = "/root/repo/src/test/resources/json/pages"

    // 1. incremental extract from the keyset source (full load: no watermark)
    val raw = KeysetSource.load(spark, KeysetSource.fixtureFetcher(pagesDir), maxPages = 50)
    assert(raw.count() == 7)

    // 2. normalize to DWH shape (scalar-only; lineItems exploded)
    val flat = Normalize.normalize(raw)
    assert(Normalize.isFlat(flat))
    assert(flat.count() == 10) // 7 orders → 10 rows after explode_outer

    // 3. stage + merge into a target keyed by (id, lineItems__sku)
    // PK columns must be non-null for MERGE (null never matches `=` — the
    // Exasol/reference semantics UpsertSpec pins); a real load coalesces
    val staged = flat.select(
      col("id"), coalesce(col("lineItems__sku"), lit("__none")).alias("sku"),
      col("totalPrice__amount").alias("amount"),
      lit("2024-02-01 00:00:00").cast("timestamp").alias(Upsert.InsertTs),
      lit("2024-02-01 00:00:00").cast("timestamp").alias(Upsert.UpdateTs))
    val target = staged
      .filter(col("id") < "o04") // pretend only the first pages were loaded before
      .withColumn("amount", col("amount") - 1) // stale values
      .withColumn(Upsert.InsertTs, lit("2024-01-15 00:00:00").cast("timestamp"))
      .withColumn(Upsert.UpdateTs, lit("2024-01-15 00:00:00").cast("timestamp"))
    val merged = Upsert.merge(target, staged, Seq("id", "sku"))
    assert(merged.count() == 10)
    // matched rows refreshed from staged but keep the original INSERT_TIMESTAMP
    val o01 = merged.filter(col("id") === "o01" && col("sku") === "sku-a").head()
    assert(o01.getAs[Number]("amount").doubleValue() == 100.0)
    assert(o01.getAs[java.sql.Timestamp](Upsert.InsertTs).toString.startsWith("2024-01-15"))
    assert(o01.getAs[java.sql.Timestamp](Upsert.UpdateTs).toString.startsWith("2024-02-01"))

    // 4. alert gate: orders whose amount exceeds the last alerted value by ≥100
    val candidates = merged.select(
      lit("amount_watch").alias(AlertGate.Identifier),
      col("id").alias(AlertGate.DedupKey),
      col("amount").cast("double").alias(AlertGate.DedupValue))
    val history = Seq(("amount_watch", "o05", 900.0, "2024-02-01 08:00:00"))
      .toDF(AlertGate.Identifier, AlertGate.DedupKey, AlertGate.DedupValue, AlertGate.LastAlert)
      .withColumn(AlertGate.LastAlert, col(AlertGate.LastAlert).cast("timestamp"))
    val toSend = AlertGate.shouldSend(candidates, history,
      resendThreshold = 100.0, asOfDate = lit("2024-02-01").cast("date"))
    // o05 (980 vs 900 alerted: |80| < 100) suppressed; every other key sends
    assert(!toSend.select(AlertGate.DedupKey).as[String].collect().contains("o05"))

    // 5. sink + history append
    SlackSink.memorySink.clear()
    val withMsg = toSend.withColumn("message",
      concat(lit("amount alert for "), col(AlertGate.DedupKey)))
    val sent = SlackSink.send(withMsg, "memory://e2e")
    assert(sent == withMsg.count())
    val recorded = AlertGate.recordSent(withMsg,
      sentAt = lit("2024-02-01 09:00:00").cast("timestamp"))
    assert(recorded.count() == sent)

    // 6. audit (utils.py:293-295 shape, pinned date): rows updated on merge day
    val audit = merged
      .filter(to_date(col(Upsert.UpdateTs)) === lit("2024-02-01").cast("date")).count()
    assert(audit == 10)
  }

  test("U1 property: unionByName(allowMissing) is associative over drifting column sets") {
    val a = Seq((1L, "x")).toDF("id", "only_a")
    val b = Seq((2L, 3.5)).toDF("id", "only_b")
    val c = Seq((3L, true)).toDF("id", "only_c")
    def u(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      x.unionByName(y, allowMissingColumns = true)
    val left = u(u(a, b), c)
    val right = u(a, u(b, c))
    assert(left.columns.sorted.toSeq == right.columns.sorted.toSeq)
    val l = left.select(left.columns.sorted.map(col): _*)
    val r = right.select(right.columns.sorted.map(col): _*)
    assert(l.exceptAll(r).isEmpty && r.exceptAll(l).isEmpty)
  }
}
