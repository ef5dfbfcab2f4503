package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.PartitionedSink

/** Dynamic partition overwrite: only touched partitions are replaced;
  * partition pruning reaches the scan.
  */
class PartitionedSinkSpec extends SparkSpec {
  import spark.implicits._

  test("dynamic overwrite replaces only the partitions present in the batch") {
    val path = Files.createTempDirectory("psink").toString
    val day1 = Seq((1L, "2024-01-01", "a"), (2L, "2024-01-02", "b"))
      .toDF("id", "dt", "payload")
    PartitionedSink.overwritePartitions(day1, path, Seq("dt"))

    // second batch rewrites only 2024-01-02 (new payload + extra row)
    val day2 = Seq((2L, "2024-01-02", "b2"), (3L, "2024-01-02", "c"))
      .toDF("id", "dt", "payload")
    PartitionedSink.overwritePartitions(day2, path, Seq("dt"))

    val out = PartitionedSink.read(spark, path)
      .select($"id", $"dt", $"payload").as[(Long, String, String)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "2024-01-01", "a"),      // untouched partition survives
      (2L, "2024-01-02", "b2"),     // replaced
      (3L, "2024-01-02", "c")))     // added
  }

  test("static overwrite mode is restored after the write") {
    val before = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    val path = Files.createTempDirectory("psink2").toString
    PartitionedSink.overwritePartitions(
      Seq((1L, "2024-01-01")).toDF("id", "dt"), path, Seq("dt"))
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode") == before)
  }

  test("partition filters prune the scan") {
    val path = Files.createTempDirectory("psink3").toString
    val df = PartitionedSink.withDt(Tables.load(spark, sfDir, "events"), "ts")
    PartitionedSink.overwritePartitions(df, path, Seq("dt"))
    val pruned = PartitionedSink.read(spark, path).filter($"dt" === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-05"))
    assert(pruned.count() > 0)
  }

  test("compact merges small files per partition, preserves rows, and is idempotent") {
    val path = Files.createTempDirectory("psink4").toString
    // 8 shards per partition of tiny data = the post-micro-batch layout
    val df = PartitionedSink.withDt(Tables.load(spark, sfDir, "events"), "ts")
      .repartition(8)
    df.write.mode("overwrite").partitionBy("dt").parquet(path)
    val before = PartitionedSink.read(spark, path)
    val beforeRows = before.select($"event_id", $"value", $"dt")
      .as[(Long, Double, String)].collect().toSet
    def fileCount: Int = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(path)).iterator().asScala
        .count(p => p.toString.endsWith(".parquet") && p.toFile.isFile)
    }
    val nBefore = fileCount
    val done = graft.sources.PartitionedSink.compact(spark, path, targetBytes = 1L << 30)
    assert(done.nonEmpty && done.forall { case (_, b, a) => b > a && a == 1 })
    val nAfter = fileCount
    assert(nAfter < nBefore)
    val afterRows = PartitionedSink.read(spark, path)
      .select($"event_id", $"value", $"dt")
      .as[(Long, Double, String)].collect().toSet
    assert(afterRows == beforeRows)
    // second run: nothing left to do
    assert(graft.sources.PartitionedSink.compact(spark, path, 1L << 30).isEmpty)
    assert(fileCount == nAfter)
  }
}
