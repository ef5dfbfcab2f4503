package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.{SnapshotFileIndex, SnapshotManifest}

/** [[SnapshotManifest.table]]: the snapshot as a Catalyst relation whose
  * file listing prunes on manifest stats with the query's OWN pushed
  * filters — declarative `.filter` replaces explicit `readWhere` calls,
  * and the parquet scan underneath keeps row-group pushdown + column
  * pruning. Fallback shapes (DVs, versionAsOf on a DV'd history) must
  * stay row-equal.
  */
class SnapshotFileIndexSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = java.nio.file.Files.createTempDirectory("fidx").toString

  private def bootstrap(root: String, n: Long = 1000L, parts: Int = 8): Unit = {
    SnapshotManifest.commit(spark, root,
      spark.range(0, n).toDF("id").withColumn("v", col("id") * 10L)
        .repartitionByRange(parts, col("id")), Seq("id"))
    ()
  }

  test("table() row-equals read(); a pushed filter prunes files at PLANNING time") {
    val root = newRoot()
    bootstrap(root)
    val t = SnapshotManifest.table(spark, root)
    assert(t.as[(Long, Long)].collect().toSet ==
      SnapshotManifest.read(spark, root).as[(Long, Long)].collect().toSet)
    val ctr = SnapshotFileIndex.countersFor(root) // per-root counters
    val p0 = ctr.prunes.get()
    val out = t.filter(col("id").between(100L, 120L)).as[(Long, Long)].collect().toSet
    assert(out == (100L to 120L).map(i => i -> i * 10L).toSet)
    assert(ctr.prunes.get() > p0,
      "the filtered scan must run manifest-stats pruning during planning")
    assert(ctr.lastKept < ctr.lastConsidered,
      s"a 21-key range over a range-clustered 8-file table must drop files " +
        s"(considered ${ctr.lastConsidered}, kept ${ctr.lastKept})")
    // the SCAN itself only touches survivors — not just the row filter
    val scanned = t.filter(col("id").between(100L, 120L))
      .select(input_file_name()).distinct().count()
    assert(scanned == ctr.lastKept,
      s"the scan read $scanned files but planning kept ${ctr.lastKept}")
  }

  test("parquet pushdown survives the relation: PushedFilters + pruned ReadSchema in the plan") {
    val root = newRoot()
    // three columns so column pruning has something real to drop
    SnapshotManifest.commit(spark, root,
      spark.range(0, 1000).toDF("id")
        .withColumn("v", col("id") * 10L)
        .withColumn("wide", concat(lit("payload-"), col("id")))
        .repartitionByRange(8, col("id")), Seq("id"))
    val plan = SnapshotManifest.table(spark, root)
      .filter(col("id") === 42L).select("v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(id,42)"),
      s"predicate must reach the parquet scan:\n$plan")
    // the scan's ReadSchema must carry only the filter + projection
    // columns — the unused wide column is pruned
    val readSchema = plan.replaceAll("(?s).*ReadSchema: ", "").split("\n").head
    assert(readSchema.contains("id") && readSchema.contains("v") &&
      !readSchema.contains("wide"),
      s"column pruning must drop the unused column; ReadSchema: $readSchema")
  }

  test("conservative planning: a filter on a stats-less column keeps every file") {
    val root = newRoot()
    // stats recorded for id only; v is stats-less
    val out = SnapshotManifest.table(spark, root match {
      case r => bootstrap(r); r
    }).filter(col("v") === 500L)
    assert(out.as[(Long, Long)].collect().toSet == Set(50L -> 500L))
    val ctr = SnapshotFileIndex.countersFor(root)
    assert(ctr.lastKept == ctr.lastConsidered,
      "stats-less columns must not prune")
  }

  test("partition-declared tables serve through the relation; partition predicates prune at planning") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root,
      spark.range(0, 400).toDF("id")
        .withColumn("p", col("id") % 4)
        .withColumn("v", col("id") * 2L),
      Seq("id", "p"), Nil, Seq("p"))
    val t = SnapshotManifest.table(spark, root)
    assert(t.as[(Long, Long, Long)].collect().toSet ==
      SnapshotManifest.read(spark, root).as[(Long, Long, Long)].collect().toSet)
    val out = t.filter(col("p") === 2L)
    val rows = out.as[(Long, Long, Long)].collect()
    assert(rows.length == 100 && rows.forall(_._2 == 2L))
    // the clustered layout records single-valued partition stats, so the
    // partition predicate prunes during planning and the scan touches
    // only surviving files
    val ctr = SnapshotFileIndex.countersFor(root)
    assert(ctr.lastKept < ctr.lastConsidered,
      s"partition predicate must prune (considered ${ctr.lastConsidered}, " +
        s"kept ${ctr.lastKept})")
    val scanned = out.select(input_file_name()).distinct().count()
    assert(scanned == ctr.lastKept)
  }

  test("fallback shapes stay row-equal: DV'd table and versionAsOf") {
    val root = newRoot()
    bootstrap(root, n = 200L, parts = 4)
    SnapshotManifest.deleteWhereMoR(spark, root, col("id").between(10L, 19L))
    // live DV sidecar → table() must fall back to the anti-joined read
    val viaTable = SnapshotManifest.table(spark, root)
      .as[(Long, Long)].collect().toSet
    val viaRead = SnapshotManifest.read(spark, root)
      .as[(Long, Long)].collect().toSet
    assert(viaTable == viaRead && !viaTable.exists(kv => kv._1 >= 10 && kv._1 <= 19))
    // time travel: v0 still serves the pre-delete content (relation path —
    // v0 has no DVs)
    val v0 = SnapshotManifest.table(spark, root, versionAsOf = Some(0L))
      .as[(Long, Long)].collect().toSet
    assert(v0 == (0L until 200L).map(i => i -> i * 10L).toSet)
  }

  test("spark.read.format(\"graft-snapshot\") serves the same relation; versionAsOf option; DV-live versions fall back to the MoR read") {
    val root = newRoot()
    bootstrap(root, n = 300L, parts = 4)
    val viaFormat = spark.read.format("graft-snapshot").load(root)
    assert(viaFormat.as[(Long, Long)].collect().toSet ==
      (0L until 300L).map(i => i -> i * 10L).toSet)
    // pushed filters prune through the named reader too
    viaFormat.filter(col("id") < 75L).collect()
    locally { val ctr = SnapshotFileIndex.countersFor(root)
      assert(ctr.lastKept < ctr.lastConsidered) }
    SnapshotManifest.deleteWhere(spark, root, col("id") >= 150L, Seq("id"))
    assert(spark.read.format("graft-snapshot").option("versionAsOf", "0")
      .load(root).count() == 300L)
    assert(spark.read.format("graft-snapshot").load(root).count() == 150L)
    SnapshotManifest.deleteWhereMoR(spark, root, col("id") < 10L)
    // a DV-live version SERVES (round-13: MoR fallback), same rows as read()
    assert(spark.read.format("graft-snapshot").load(root)
      .as[(Long, Long)].collect().toSet ==
      SnapshotManifest.read(spark, root).as[(Long, Long)].collect().toSet)
  }

  test("df.write.format(\"graft-snapshot\"): SaveMode maps onto the commit verbs") {
    val root = newRoot() + "/t"
    def frame(lo: Long, hi: Long) =
      spark.range(lo, hi).toDF("id").withColumn("v", col("id") * 10L)
    // bootstrap (mode irrelevant on a first write)
    frame(0, 100).write.format("graft-snapshot")
      .option("statsCols", "id").save(root)
    assert(spark.read.format("graft-snapshot").load(root).count() == 100L)
    // Append publishes a NEW version with the extra rows
    frame(100, 150).write.format("graft-snapshot").mode(SaveMode.Append)
      .option("statsCols", "id").save(root)
    assert(spark.read.format("graft-snapshot").load(root).count() == 150L)
    assert(SnapshotManifest.currentVersion(spark, root).contains(1L))
    // Overwrite is a full-overwrite commit
    frame(0, 30).write.format("graft-snapshot").mode(SaveMode.Overwrite)
      .option("statsCols", "id").save(root)
    assert(spark.read.format("graft-snapshot").load(root)
      .as[(Long, Long)].collect().toSet ==
      (0L until 30L).map(i => i -> i * 10L).toSet)
    // Ignore no-ops on an existing table; ErrorIfExists refuses
    frame(0, 5).write.format("graft-snapshot").mode(SaveMode.Ignore).save(root)
    assert(spark.read.format("graft-snapshot").load(root).count() == 30L)
    intercept[IllegalStateException] {
      frame(0, 5).write.format("graft-snapshot")
        .mode(SaveMode.ErrorIfExists).save(root)
    }
    // stats recorded through the writer prune through the reader
    spark.read.format("graft-snapshot").load(root)
      .filter(col("id") < 5L).collect()
    locally { val ctr = SnapshotFileIndex.countersFor(root)
      assert(ctr.lastKept < ctr.lastConsidered,
        "writer-recorded stats must prune through the reader") }
  }

  test("empty-result prune still returns the full schema and zero rows") {
    val root = newRoot()
    bootstrap(root)
    val out = SnapshotManifest.table(spark, root).filter(col("id") === -5L)
    assert(out.columns.toSeq == Seq("id", "v") && out.count() == 0L)
  }
}
