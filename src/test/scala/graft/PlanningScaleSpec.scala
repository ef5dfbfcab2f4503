package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

import graft.sources.{ManifestStats, SnapshotFileIndex, SnapshotManifest}

/** Planning-cost guard for the Catalyst relation at the 10⁴-file scale
  * (round-13 VERDICT ask #4 — the q155 path's scale bar): on a synthetic
  * 10,000-file version, building the file index and running a filtered
  * `listFiles` must
  *
  *   - resolve every status with ONE `listStatus` per data directory
  *     (never a per-file round-trip — counted through the `faulty://`
  *     scheme),
  *   - prune through the manifest stats exactly (a narrow range keeps a
  *     handful of the 10⁴ files),
  *   - and complete in interactive planning time (wall-clock recorded).
  *
  * The version is FABRICATED (placeholder data files + a hand-written
  * manifest): planning never opens a data file — that is the point under
  * test — so empty placeholders suffice, and fabrication keeps the spec
  * seconds-fast where a real 10⁴-file commit would dominate the suite.
  */
class PlanningScaleSpec extends SparkSpec {

  private val NFiles = 10000

  test("10k-file index: one listStatus per data dir, exact stats pruning, interactive planning time") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.faulty.impl", classOf[FaultyFileSystem].getName)
    val local = java.nio.file.Files.createTempDirectory("plan10k")
    val root = s"faulty://$local/t"
    val dataDir = local.resolve("t/data/v00000000")
    java.nio.file.Files.createDirectories(dataDir)

    val schema = new StructType().add("id", LongType)
    // 10k placeholder files, each with exact disjoint stats [i*10, i*10+9]
    val lines = new StringBuilder()
    lines.append("version=0\n")
    lines.append(s"schema=${schema.json}\n")
    (0 until NFiles).foreach { i =>
      val name = f"f$i%05d.parquet"
      java.nio.file.Files.createFile(dataDir.resolve(name))
      val statsJson = ManifestStats.toJson(ManifestStats.FileStats(10L,
        Map("id" -> ManifestStats.ColStats(
          Some(BigDecimal(i * 10L)), Some(BigDecimal(i * 10L + 9L)), 0L))))
      lines.append(s"data/v00000000/$name\t$statsJson\n")
    }
    java.nio.file.Files.write(local.resolve("t/manifest-00000000.json"),
      lines.toString.getBytes("UTF-8"))

    // the engine's own parser accepts the fabricated version
    val (body, meta) = SnapshotManifest.manifestParts(spark, root, 0L)
    assert(body.size == NFiles && meta.schema.contains(schema))
    val entries = body.map(SnapshotManifest.parseLine)
    val idx = new SnapshotFileIndex(spark, root, 0L, entries,
      SnapshotManifest.bodyStats(body), schema)

    // a ~50-file window out of 10k
    val pred = ManifestStats.resolvePredicate(spark, schema,
      col("id").between(50000L, 50499L))
    FaultyFileSystem.listStatusCount.set(0L)
    val t0 = System.nanoTime()
    val parts = idx.listFiles(Nil, Seq(pred))
    val ms = (System.nanoTime() - t0) / 1000000L
    val kept = parts.map(_.files.size).sum
    info(s"planning over $NFiles files: ${ms}ms, kept $kept, " +
      s"listStatus calls ${FaultyFileSystem.listStatusCount.get()}")

    assert(kept == 50, s"exact disjoint stats must keep exactly the 50 " +
      s"window files (kept $kept)")
    assert(FaultyFileSystem.listStatusCount.get() == 1L,
      "status resolution must be ONE listStatus for the single data dir, " +
        s"not per-file round-trips (got ${FaultyFileSystem.listStatusCount.get()})")
    assert(ms < 30000L, s"10k-file planning took ${ms}ms")

    // per-root counters recorded the prune
    val ctr = SnapshotFileIndex.countersFor(root)
    assert(ctr.lastConsidered == NFiles.toLong && ctr.lastKept == 50L)

    // an unfiltered listing serves all files from the SAME one listing
    // (statuses cache across listFiles calls on the immutable version)
    val all = idx.listFiles(Nil, Nil).map(_.files.size).sum
    assert(all == NFiles &&
      FaultyFileSystem.listStatusCount.get() == 1L,
      "the immutable version's statuses must be resolved once, not per call")
  }
}
