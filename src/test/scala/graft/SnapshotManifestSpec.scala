package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.operators.Upsert
import graft.sources.SnapshotManifest

/** Snapshot-manifest commit protocol: atomicity (crash injection at every
  * pre-commit point), version conflicts, compaction, vacuum, and the
  * manifest-backed MERGE.
  */
class SnapshotManifestSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("snapmani").toString
  private def hfs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("commit then read round-trips; versions increment") {
    val root = newRoot()
    val v0 = SnapshotManifest.commit(spark, root, Seq((1L, "a"), (2L, "b")).toDF("id", "x"))
    assert(v0 == 0L)
    val v1 = SnapshotManifest.commit(spark, root, Seq((1L, "a2")).toDF("id", "x"))
    assert(v1 == 1L)
    assert(SnapshotManifest.currentVersion(spark, root).contains(1L))
    assert(SnapshotManifest.read(spark, root).as[(Long, String)].collect().toSeq ==
      Seq((1L, "a2")))
    // the superseded snapshot stays readable until vacuumed
    val old = spark.read.parquet(SnapshotManifest.snapshotFiles(spark, root, 0L): _*)
    assert(old.count() == 2)
  }

  test("crash before the commit rename leaves the previous snapshot current") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root, Seq((1L, "keep")).toDF("id", "x"))
    val fs = hfs(root)
    // simulate a writer killed AFTER data files and the tmp manifest are
    // written but BEFORE the commit rename: stage both by hand
    val staged = Seq((9L, "lost")).toDF("id", "x")
    staged.write.parquet(s"$root/data/v00000001")
    val tmp = new Path(root, ".manifest-1.tmp")
    val out = fs.create(tmp, true)
    out.write("version=1\ndata/v00000001/whatever.parquet\n".getBytes("UTF-8"))
    out.close()
    // readers are undisturbed: the garbage is invisible
    assert(SnapshotManifest.currentVersion(spark, root).contains(0L))
    assert(SnapshotManifest.read(spark, root).as[(Long, String)].collect().toSeq ==
      Seq((1L, "keep")))
    // and the next commit reclaims the version: stale attempt dir cleared,
    // new snapshot becomes current
    val v = SnapshotManifest.commit(spark, root, Seq((2L, "next")).toDF("id", "x"))
    assert(v == 1L)
    assert(SnapshotManifest.read(spark, root).as[(Long, String)].collect().toSeq ==
      Seq((2L, "next")))
  }

  test("losing the commit race fails loudly without touching the winner") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root, Seq((1L, "w0")).toDF("id", "x"))
    // a concurrent writer wins version 1 first
    SnapshotManifest.commit(spark, root, Seq((1L, "winner")).toDF("id", "x"))
    val fs = hfs(root)
    // replay the loser: its currentVersion read happened BEFORE the winner's
    // rename, so it stages data for version 1 and tries to commit it
    val loserData = new Path(root, "data/v_loser")
    Seq((1L, "loser")).toDF("id", "x").write.parquet(loserData.toString)
    val tmp = new Path(root, ".manifest-1.tmp")
    val out = fs.create(tmp, true)
    out.write("version=1\ndata/v_loser/part.parquet\n".getBytes("UTF-8"))
    out.close()
    val renamed = fs.rename(tmp, new Path(root, "manifest-00000001.json"))
    assert(!renamed) // rename-to-existing fails: the winner's manifest survives
    assert(SnapshotManifest.read(spark, root).as[(Long, String)].collect().toSeq ==
      Seq((1L, "winner")))
  }

  test("compactSnapshot shrinks files as a new snapshot, byte-identical data") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root,
      spark.range(1000).repartition(8).select($"id", ($"id" % 7).alias("g")))
    assert(SnapshotManifest.snapshotFiles(spark, root, 0L).size == 8)
    val v = SnapshotManifest.compactSnapshot(spark, root)
    assert(v.contains(1L))
    assert(SnapshotManifest.snapshotFiles(spark, root, 1L).size == 1)
    val out = SnapshotManifest.read(spark, root)
    assert(out.count() == 1000 &&
      out.agg(sum($"id")).head().getLong(0) == 999L * 1000 / 2)
    // already-compact table: no-op, no new version
    assert(SnapshotManifest.compactSnapshot(spark, root).isEmpty)
    assert(SnapshotManifest.currentVersion(spark, root).contains(1L))
  }

  test("vacuum drops superseded snapshots and crashed-vacuum orphans only") {
    val root = newRoot()
    (0 to 2).foreach(i => SnapshotManifest.commit(spark, root, Seq((i.toLong, "v")).toDF("id", "x")))
    val fs = hfs(root)
    assert(SnapshotManifest.vacuum(spark, root, keep = 2) == Seq(0L))
    assert(!fs.exists(new Path(root, "manifest-00000000.json")))
    assert(!fs.exists(new Path(root, "data/v00000000")))
    assert(fs.exists(new Path(root, "data/v00000001"))) // kept
    // crashed-vacuum orphan: data dir whose manifest is already gone
    Seq((9L, "orphan")).toDF("id", "x").write.parquet(s"$root/data/v00000001b")
    fs.rename(new Path(root, "data/v00000001b"), new Path(root, "data/v00000000"))
    assert(SnapshotManifest.vacuum(spark, root, keep = 2).isEmpty)
    assert(!fs.exists(new Path(root, "data/v00000000"))) // swept by the floor rule
    assert(SnapshotManifest.read(spark, root).as[(Long, String)].collect().toSeq ==
      Seq((2L, "v")))
  }

  test("mergeAndCommit: manifest-backed MERGE, previous snapshot intact") {
    val root = newRoot()
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    SnapshotManifest.commit(spark, root,
      Seq((1L, "old", ts, ts), (2L, "keep", ts, ts))
        .toDF("id", "payload", Upsert.InsertTs, Upsert.UpdateTs))
    val now = java.sql.Timestamp.from(java.time.Instant.now())
    val stagedDf = Seq((1L, "new", now, now), (3L, "ins", now, now))
      .toDF("id", "payload", Upsert.InsertTs, Upsert.UpdateTs)
    val (version, audited) = Upsert.mergeAndCommit(spark, root, stagedDf, Seq("id"))
    assert(version == 1L)
    assert(audited == 2L) // the updated row + the inserted row carry today's ts
    val out = SnapshotManifest.read(spark, root)
      .select($"id", $"payload").as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "new"), (2L, "keep"), (3L, "ins")))
    // matched row keeps the target INSERT_TIMESTAMP
    val insTs = SnapshotManifest.read(spark, root).filter($"id" === 1L)
      .select(col(Upsert.InsertTs)).head().getTimestamp(0)
    assert(insTs == ts)
    // time travel: version 0 still serves the pre-merge table
    assert(spark.read.parquet(SnapshotManifest.snapshotFiles(spark, root, 0L): _*)
      .count() == 2)
  }
}
