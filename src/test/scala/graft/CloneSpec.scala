package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.SnapshotManifest

/** Shallow clone: metadata-only bootstrap, divergence at churn cost,
  * write/vacuum isolation between clone and source, and the deep-copy
  * escape hatch.
  */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("clone").toString
  private def hfs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFilesUnder(root: String): Seq[String] = {
    val fs = hfs(root)
    val data = new Path(root, "data")
    if (!fs.exists(data)) Seq.empty
    else fs.listStatus(data).toSeq.filter(_.isDirectory).flatMap(d =>
      fs.listStatus(d.getPath).toSeq.filter(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString))
  }

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select(col("id"), col("x")).as[(Long, String)].collect().toSet

  test("clone is metadata-only and reads the source's content") {
    val src = newRoot(); val dst = newRoot()
    SnapshotManifest.commit(spark, src,
      (0L until 50L).map(i => (i, s"v$i")).toDF("id", "x"), Seq("id"))
    val v = SnapshotManifest.cloneTable(spark, src, dst)
    assert(v == 0L)
    assert(asSet(SnapshotManifest.read(spark, dst)) ==
      asSet(SnapshotManifest.read(spark, src)))
    assert(dataFilesUnder(dst).isEmpty) // zero data bytes copied
  }

  test("clone of an older version; destination must be empty") {
    val src = newRoot(); val dst = newRoot()
    SnapshotManifest.commit(spark, src, Seq((1L, "a")).toDF("id", "x"))
    SnapshotManifest.commit(spark, src, Seq((1L, "b")).toDF("id", "x"))
    SnapshotManifest.cloneTable(spark, src, dst, version = Some(0L))
    assert(asSet(SnapshotManifest.read(spark, dst)) == Set((1L, "a")))
    intercept[IllegalArgumentException] {
      SnapshotManifest.cloneTable(spark, src, dst)
    }
  }

  test("DML on the clone diverges at churn cost and never touches the source") {
    val src = newRoot(); val dst = newRoot()
    SnapshotManifest.commit(spark, src,
      (0L until 100L).map(i => (i, s"v$i")).toDF("id", "x")
        .repartitionByRange(4, col("id")), Seq("id"))
    val srcFilesBefore = dataFilesUnder(src).toSet
    SnapshotManifest.cloneTable(spark, src, dst)
    SnapshotManifest.deleteWhere(spark, dst, col("id") < 10L, Seq("id"))
    graft.operators.Upsert.mergeWhere(spark, dst,
      Seq((500L, "new")).toDF("id", "x"), Seq("id"), Seq("id"))
    // clone sees its own edits...
    val cloned = asSet(SnapshotManifest.read(spark, dst))
    assert(!cloned.exists(_._1 < 10L) && cloned.contains((500L, "new")))
    // ...the source sees none of them, and its files are untouched
    assert(asSet(SnapshotManifest.read(spark, src)).size == 100)
    assert(dataFilesUnder(src).toSet == srcFilesBefore)
    // divergence wrote only churn-sized files under the clone
    assert(dataFilesUnder(dst).nonEmpty)
  }

  test("MoR delete on the clone masks shared source bytes via a clone-local DV") {
    val src = newRoot(); val dst = newRoot()
    SnapshotManifest.commit(spark, src,
      (0L until 40L).map(i => (i, s"v$i")).toDF("id", "x"), Seq("id"))
    SnapshotManifest.cloneTable(spark, src, dst)
    SnapshotManifest.deleteWhereMoR(spark, dst, col("id") % 2L === 0L)
    assert(asSet(SnapshotManifest.read(spark, dst)).forall(_._1 % 2 == 1))
    assert(asSet(SnapshotManifest.read(spark, src)).size == 40)
    // the DV sidecar lives under the clone, the data stays under the source
    val fs = hfs(dst)
    assert(fs.exists(new Path(dst, "data")))
    assert(dataFilesUnder(src).nonEmpty)
  }

  test("vacuum on the clone reclaims only clone-local files") {
    val src = newRoot(); val dst = newRoot()
    SnapshotManifest.commit(spark, src,
      (0L until 50L).map(i => (i, s"v$i")).toDF("id", "x"), Seq("id"))
    val srcFiles = dataFilesUnder(src).toSet
    SnapshotManifest.cloneTable(spark, src, dst)
    SnapshotManifest.deleteWhere(spark, dst, col("id") < 25L, Seq("id"))
    SnapshotManifest.deleteWhere(spark, dst, col("id") < 30L, Seq("id"))
    SnapshotManifest.vacuum(spark, dst, keep = 1)
    // source bytes survive the clone's vacuum; the clone still reads
    assert(dataFilesUnder(src).toSet == srcFiles)
    assert(asSet(SnapshotManifest.read(spark, dst)).forall(_._1 >= 30L))
  }

  test("compactSnapshot severs the share: the clone becomes self-contained") {
    val src = newRoot(); val dst = newRoot()
    SnapshotManifest.commit(spark, src,
      (0L until 30L).map(i => (i, s"v$i")).toDF("id", "x"), Seq("id"))
    SnapshotManifest.cloneTable(spark, src, dst)
    SnapshotManifest.compactSnapshot(spark, dst)
    val v = SnapshotManifest.currentVersion(spark, dst).get
    val refs = SnapshotManifest.snapshotFiles(spark, dst, v)
    val srcAbs = hfs(src).makeQualified(new Path(src)).toString
    assert(refs.forall(!_.startsWith(srcAbs)))
    assert(asSet(SnapshotManifest.read(spark, dst)).size == 30)
  }

  test("chained clone: a clone of a clone still resolves the original bytes") {
    val a = newRoot(); val b = newRoot(); val c = newRoot()
    SnapshotManifest.commit(spark, a,
      (0L until 10L).map(i => (i, s"v$i")).toDF("id", "x"))
    SnapshotManifest.cloneTable(spark, a, b)
    SnapshotManifest.cloneTable(spark, b, c)
    assert(asSet(SnapshotManifest.read(spark, c)) ==
      asSet(SnapshotManifest.read(spark, a)))
    assert(dataFilesUnder(c).isEmpty)
  }
}
