package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import graft.sources.SnapshotManifest

/** Parquet-native bloom filters as a table property: written for the
  * declared columns, discriminating at the row-group level, preserved by
  * every rewrite verb, and neutral to query results.
  */
class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("bloom").toString

  private def dataFiles(root: String, v: Long): Seq[String] =
    SnapshotManifest.snapshotFiles(spark, root, v)

  /** Per-row-group bloom offsets of `colName` in `file` (-1 = no bloom). */
  private def bloomOffsets(file: String, colName: String): Seq[Long] = {
    val in = HadoopInputFile.fromPath(new Path(file),
      spark.sparkContext.hadoopConfiguration)
    val reader = ParquetFileReader.open(in)
    try reader.getFooter.getBlocks.asScala.toSeq.map { b =>
      b.getColumns.asScala
        .find(_.getPath.toDotString == colName)
        .map(_.getBloomFilterOffset).getOrElse(-1L)
    } finally reader.close()
  }

  /** Probe `file`'s first-row-group bloom for `colName` with long values:
    * (hits among present, hits among absent).
    */
  private def probe(file: String, colName: String,
      present: Seq[Long], absent: Seq[Long]): (Int, Int) = {
    val in = HadoopInputFile.fromPath(new Path(file),
      spark.sparkContext.hadoopConfiguration)
    val reader = ParquetFileReader.open(in)
    try {
      val block = reader.getFooter.getBlocks.asScala.head
      val colMeta = block.getColumns.asScala
        .find(_.getPath.toDotString == colName).get
      val bf = reader.getBloomFilterDataReader(block).readBloomFilter(colMeta)
      assert(bf != null, s"no bloom filter for $colName in $file")
      (present.count(v => bf.findHash(bf.hash(v))),
        absent.count(v => bf.findHash(bf.hash(v))))
    } finally reader.close()
  }

  /** ids are SHUFFLED before write so each file's min/max range spans
    * nearly the whole key space — exactly the layout where min/max stats
    * cannot prune a point lookup and only the bloom discriminates.
    */
  private def commitShuffled(root: String, n: Long): Long = {
    val df = spark.range(n).select(col("id"), (col("id") % 100).alias("bucket"))
      .withColumn("__r", hash(col("id"))).orderBy(col("__r")).drop("__r")
      .repartition(4)
    SnapshotManifest.commit(spark, root, df, Seq("id"), Seq("id"))
  }

  test("blooms are written for declared columns only, and recorded as table meta") {
    val root = newRoot()
    val v = commitShuffled(root, 20000L)
    assert(SnapshotManifest.bloomCols(spark, root, v) == Seq("id"))
    val files = dataFiles(root, v)
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(bloomOffsets(f, "id").forall(_ >= 0L), s"missing id bloom in $f")
      assert(bloomOffsets(f, "bucket").forall(_ == -1L),
        s"unexpected bucket bloom in $f")
    }
  }

  test("the bloom discriminates: present ids always hit, absent ids mostly miss") {
    val root = newRoot()
    val v = commitShuffled(root, 20000L)
    val f = dataFiles(root, v).head
    // the file's actual ids (first 50 of them) vs ids far outside the domain
    val present = spark.read.parquet(f).select("id").as[Long].take(50).toSeq
    val absent = (1L to 50L).map(_ * 1000L + 10000019L)
    val (hitPresent, hitAbsent) = probe(f, "id", present, absent)
    assert(hitPresent == present.size) // no false negatives, ever
    assert(hitAbsent <= 5, s"bloom fpp too high: $hitAbsent/50 absent hits")
  }

  test("the property survives CoW DML, MoR append, compaction, and OPTIMIZE") {
    val root = newRoot()
    commitShuffled(root, 20000L)
    // CoW delete rewrites affected files — they must carry blooms again
    val v1 = SnapshotManifest.deleteWhere(spark, root, col("id") < 1000L, Seq("id"))
    assert(SnapshotManifest.bloomCols(spark, root, v1) == Seq("id"))
    // MoR update appends post-image files — blooms there too
    val v2 = SnapshotManifest.updateWhereMoR(spark, root, col("id") === 5000L,
      Map("bucket" -> lit(-1L)), Seq("id"))
    assert(SnapshotManifest.bloomCols(spark, root, v2) == Seq("id"))
    // compaction preserves the property and its files carry blooms
    val v3 = SnapshotManifest.compactSnapshot(spark, root,
      targetBytes = 1L << 30).getOrElse(v2)
    assert(SnapshotManifest.bloomCols(spark, root, v3) == Seq("id"))
    dataFiles(root, v3).foreach { f =>
      assert(bloomOffsets(f, "id").forall(_ >= 0L),
        s"bloom lost after maintenance in $f")
    }
    // correctness is unaffected: point lookup equals the full-scan filter
    val hit = SnapshotManifest.readWhere(spark, root, col("id") === 5000L)
      .select("id", "bucket").as[(Long, Long)].collect().toSet
    assert(hit == Set((5000L, -1L)))
  }

  test("setBloomCols declares the property on an existing table without a rewrite") {
    val root = newRoot()
    val df = spark.range(5000L).select(col("id"), (col("id") % 7).alias("g"))
    val v0 = SnapshotManifest.commit(spark, root, df, Seq("id"))
    assert(SnapshotManifest.bloomCols(spark, root, v0).isEmpty)
    dataFiles(root, v0).foreach(f =>
      assert(bloomOffsets(f, "id").forall(_ == -1L)))
    val v1 = SnapshotManifest.setBloomCols(spark, root, Seq("id"))
    assert(SnapshotManifest.bloomCols(spark, root, v1) == Seq("id"))
    // existing files untouched (metadata-only)...
    assert(dataFiles(root, v1) == dataFiles(root, v0))
    // ...and the NEXT rewrite carries blooms
    val v2 = SnapshotManifest.deleteWhere(spark, root, col("id") < 100L, Seq("id"))
    val rewritten = dataFiles(root, v2).toSet -- dataFiles(root, v1).toSet
    assert(rewritten.nonEmpty)
    rewritten.foreach(f => assert(bloomOffsets(f, "id").forall(_ >= 0L)))
    // idempotent no-op publish
    assert(SnapshotManifest.setBloomCols(spark, root, Seq("id")) == v2)
  }
}
