package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{ManifestStats, SnapshotManifest}

/** File-range data skipping over snapshot-manifest tables: the prune
  * decision's SOUNDNESS (readWhere ≡ read.filter for every predicate shape,
  * prunable or not), its EFFECT (narrow ranges provably drop files), and
  * the codec/ordering primitives it stands on.
  */
class ManifestStatsSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("manistats").toString

  /** 1000 rows, range-clustered by k so per-file ranges are near-disjoint
    * — the layout stats pruning exists for.
    */
  private lazy val statsRoot: String = {
    val root = newRoot()
    val df = spark.range(1000).select(
      col("id").alias("k"),
      (col("id") % 7).cast("int").alias("m"),
      concat(lit("w"), format_string("%04d", col("id"))).alias("s"),
      when(col("id") % 5 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("v"), col("id"))).alias("maybe"),
      lit(null).cast("long").alias("allnull"),
      timestamp_micros(col("id") * 1000000L).alias("ts"))
      .repartitionByRange(8, col("k"))
    SnapshotManifest.commit(spark, root, df,
      Seq("k", "m", "s", "maybe", "allnull", "ts"))
    root
  }

  private def checkSound(pred: org.apache.spark.sql.Column): Unit = {
    val expected = SnapshotManifest.read(spark, statsRoot).filter(pred)
      .orderBy(col("k")).collect().toSeq
    val got = SnapshotManifest.readWhere(spark, statsRoot, pred)
      .orderBy(col("k")).collect().toSeq
    assert(got == expected, s"readWhere diverged from read+filter for $pred")
  }

  test("narrow range prunes most files AND returns exactly read+filter") {
    val pred = col("k") >= 100 && col("k") < 150
    val all = SnapshotManifest.snapshotFiles(spark, statsRoot, 0L)
    val kept = SnapshotManifest.prunedFiles(spark, statsRoot, 0L, pred)
    assert(all.size >= 8, s"fixture should have >=8 files, got ${all.size}")
    assert(kept.size <= 2, s"50-wide range over 8 range-files should keep <=2, kept ${kept.size}")
    checkSound(pred)
  }

  test("point lookup keeps one file") {
    val kept = SnapshotManifest.prunedFiles(spark, statsRoot, 0L, col("k") === 777)
    assert(kept.size == 1, s"point lookup kept ${kept.size} files")
    checkSound(col("k") === 777)
  }

  test("soundness sweep: every predicate shape returns exactly read+filter") {
    val preds = Seq(
      col("k") === 0, col("k") === 999, col("k") === -5, col("k") === 5000,
      col("k") < 10, col("k") <= 10, col("k") > 990, col("k") >= 990,
      lit(100) <= col("k") && lit(200) > col("k"), // flipped operand order
      col("k").isin(3, 400, 995), col("k").isin(-1, 10000),
      col("m") === 3, // every file holds every m value — prunes nothing
      col("s") >= "w0990", col("s") < "w0010", col("s").startsWith("w01"),
      col("maybe").isNull, col("maybe").isNotNull,
      col("allnull").isNull, col("allnull").isNotNull, col("allnull") === 5L,
      col("ts") >= lit(java.time.Instant.ofEpochSecond(900L)),
      col("k") === 50 || col("k") === 950, // OR keeps both sides' files
      col("k") > 100 && col("m") < 3,
      (col("k") + 1) > 500, // non-prunable arithmetic shape — conservative
      abs(col("k")) === 7, // unrecognized function — conservative
      col("k") === lit(250L) + lit(250L)) // foldable literal side
    preds.foreach(checkSound)
  }

  test("all-null and null-literal predicates prune everything, empty result keeps schema") {
    val keptAll = SnapshotManifest.prunedFiles(spark, statsRoot, 0L,
      col("allnull") === 5L)
    assert(keptAll.isEmpty, s"all-null column equality kept $keptAll")
    val df = SnapshotManifest.readWhere(spark, statsRoot, col("allnull") === 5L)
    assert(df.columns.toSeq == Seq("k", "m", "s", "maybe", "allnull", "ts"))
    assert(df.count() == 0)
    assert(SnapshotManifest.prunedFiles(spark, statsRoot, 0L,
      col("allnull").isNotNull).isEmpty)
    // every file has some nulls in `maybe` (id % 5) — isNull keeps all
    assert(SnapshotManifest.prunedFiles(spark, statsRoot, 0L,
      col("maybe").isNull).size ==
      SnapshotManifest.snapshotFiles(spark, statsRoot, 0L).size)
  }

  test("timestamp stats prune on instant literals") {
    // ts = k seconds; files are k-ranges, so a late cutoff keeps a suffix
    val kept = SnapshotManifest.prunedFiles(spark, statsRoot, 0L,
      col("ts") >= lit(java.time.Instant.ofEpochSecond(900L)))
    val all = SnapshotManifest.snapshotFiles(spark, statsRoot, 0L)
    assert(kept.size < all.size, "timestamp range should prune")
    // the unresolved string→timestamp cast idiom must stay conservative
    // (no session zone at eval time), never wrong
    checkSound(col("ts") >= lit("1970-01-01 00:15:00").cast("timestamp"))
  }

  test("stats-less commits interleave: old manifests keep all files and stay readable") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root, (0L until 100L).map(i => (i, s"x$i")).toDF("k", "x"))
    val kept = SnapshotManifest.prunedFiles(spark, root, 0L, col("k") === 5L)
    assert(kept == SnapshotManifest.snapshotFiles(spark, root, 0L),
      "stats-less files must never be pruned")
    assert(SnapshotManifest.readWhere(spark, root, col("k") === 5L).count() == 1)
    // stats commit on top: same table, pruning now works on the new version
    SnapshotManifest.commit(spark, root,
      (0L until 100L).map(i => (i, s"x$i")).toDF("k", "x")
        .repartitionByRange(4, col("k")), Seq("k"))
    val kept2 = SnapshotManifest.prunedFiles(spark, root, 1L, col("k") === 5L)
    assert(kept2.size == 1)
    assert(SnapshotManifest.readWhere(spark, root, col("k") === 5L).count() == 1)
  }

  test("stats json round-trips, including tabs/newlines/unicode in string bounds") {
    val fs = ManifestStats.FileStats(42L, Map(
      "a" -> ManifestStats.ColStats(Some(BigDecimal("-3.5")), Some(BigDecimal(7)), 1L),
      "weird" -> ManifestStats.ColStats(Some("a\tb\nc"), Some("zé😀"), 0L),
      "empty" -> ManifestStats.ColStats(None, None, 42L)))
    val json = ManifestStats.toJson(fs)
    assert(!json.contains('\t') && !json.contains('\n'),
      s"manifest line separators must be escaped inside stats json: $json")
    assert(ManifestStats.fromJson(json) == fs)
  }

  test("codePointCompare follows code-point order above the BMP") {
    // U+1F600 (surrogate pair) vs U+E000: compareTo says pair < E000,
    // code-point (and UTF-8 byte) order says pair > E000
    val hi = new String(Character.toChars(0x1F600))
    val mid = ""
    assert(ManifestStats.codePointCompare(hi, mid) > 0)
    assert(hi.compareTo(mid) < 0, "sanity: this is exactly where compareTo disagrees")
    assert(ManifestStats.codePointCompare("abc", "abd") < 0)
    assert(ManifestStats.codePointCompare("ab", "abc") < 0)
    assert(ManifestStats.codePointCompare("ab", "ab") == 0)
  }

  test("nextPrefix increments, skips the surrogate gap, drops max code points") {
    assert(ManifestStats.nextPrefix("abc").contains("abd"))
    assert(ManifestStats.nextPrefix("a퟿").contains("a")) // gap skip
    val maxCp = new String(Character.toChars(Character.MAX_CODE_POINT))
    assert(ManifestStats.nextPrefix("a" + maxCp).contains("b"))
    assert(ManifestStats.nextPrefix(maxCp * 3).isEmpty)
    assert(ManifestStats.nextPrefix("").isEmpty)
    // the bound really is an upper bound for the prefix family
    assert(ManifestStats.codePointCompare("abc" + maxCp, ManifestStats.nextPrefix("abc").get) < 0)
  }

  test("q113 shape: narrow key range over range-committed orders skips files") {
    val root = newRoot()
    SnapshotManifest.commit(spark, root,
      Tables.load(spark, sfDir, "orders").repartitionByRange(8, col("o_orderkey")),
      Seq("o_orderkey", "o_totalprice", "o_orderdate", "o_orderstatus"))
    // sf0.001 orderkeys are DENSE 0..1499: a 200-wide range lands in ~2 of
    // the 8 range-files (q113's wider 500..2500 range prunes at sf0.01+)
    val pred = col("o_orderkey").between(500, 700) && col("o_totalprice") > 1000.0
    val all = SnapshotManifest.snapshotFiles(spark, root, 0L)
    val kept = SnapshotManifest.prunedFiles(spark, root, 0L, pred)
    assert(all.size >= 8)
    assert(kept.size <= 3,
      s"a 200-wide key range should land in <=3 of 8 range-files (kept ${kept.size}/${all.size})")
  }

  test("changesBetween still prunes shared files with stats-ful manifests") {
    val root = newRoot()
    val base = (0L until 50L).map(i => (i, i * 10.0)).toDF("pk", "v")
    SnapshotManifest.commit(spark, root, base, Seq("pk"))
    SnapshotManifest.commit(spark, root,
      base.withColumn("v", when(col("pk") === 7L, col("v") + 1).otherwise(col("v"))),
      Seq("pk"))
    val feed = SnapshotManifest.changesBetween(spark, root, 0L, 1L, Seq("pk"))
    assert(feed.select("pk").distinct().as[Long].collect().toSeq == Seq(7L))
  }
}
