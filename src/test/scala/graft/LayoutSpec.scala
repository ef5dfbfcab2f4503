package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: interleave/bucket arithmetic, and the actual pruning
  * effect on written parquet files — the property the operator exists for.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bit patterns (hand-checked)") {
    // a=0b101 even positions → 0b10001; b=0b011 odd positions → 0b01010
    val out = spark.range(1)
      .select(
        Layout.zValue(lit(5L), lit(3L), 3).alias("z1"),
        Layout.zValue(lit(0L), lit(0L), 3).alias("z2"),
        Layout.zValue(lit(7L), lit(7L), 3).alias("z3"))
      .head()
    assert(out.getLong(0) == 27L) // 0b11011
    assert(out.getLong(1) == 0L)
    assert(out.getLong(2) == 63L) // all 6 low bits set
  }

  test("bucketLong: shift rule, power-of-two widths, clamping") {
    val df = Seq(0L, 1L, 255L, 256L, 511L, 1000L, -5L).toDF("v")
    // width 512 at 8 bits → s=1: bucket = v >> 1 (clamped into [0,511])
    val got = df.select(Layout.bucketLong($"v", 0L, 511L, 8).alias("b"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 127L, 128L, 255L, 255L, 0L))
    // width exactly 256 at 8 bits → identity
    val id = Seq(10L, 42L).toDF("v")
      .select(Layout.bucketLong($"v", 0L, 255L, 8)).as[Long].collect().toSeq
    assert(id == Seq(10L, 42L))
    // degenerate one-value domain → bucket 0
    val one = Seq(7L).toDF("v")
      .select(Layout.bucketLong($"v", 7L, 7L, 8)).as[Long].collect().toSeq
    assert(one == Seq(0L))
  }

  test("zOrderBy written files prune on BOTH dimensions; x-sort cannot") {
    // full 64×64 grid: every (x, y) once
    val grid = spark.range(4096)
      .select(($"id" % 64).alias("x"), floor($"id" / 64).alias("y"))
    val dir = Files.createTempDirectory("graft_layout").toString

    Layout.zOrderBy(grid, "x", "y", bits = 6, numFiles = 16)
      .write.parquet(s"$dir/zorder")
    grid.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.parquet(s"$dir/xsort")

    // per-file bounding boxes — exactly the min/max stats a scan prunes with
    def boxes(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().alias("f"))
      .agg(min($"y").alias("ymin"), max($"y").alias("ymax"))
      .select($"ymin", $"ymax").as[(Long, Long)].collect().toSeq
    val zBoxes = boxes(s"$dir/zorder")
    val xBoxes = boxes(s"$dir/xsort")
    assert(zBoxes.size == 16 && xBoxes.size == 16)

    // predicate y IN [0,7]: a y-band. Z-order tiles the plane, so only the
    // bottom band of boxes intersects; an x-sorted layout gives every file
    // the full y range — zero pruning on the second dimension.
    def touching(bs: Seq[(Long, Long)]) = bs.count { case (lo, hi) => lo <= 7 && hi >= 0 }
    assert(touching(xBoxes) == 16, s"x-sort should touch all files: $xBoxes")
    assert(touching(zBoxes) <= 8,
      s"z-order should prune most files for a y-band, touched ${touching(zBoxes)}: $zBoxes")
  }

  test("zValueN: 2-column form coincides with zValue; 3-column interleave round-trips") {
    import graft.operators.Layout
    val df = Seq((5L, 9L, 3L)).toDF("a", "b", "c")
    val (two, twoN) = df.select(
      Layout.zValue($"a", $"b", 4).alias("z"),
      Layout.zValueN(Seq($"a", $"b"), 4).alias("zn"))
      .as[(Long, Long)].head()
    assert(two == twoN)
    // 3 columns, bits=2: a=0b01, b=0b11, c=0b10 → bit layout i*3+j
    val z3 = Seq((1L, 3L, 2L)).toDF("a", "b", "c")
      .select(Layout.zValueN(Seq($"a", $"b", $"c"), 2)).as[Long].head()
    // expected: a bits (1,0) at pos 0,3; b bits (1,1) at pos 1,4; c (0,1) at pos 2,5
    assert(z3 == ((1L << 0) | (1L << 1) | (0L << 2) | (0L << 3) | (1L << 4) | (1L << 5)))
  }

  test("zOrderByN: three-column layout prunes on EVERY axis") {
    import graft.operators.Layout
    val rows = (0L until 4096L).map(i => (i % 16, (i / 16) % 16, i / 256, i))
      .toDF("x", "y", "w", "id")
    val dir = java.nio.file.Files.createTempDirectory("z3").toString + "/t"
    Layout.zOrderByN(rows, Seq("x", "y", "w"), bits = 4, numFiles = 16)
      .write.parquet(dir)
    val read = spark.read.parquet(dir)
    def touched(c: String, v: Long): Long = {
      val boxes = read.groupBy(input_file_name().alias("f"))
        .agg(min(col(c)).alias("mn"), max(col(c)).alias("mx"))
        .as[(String, Long, Long)].collect()
      boxes.count { case (_, mn, mx) => mn <= v && v <= mx }
    }
    // every axis prunes: a point on any single column touches a strict
    // minority of the 16 files (an unclustered layout touches all 16)
    assert(touched("x", 3) <= 8, s"x point touched ${touched("x", 3)}")
    assert(touched("y", 3) <= 8, s"y point touched ${touched("y", 3)}")
    assert(touched("w", 3) <= 8, s"w point touched ${touched("w", 3)}")
  }

  test("optimizeSnapshot: atomic z-order rewrite, stats on both axes, silent change feed") {
    import graft.sources.SnapshotManifest
    import graft.operators.Layout
    val root = java.nio.file.Files.createTempDirectory("optz").toString
    // hash-scattered layout: every file spans the whole (x, y) plane, so a
    // point query on either axis prunes NOTHING
    val rows = (0L until 4096L).map(i => (i, i % 64, (i / 64) % 64, s"p$i"))
      .toDF("id", "x", "y", "payload")
    SnapshotManifest.commit(spark, root, rows.repartition(16, $"id"), Seq("x", "y"))
    val before = SnapshotManifest.prunedFiles(spark, root, 0L,
      $"y".between(10, 12)).size
    assert(before == 16, s"scattered layout should admit every file, got $before")
    val v = Layout.optimizeSnapshot(spark, root, Seq("x", "y"), bits = 6, numFiles = 16)
    assert(v == 1L)
    // pruning now bites on the SECOND axis too
    val after = SnapshotManifest.prunedFiles(spark, root, 1L,
      $"y".between(10, 12)).size
    assert(after <= 8, s"z-ordered layout should prune a y-band, admitted $after")
    // data identical up to order; the feed sees only file moves → empty
    val got = SnapshotManifest.read(spark, root)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == rows.as[(Long, Long, Long, String)].collect().toSet)
    assert(SnapshotManifest.changesBetween(spark, root, 0L, 1L, Seq("id")).isEmpty)
    // inherited + z-order stats both present
    val stats = SnapshotManifest.snapshotFileStats(spark, root, 1L)
    assert(stats.values.forall(s => s.cols.contains("x") && s.cols.contains("y")))
  }
}
