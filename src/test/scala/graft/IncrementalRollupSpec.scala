package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.IncrementalRollup
import graft.sources.SnapshotManifest

/** Incremental rollup maintenance: a touched-group refresh (any aggregate,
  * deletes and group moves included) and the additive delta-only path must
  * both converge to exactly what a from-scratch aggregation of the current
  * snapshot produces.
  */
class IncrementalRollupSpec extends SparkSpec {
  import spark.implicits._

  private def v0 = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0),
    (4L, "b", 7.0), (5L, "c", 100.0), (6L, null.asInstanceOf[String], 1.0)
  ).toDF("id", "grp", "x")

  // vs v0: insert 7 (new group d), update 2 (price change), update 3
  // (MOVES b → a), delete 5 (group c vanishes entirely), null-key group
  // gains a row
  private def v1 = Seq(
    (1L, "a", 10.0), (2L, "a", 25.0), (3L, "a", 5.0),
    (4L, "b", 7.0), (6L, null.asInstanceOf[String], 1.0),
    (7L, "d", 50.0), (8L, null.asInstanceOf[String], 2.0)
  ).toDF("id", "grp", "x")

  private def fullAgg(df: DataFrame): Set[(String, Long, Double, Double)] =
    df.groupBy($"grp").agg(
      count(lit(1)).alias("n"),
      sum($"x".cast("decimal(30,6)")).cast("double").alias("sum_x"),
      max($"x").alias("max_x"))
      .as[(String, Long, Double, Double)].collect().toSet

  test("touched-group refresh matches from-scratch aggregation across churn") {
    val root = Files.createTempDirectory("irollup").toString
    val (src, roll) = (s"$root/src", s"$root/rollup")
    val aggs = Seq(
      count(lit(1)).alias("n"),
      sum($"x".cast("decimal(30,6)")).cast("double").alias("sum_x"),
      max($"x").alias("max_x"))

    SnapshotManifest.commit(spark, src, v0)
    IncrementalRollup.refresh(spark, src, roll, Seq("id"), Seq("grp"), aggs)
    assert(IncrementalRollup.read(spark, roll)
      .as[(String, Long, Double, Double)].collect().toSet == fullAgg(v0))
    assert(IncrementalRollup.reflectedVersion(spark, roll).contains(0L))

    // refresh against an unchanged source is a no-op (no new commit)
    val rv = SnapshotManifest.currentVersion(spark, roll).get
    assert(IncrementalRollup.refresh(spark, src, roll, Seq("id"), Seq("grp"), aggs) == rv)
    assert(SnapshotManifest.currentVersion(spark, roll).contains(rv))

    SnapshotManifest.commit(spark, src, v1)
    IncrementalRollup.refresh(spark, src, roll, Seq("id"), Seq("grp"), aggs)
    // deletes shrink max_x (non-algebraic), moved row counts once in its
    // new group, vanished group c is gone, null group is a real group
    assert(IncrementalRollup.read(spark, roll)
      .as[(String, Long, Double, Double)].collect().toSet == fullAgg(v1))
    assert(IncrementalRollup.reflectedVersion(spark, roll).contains(1L))
  }

  test("additive refresh applies the change feed as signed deltas, never rescanning the source") {
    val root = Files.createTempDirectory("irollup2").toString
    val (src, roll) = (s"$root/src", s"$root/rollup")
    def expected(df: DataFrame) = df.groupBy($"grp").agg(
      count(lit(1)).alias("n_rows"),
      sum($"x".cast("decimal(30,6)")).cast("double").alias("sum_x"))
      .as[(String, Long, Double)].collect().toSet

    SnapshotManifest.commit(spark, src, v0)
    IncrementalRollup.refreshAdditive(spark, src, roll, Seq("id"), Seq("grp"), Seq("x"))
    assert(IncrementalRollup.read(spark, roll)
      .as[(String, Long, Double)].collect().toSet == expected(v0))

    SnapshotManifest.commit(spark, src, v1)
    IncrementalRollup.refreshAdditive(spark, src, roll, Seq("id"), Seq("grp"), Seq("x"))
    assert(IncrementalRollup.read(spark, roll)
      .as[(String, Long, Double)].collect().toSet == expected(v1))
    assert(IncrementalRollup.reflectedVersion(spark, roll).contains(1L))
  }

  test("refresh over a MATERIALIZED feed (per-commit images) matches from-scratch") {
    val root = Files.createTempDirectory("irollup").toString
    val (src, roll) = (s"$root/src", s"$root/rollup")
    val aggs = Seq(
      count(lit(1)).alias("n"),
      sum($"x".cast("decimal(30,6)")).cast("double").alias("sum_x"),
      max($"x").alias("max_x"))
    SnapshotManifest.commit(spark, src, v0)
    IncrementalRollup.refresh(spark, src, roll, Seq("id"), Seq("grp"), aggs)
    // TWO commits since the last refresh, feed materialized per commit:
    // the refresh consumes the persisted per-commit images (intermediate
    // pre/post rows included) instead of recomputing the collapsed diff
    SnapshotManifest.commit(spark, src, v1)
    SnapshotManifest.deleteWhere(spark, src, $"id" === 7L, Seq("id"))
    graft.sources.ChangeFeed.materializeNew(spark, src, Seq("id"))
    IncrementalRollup.refresh(spark, src, roll, Seq("id"), Seq("grp"), aggs)
    assert(IncrementalRollup.read(spark, roll)
      .as[(String, Long, Double, Double)].collect().toSet ==
      fullAgg(v1.filter($"id" =!= 7L)))
    // additive twin over a MULTI-COMMIT span: key 7 is inserted (v4) and
    // deleted again (v5) INSIDE the span — the per-commit feed carries
    // both images where a collapsed diff would show nothing; the signed
    // deltas must telescope to zero for it
    val roll2 = s"$root/rollup2"
    SnapshotManifest.commit(spark, src, v0) // v3: back to v0 content
    graft.sources.ChangeFeed.materializeNew(spark, src, Seq("id"))
    IncrementalRollup.refreshAdditive(spark, src, roll2, Seq("id"), Seq("grp"), Seq("x"))
    SnapshotManifest.commit(spark, src, v1) // v4 (inserts id 7, group d)
    SnapshotManifest.deleteWhere(spark, src, $"id" === 7L, Seq("id")) // v5
    graft.sources.ChangeFeed.materializeNew(spark, src, Seq("id"))
    IncrementalRollup.refreshAdditive(spark, src, roll2, Seq("id"), Seq("grp"), Seq("x"))
    val got = IncrementalRollup.read(spark, roll2)
      .select($"grp", $"n_rows", $"sum_x")
      .as[(String, Long, Double)].collect().toSet
    val want = v1.filter($"id" =!= 7L).groupBy($"grp")
      .agg(count(lit(1)).alias("n_rows"),
        sum($"x".cast("decimal(30,6)")).cast("double").alias("sum_x"))
      .as[(String, Long, Double)].collect().toSet
    assert(got == want)
    // sketch twin over the same materialized multi-commit span: estimates
    // must equal a from-scratch rebuild of the current snapshot
    val roll3 = s"$root/rollup3"
    val roll3Scratch = s"$root/rollup3s"
    IncrementalRollup.refreshDistinctSketch(spark, src, roll3,
      Seq("id"), Seq("grp"), "id")
    SnapshotManifest.commit(spark, src, v0) // v6: churn again
    graft.sources.ChangeFeed.materializeNew(spark, src, Seq("id"))
    IncrementalRollup.refreshDistinctSketch(spark, src, roll3,
      Seq("id"), Seq("grp"), "id")
    IncrementalRollup.refreshDistinctSketch(spark, src, roll3Scratch,
      Seq("id"), Seq("grp"), "id")
    def counts(r: String) = IncrementalRollup.readDistinctCounts(spark, r)
      .select($"grp", $"approx_distinct".cast("long"))
      .as[(String, Long)].collect().toSet
    assert(counts(roll3) == counts(roll3Scratch))
  }

  test("empty initial source: the stamp-less rollup falls back to a full build once data arrives") {
    val root = Files.createTempDirectory("irollup4").toString
    val (src, roll) = (s"$root/src", s"$root/rollup")
    val aggs = Seq(count(lit(1)).alias("n"),
      sum($"x".cast("decimal(30,6)")).cast("double").alias("sum_x"),
      max($"x").alias("max_x"))
    SnapshotManifest.commit(spark, src, v0.limit(0))
    IncrementalRollup.refresh(spark, src, roll, Seq("id"), Seq("grp"), aggs)
    assert(IncrementalRollup.read(spark, roll).count() == 0)
    assert(IncrementalRollup.reflectedVersion(spark, roll).isEmpty) // no row carries the stamp
    SnapshotManifest.commit(spark, src, v1)
    IncrementalRollup.refresh(spark, src, roll, Seq("id"), Seq("grp"), aggs)
    assert(IncrementalRollup.read(spark, roll)
      .as[(String, Long, Double, Double)].collect().toSet == fullAgg(v1))
    assert(IncrementalRollup.reflectedVersion(spark, roll).contains(1L))
  }

  test("distinct-sketch refresh: insert-only groups union, churned groups recompute, estimates match a rebuild") {
    val root = Files.createTempDirectory("irollup5").toString
    val (src, roll, rollFull) = (s"$root/src", s"$root/rollup", s"$root/rebuild")
    // grp a: gains an insert only; grp b: suffers a delete (must recompute);
    // grp c: vanishes; grp d: appears; x duplicated within a group so
    // distinct < count
    val u0 = Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "a", 20L),
      (4L, "b", 5L), (5L, "b", 7L), (6L, "c", 1L)
    ).toDF("id", "grp", "x")
    val u1 = Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "a", 20L), (7L, "a", 30L),
      (4L, "b", 5L), (8L, "d", 50L), (9L, "d", 50L)
    ).toDF("id", "grp", "x")

    SnapshotManifest.commit(spark, src, u0)
    IncrementalRollup.refreshDistinctSketch(spark, src, roll, Seq("id"), Seq("grp"), "x")
    assert(IncrementalRollup.readDistinctCounts(spark, roll)
      .as[(String, Long)].collect().toSet == Set(("a", 2L), ("b", 2L), ("c", 1L)))

    SnapshotManifest.commit(spark, src, u1)
    IncrementalRollup.refreshDistinctSketch(spark, src, roll, Seq("id"), Seq("grp"), "x")
    val incr = IncrementalRollup.readDistinctCounts(spark, roll)
      .as[(String, Long)].collect().toSet
    assert(incr == Set(("a", 3L), ("b", 1L), ("d", 1L)))
    // a from-scratch sketch rollup of the final state agrees exactly: the
    // estimate is a function of the sketched value SET, however reached
    IncrementalRollup.refreshDistinctSketch(spark, src, rollFull, Seq("id"), Seq("grp"), "x")
    assert(IncrementalRollup.readDistinctCounts(spark, rollFull)
      .as[(String, Long)].collect().toSet == incr)
  }

  test("additive refresh: deleting a group's last non-null measure yields NULL, not 0 (SQL SUM)") {
    val root = Files.createTempDirectory("irollup6").toString
    val (src, roll) = (s"$root/src", s"$root/rollup")
    val w0 = Seq((1L, "g", Some(5.0)), (2L, "g", None), (3L, "h", Some(2.0)))
      .toDF("id", "grp", "x")
    val w1 = Seq((2L, "g", None: Option[Double]), (3L, "h", Some(2.0)))
      .toDF("id", "grp", "x")
    SnapshotManifest.commit(spark, src, w0)
    IncrementalRollup.refreshAdditive(spark, src, roll, Seq("id"), Seq("grp"), Seq("x"))
    SnapshotManifest.commit(spark, src, w1)
    IncrementalRollup.refreshAdditive(spark, src, roll, Seq("id"), Seq("grp"), Seq("x"))
    val out = IncrementalRollup.read(spark, roll)
      .as[(String, Long, Option[Double])].collect().toSet
    // group g survives (one null-measure row) but its sum is NULL — deltas
    // alone cannot distinguish "sums to zero" from "nothing left to sum"
    assert(out == Set(("g", 1L, None), ("h", 1L, Some(2.0))))
  }

  test("additive refresh chain past 2^53/1e6 stays exact (decimal bookkeeping, not a double round-trip)") {
    // sums above ~9.007e9 cannot carry six decimal places in a double
    // (ulp at 1.6e10 is ~3.8e-6), so bookkeeping that round-tripped the
    // running sum through the surfaced double would absorb a residue on
    // every refresh; the stored __s_ decimal must keep the chain equal to
    // a from-scratch aggregation bit for bit
    val root = Files.createTempDirectory("irollup11").toString
    val (src, roll) = (s"$root/src", s"$root/rollup")
    def mk(rows: Seq[(Long, String, String)]) =
      rows.toDF("id", "grp", "xs")
        .select($"id", $"grp", $"xs".cast("decimal(30,6)").alias("x"))
    val s0 = mk(Seq((1L, "g", "16000000000.000001"), (2L, "g", "0.000002"),
      (3L, "h", "1.500000")))
    val s1 = mk(Seq((1L, "g", "16000000000.000001"), (2L, "g", "0.000003"),
      (3L, "h", "1.500000"), (4L, "g", "0.000001")))
    val s2 = mk(Seq((1L, "g", "16000000000.000001"), (2L, "g", "0.000003"),
      (4L, "g", "0.000001"), (5L, "g", "7000000000.000005")))
    SnapshotManifest.commit(spark, src, s0)
    IncrementalRollup.refreshAdditive(spark, src, roll, Seq("id"), Seq("grp"), Seq("x"))
    SnapshotManifest.commit(spark, src, s1)
    IncrementalRollup.refreshAdditive(spark, src, roll, Seq("id"), Seq("grp"), Seq("x"))
    SnapshotManifest.commit(spark, src, s2)
    IncrementalRollup.refreshAdditive(spark, src, roll, Seq("id"), Seq("grp"), Seq("x"))
    // internal exact sum after the chain == from-scratch decimal aggregation
    val chained = SnapshotManifest.read(spark, roll)
      .select($"grp", $"__s_x".cast("string"))
      .as[(String, String)].collect().toMap
    val scratch = s2.groupBy($"grp")
      .agg(sum($"x").cast("decimal(30,6)").cast("string").alias("s"))
      .as[(String, String)].collect().toMap
    assert(chained == scratch, s"chained=$chained scratch=$scratch")
    assert(chained("g") == "23000000000.000010")
    // the surfaced double view is the cast of that same exact decimal
    val view = IncrementalRollup.read(spark, roll)
      .as[(String, Long, Double)].collect().toSet
    val viewScratch = s2.groupBy($"grp").agg(
      count(lit(1)).alias("n_rows"),
      sum($"x").cast("decimal(30,6)").cast("double").alias("sum_x"))
      .as[(String, Long, Double)].collect().toSet
    assert(view == viewScratch, s"view=$view scratch=$viewScratch")
  }

  test("vacuumed from-version: refresh falls back to a full rebuild instead of throwing") {
    val root = Files.createTempDirectory("irollup7").toString
    val (src, roll) = (s"$root/src", s"$root/rollup")
    val aggs = Seq(count(lit(1)).alias("n"),
      sum($"x".cast("decimal(30,6)")).cast("double").alias("sum_x"),
      max($"x").alias("max_x"))
    SnapshotManifest.commit(spark, src, v0)
    IncrementalRollup.refresh(spark, src, roll, Seq("id"), Seq("grp"), aggs)
    SnapshotManifest.commit(spark, src, v1)
    SnapshotManifest.vacuum(spark, src, keep = 1) // erases v0's manifest
    IncrementalRollup.refresh(spark, src, roll, Seq("id"), Seq("grp"), aggs)
    assert(IncrementalRollup.read(spark, roll)
      .as[(String, Long, Double, Double)].collect().toSet == fullAgg(v1))
  }

  test("additive refresh of a pre-__nn rollup rebuilds instead of wedging on missing columns") {
    val root = Files.createTempDirectory("irollup8").toString
    val (src, roll) = (s"$root/src", s"$root/rollup")
    SnapshotManifest.commit(spark, src, v0)
    // a rollup written by the pre-bookkeeping format: no __nn_x column
    SnapshotManifest.commit(spark, roll,
      v0.groupBy($"grp").agg(count(lit(1)).alias("n_rows"),
        sum($"x".cast("decimal(30,6)")).cast("double").alias("sum_x"))
        .withColumn("__src_version", lit(0L)))
    SnapshotManifest.commit(spark, src, v1)
    IncrementalRollup.refreshAdditive(spark, src, roll, Seq("id"), Seq("grp"), Seq("x"))
    val expected = v1.groupBy($"grp").agg(count(lit(1)).alias("n_rows"),
      sum($"x".cast("decimal(30,6)")).cast("double").alias("sum_x"))
      .as[(String, Long, Double)].collect().toSet
    assert(IncrementalRollup.read(spark, roll)
      .as[(String, Long, Double)].collect().toSet == expected)
  }

  test("refreshBy rejects a derived key that shadows a source column") {
    val root = Files.createTempDirectory("irollup9").toString
    SnapshotManifest.commit(spark, s"$root/src", v0)
    val e = intercept[IllegalArgumentException] {
      IncrementalRollup.refreshBy(spark, s"$root/src", s"$root/rollup",
        Seq("id"), Seq("x" -> upper($"grp")),
        Seq(sum($"x".cast("decimal(30,6)")).cast("double").alias("sum_x")))
    }
    assert(e.getMessage.contains("collides with a source column"))
  }

  test("cow-delete synergy: a refresh after deleteWhere diffs only the rewritten file pair") {
    val root = Files.createTempDirectory("irollup10").toString
    val (src, roll) = (s"$root/src", s"$root/rollup")
    val aggs = Seq(count(lit(1)).alias("n"),
      sum($"x".cast("decimal(30,6)")).cast("double").alias("sum_x"))
    val rows = (1L to 100L).map(i => (i, if (i % 2 == 0) "even" else "odd", i.toDouble))
      .toDF("id", "grp", "x")
    SnapshotManifest.commit(spark, src, rows.repartitionByRange(4, $"id"), Seq("id"))
    IncrementalRollup.refresh(spark, src, roll, Seq("id"), Seq("grp"), aggs)
    SnapshotManifest.deleteWhere(spark, src, $"id".between(10, 20), Seq("id"))
    IncrementalRollup.refresh(spark, src, roll, Seq("id"), Seq("grp"), aggs)
    val expected = rows.filter(!$"id".between(10, 20))
      .groupBy($"grp").agg(aggs.head, aggs.tail: _*)
      .as[(String, Long, Double)].collect().toSet
    assert(IncrementalRollup.read(spark, roll)
      .as[(String, Long, Double)].collect().toSet == expected)
    // the change feed's file-diff prune means the refresh read only the
    // rewritten file pair, not the table — asserted structurally: shared
    // files between the two source versions exist (so there was something
    // to prune)
    assert((SnapshotManifest.snapshotFiles(spark, src, 0L).toSet intersect
      SnapshotManifest.snapshotFiles(spark, src, 1L).toSet).nonEmpty)
  }

  test("mergeWhere synergy: a refresh after a file-pruned MERGE integrates updates and inserts") {
    val root = Files.createTempDirectory("irollup11").toString
    val (src, roll) = (s"$root/src", s"$root/rollup")
    val aggs = Seq(count(lit(1)).alias("n"),
      sum($"x".cast("decimal(30,6)")).cast("double").alias("sum_x"))
    val rows = (1L to 100L).map(i => (i, if (i % 2 == 0) "even" else "odd", i.toDouble))
      .toDF("id", "grp", "x")
    SnapshotManifest.commit(spark, src, rows.repartitionByRange(4, $"id"), Seq("id"))
    IncrementalRollup.refresh(spark, src, roll, Seq("id"), Seq("grp"), aggs)
    // narrow-key MERGE: update two rows in one range, insert one new key
    val staged = Seq((10L, "even", 1000.0), (11L, "odd", 2000.0),
      (500L, "new", 7.0)).toDF("id", "grp", "x")
    graft.operators.Upsert.mergeWhere(spark, src, staged, Seq("id"), Seq("id"))
    IncrementalRollup.refresh(spark, src, roll, Seq("id"), Seq("grp"), aggs)
    val merged = graft.operators.Upsert.merge(rows, staged, Seq("id"))
    val expected = merged.groupBy($"grp").agg(aggs.head, aggs.tail: _*)
      .as[(String, Long, Double)].collect().toSet
    assert(IncrementalRollup.read(spark, roll)
      .as[(String, Long, Double)].collect().toSet == expected)
    // file-pruned: the two source versions share files, so the change feed
    // diffed only the rewritten/new ones
    assert((SnapshotManifest.snapshotFiles(spark, src, 0L).toSet intersect
      SnapshotManifest.snapshotFiles(spark, src, 1L).toSet).nonEmpty)
  }

  test("read preserves user columns that legitimately start with __") {
    val root = Files.createTempDirectory("irollup12").toString
    val (src, roll) = (s"$root/src", s"$root/rollup")
    val rows = Seq((1L, "east", 5.0), (2L, "west", 7.0))
      .toDF("id", "__region", "x") // adversarial user name
    SnapshotManifest.commit(spark, src, rows)
    IncrementalRollup.refresh(spark, src, roll, Seq("id"), Seq("__region"),
      Seq(count(lit(1)).alias("n")))
    val got = IncrementalRollup.read(spark, roll)
    assert(got.columns.contains("__region"),
      s"user __region dropped: ${got.columns.mkString(",")}")
    assert(got.as[(String, Long)].collect().toSet == Set(("east", 1L), ("west", 1L)))
  }

  test("refresh without a committed source fails fast") {
    val root = Files.createTempDirectory("irollup3").toString
    val e = intercept[IllegalStateException] {
      IncrementalRollup.refresh(spark, s"$root/missing", s"$root/rollup",
        Seq("id"), Seq("grp"), Seq(count(lit(1)).alias("n")))
    }
    assert(e.getMessage.contains("no committed source snapshot"))
  }
}
