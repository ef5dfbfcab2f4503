package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** The round-12 one-flag merge story: `SnapshotManifest.setColocatedMerge`
  * declares the decomposed broadcast merge as a TABLE property, and every
  * snapshot MERGE verb picks it up — zero target-side Exchange, strictly
  * stronger than catalog bucketing's staged-side shuffle (BucketingSpec).
  */
class ColocatedMergeSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Upsert
  import graft.sources.SnapshotManifest

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  // -------------------------------------------------------------------
  // mergeColocated ≡ merge (the operator itself)
  // -------------------------------------------------------------------

  test("mergeColocated ≡ merge: updates, inserts, null PKs, duplicate keys, drift") {
    val target = Seq(
      (Some(1L), "a", 10L, "t1"), (Some(2L), "b", 20L, "t1"),
      (Some(2L), "b2", 21L, "t1"), // duplicate target key 2
      (None, "nt", 30L, "t1"), // null-PK target row: passes through
      (Some(4L), "d", 40L, "t1"))
      .toDF("id", "name", "v", Upsert.InsertTs)
    val staged = Seq(
      (Some(2L), "B", "s1"), (Some(2L), "B2", "s1"), // duplicate staged key 2
      (Some(5L), "E", "s1"), // pure insert
      (None: Option[Long], "NS", "s1")) // null-PK staged row: pure insert
      .toDF("id", "name", Upsert.InsertTs) // drift: staged lacks v
      .withColumn("extra", lit("dropped")) // drift: staged extra col
    val expect = Upsert.merge(target, staged, Seq("id"))
    val got = Upsert.mergeColocated(target, staged, Seq("id"))
    assert(got.columns.toSeq == target.columns.toSeq)
    assert(sameRows(got, expect),
      s"mergeColocated diverged:\nexpect ${expect.collect().mkString("; ")}" +
        s"\ngot    ${got.collect().mkString("; ")}")
  }

  test("mergeColocated ≡ merge on a composite PK over real tables") {
    val target = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val staged = target.limit(50)
      .withColumn("l_quantity", col("l_quantity") + 1000)
      .unionByName(Seq((-1L, -1, 5.0, 5.0))
        .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))
    val pk = Seq("l_orderkey", "l_linenumber")
    assert(sameRows(
      Upsert.mergeColocated(target, staged, pk),
      Upsert.merge(target, staged, pk)))
  }

  test("mergeColocated ≡ merge on a BINARY PK with duplicate target keys") {
    // exercises the content-canonical dedup key: Row.hashCode hashes
    // Array[Byte] identity, so a naive HashSet[Row] never collapses
    // binary keys — semantics must stay equal either way, and the
    // duplicate target keys force the matched-key path to carry them
    val target = Seq(
      (Array[Byte](1, 2), 1L), (Array[Byte](3, 4), 2L),
      (Array[Byte](1, 2), 3L), // duplicate binary key
      (Array[Byte](7, 7), 4L))
      .toDF("k", "v")
    val staged = Seq(
      (Array[Byte](1, 2), 10L), // matches two target rows
      (Array[Byte](9, 9), 99L)) // pure insert
      .toDF("k", "v")
    assert(sameRows(
      Upsert.mergeColocated(target, staged, Seq("k")),
      Upsert.merge(target, staged, Seq("k"))))
  }

  test("mergeColocated plan: zero shuffle Exchanges, broadcast joins only") {
    val target = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val staged = Seq((1L, -1.0), (-5L, -2.0)).toDF("o_orderkey", "o_totalprice")
    val merged = Upsert.mergeColocated(target, staged, Seq("o_orderkey"))
    merged.collect() // materialize so AQE finalizes the physical plan
    val plan = merged.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning") &&
      !plan.contains("CartesianProduct"),
      s"expected a shuffle-free co-located merge, got:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
  }

  // -------------------------------------------------------------------
  // the declared table property
  // -------------------------------------------------------------------

  private def freshTable(): String = {
    val root = java.nio.file.Files.createTempDirectory("colocmerge").toString
    val df = spark.range(0, 200).toDF("id")
      .withColumn("v", (col("id") * 10).cast("long"))
      .repartitionByRange(8, col("id"))
    SnapshotManifest.commit(spark, root, df, Seq("id"))
    root
  }

  test("setColocatedMerge declares, survives DML + append + full commit, and mergeWhere picks it up") {
    val root = freshTable()
    assert(!SnapshotManifest.colocatedMerge(spark, root, 0L))
    val v1 = SnapshotManifest.setColocatedMerge(spark, root, true)
    assert(SnapshotManifest.colocatedMerge(spark, root, v1))
    // idempotent re-declare is a no-op commit
    assert(SnapshotManifest.setColocatedMerge(spark, root, true) == v1)

    // the declared hint engages mergeWhere's decomposed path
    val before = Upsert.colocatedMergeCount.get()
    val staged = Seq((10L, -1L), (500L, -3L)).toDF("id", "v")
    val v2 = Upsert.mergeWhere(spark, root, staged, Seq("id"), Seq("id"))
    assert(Upsert.colocatedMergeCount.get() == before + 1,
      "declared merge=colocated did not engage the decomposed path")
    val got = SnapshotManifest.read(spark, root)
    assert(got.filter(col("id") === 10L).head().getAs[Long]("v") == -1L)
    assert(got.filter(col("id") === 500L).count() == 1L)
    assert(got.count() == 201L)

    // the hint survives an append (delta manifest), more DML, and a FULL
    // commit — like pk=/bloom=, a declared property is table state
    SnapshotManifest.appendRows(spark, root,
      Seq((600L, 1L)).toDF("id", "v"), Seq("id"))
    val vCur = SnapshotManifest.currentVersion(spark, root).get
    assert(SnapshotManifest.colocatedMerge(spark, root, vCur))
    val vFull = SnapshotManifest.commit(spark, root,
      Seq((1L, 1L)).toDF("id", "v"), Seq("id"))
    assert(SnapshotManifest.colocatedMerge(spark, root, vFull),
      "merge=colocated dropped by a full commit")
    // and clearing it works
    val vOff = SnapshotManifest.setColocatedMerge(spark, root, false)
    assert(!SnapshotManifest.colocatedMerge(spark, root, vOff))
  }

  test("mergeWhere result identical with and without the declared hint") {
    val rootA = freshTable()
    val rootB = freshTable()
    SnapshotManifest.setColocatedMerge(spark, rootA, true)
    val staged = Seq((10L, -1L), (12L, -2L), (500L, -3L)).toDF("id", "v")
    Upsert.mergeWhere(spark, rootA, staged, Seq("id"), Seq("id"))
    Upsert.mergeWhere(spark, rootB, staged, Seq("id"), Seq("id"))
    assert(sameRows(SnapshotManifest.read(spark, rootA),
      SnapshotManifest.read(spark, rootB)))
  }

  test("a staged batch past maxColocatedRows degrades loudly to the shuffle merge") {
    val root = freshTable()
    SnapshotManifest.setColocatedMerge(spark, root, true)
    val before = Upsert.colocatedMergeCount.get()
    val staged = Seq((10L, -1L), (12L, -2L), (14L, -4L)).toDF("id", "v")
    Upsert.mergeWhere(spark, root, staged, Seq("id"), Seq("id"),
      maxColocatedRows = 2L)
    assert(Upsert.colocatedMergeCount.get() == before,
      "over-cap batch should have degraded to the shuffle merge")
    val got = SnapshotManifest.read(spark, root)
    assert(got.filter(col("id") === 10L).head().getAs[Long]("v") == -1L)
    assert(got.count() == 200L)
  }

  test("explicit colocated=Some(true) overrides an undeclared table") {
    val root = freshTable()
    val before = Upsert.colocatedMergeCount.get()
    Upsert.mergeWhere(spark, root, Seq((10L, -1L)).toDF("id", "v"),
      Seq("id"), Seq("id"), colocated = Some(true))
    assert(Upsert.colocatedMergeCount.get() == before + 1)
    assert(SnapshotManifest.read(spark, root)
      .filter(col("id") === 10L).head().getAs[Long]("v") == -1L)
  }

  test("mergeWhereMoR with the declared hint: decomposed append-side merge, same result") {
    val rootA = freshTable()
    val rootB = freshTable()
    SnapshotManifest.setColocatedMerge(spark, rootA, true)
    val staged = Seq((10L, -1L), (500L, -3L)).toDF("id", "v")
    val before = Upsert.colocatedMergeCount.get()
    Upsert.mergeWhereMoR(spark, rootA, staged, Seq("id"), Seq("id"))
    assert(Upsert.colocatedMergeCount.get() == before + 1,
      "declared hint did not engage mergeWhereMoR's decomposed merge")
    Upsert.mergeWhereMoR(spark, rootB, staged, Seq("id"), Seq("id"))
    assert(sameRows(SnapshotManifest.read(spark, rootA),
      SnapshotManifest.read(spark, rootB)))
  }
}
