package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-plan regression guards: the plan properties the 100 TB design
  * depends on (scan pruning, filter pushdown, broadcast dims, map-side
  * partial top-k, the window rewrite) asserted as substrings of the plan,
  * so a refactor that silently loses them fails CI rather than the bench.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): String = df.queryExecution.sparkPlan.toString()
  private def scanOf(df: DataFrame): String =
    df.queryExecution.sparkPlan.collectLeaves().mkString("\n")

  test("q01: scan prunes to the referenced lineitem columns only") {
    val scan = scanOf(Queries.q01PricingSummary(spark, sfDir))
    assert(scan.contains("l_returnflag") && scan.contains("l_quantity"))
    assert(!scan.contains("l_partkey") && !scan.contains("l_comment"),
      s"scan reads unneeded columns:\n$scan")
  }

  test("q03: predicates reach the parquet scan as PushedFilters") {
    val scan = scanOf(Queries.q03ProjectFilter(spark, sfDir))
    assert(scan.contains("PushedFilters:"), scan)
    assert(scan.contains("In(o_orderstatus") || scan.contains("o_orderstatus"), scan)
    assert(scan.contains("GreaterThan(o_totalprice") ||
      scan.contains("o_totalprice"), scan)
  }

  test("q02: the three explicit dimension joins broadcast") {
    // (at fixture scale Catalyst may ALSO stats-broadcast the orders side;
    // what must never regress is the three hinted dimension broadcasts)
    val plan = planOf(Queries.q02RevenueByNation(spark, sfDir))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 3, s"expected >= 3 broadcast dim joins, got $broadcasts:\n$plan")
  }

  test("q62: stratified sample scan does not read the text column") {
    val scan = scanOf(Queries.q62StratifiedSample(spark, sfDir))
    assert(scan.contains("doc_id") && scan.contains("lang"))
    assert(!scan.contains("text"), s"sample scan reads text:\n$scan")
  }

  test("q68: topk aggregates map-side (partial_topk before the exchange)") {
    val plan = planOf(Queries.q68TopkAgg(spark, sfDir))
    assert(plan.contains("partial_topk"), plan)
  }

  test("q76: doc filter pushes to the tf scan; top-3 uses WindowGroupLimit; no text col beyond tokenize") {
    val df = Queries.q76Tfidf(spark, sfDir)
    val scan = scanOf(df)
    assert(scan.contains("LessThan(doc_id,100)"), scan)
    assert(!scan.contains("n_chars") && !scan.contains("source"),
      s"tfidf scans unneeded columns:\n$scan")
    val plan = planOf(df)
    assert(plan.contains("WindowGroupLimit"), plan) // rank<=3 prunes before the full sort
    assert(plan.contains("partial_count"), plan)    // map-side partials on both aggs
  }

  test("q77: one as-of window on user_id; event_type filters reach the scans") {
    val df = Queries.q77Attribution(spark, sfDir)
    val scan = scanOf(df)
    assert(scan.contains("EqualTo(event_type,click)") &&
      scan.contains("EqualTo(event_type,view)"), scan)
    val plan = planOf(df)
    // "Window [" matches the operator at any tree position (+-, :-, root)
    // and not WindowGroupLimit
    assert(plan.split("\n").count(_.contains("Window [")) == 1 &&
      plan.contains("windowspecdefinition(user_id"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"as-of join degenerated into a product join:\n$plan")
  }

  test("q78: RANGE frame windows are partitioned by user (no single-partition window)") {
    val plan = planOf(Queries.q78RollingRange(spark, sfDir))
    assert(plan.contains("RangeFrame"), plan)
    assert(plan.contains("windowspecdefinition(user_id"), plan)
  }

  test("AQE skew-join splits the hot partition at runtime (the adaptive twin of q66's manual salt)") {
    // q66 demonstrates DETERMINISTIC pre-planned salting; this pins the
    // adaptive alternative on the same shape of input — a hot key holding
    // most of the bytes — so the engine documents both skew answers and
    // when each applies (see operators/Skew.scala's decision rule).
    import spark.implicits._
    import org.apache.spark.sql.functions.{when, lpad, concat, lit}
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffle join
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~90% of rows (padded to ~120 B each) share key 1 → one shuffle
      // partition dwarfs the median and trips the runtime skew detector
      val big = spark.range(0, 20000)
        .select(when($"id" % 10 < 9, 1L).otherwise($"id").alias("k"),
          lpad($"id".cast("string"), 100, "x").alias("pad"))
      val dim = spark.range(0, 1000).select($"id".alias("k"),
        concat(lit("name_"), $"id").alias("name"))
      val joined = big.join(dim, Seq("k"))
      // 18000 hot-key rows + the 100 cold keys (ids 9,19,..,999) that fall
      // inside dim's 0..999 range. collect() (not count(), which plans a
      // SEPARATE query execution) materializes THIS df's AQE final plan.
      assert(joined.collect().length == 18100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not flag the skewed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q97/q98: banded range + overlap joins are equi-joins — none of the theta shapes") {
    for ((name, df) <- Seq(
        "q97" -> Queries.q97BandedRangeJoin(spark, sfDir),
        "q98" -> Queries.q98BandedOverlapJoin(spark, sfDir))) {
      val plan = planOf(df)
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"$name degenerated into a theta join:\n$plan")
    }
  }

  test("NO query plans a single-partition window (sweep over the whole inventory)") {
    // the regression class PrefixSum exists to prevent: a Window with an
    // empty partition spec funnels the whole input through one task — fine
    // at sf0.001, fatal at 100 TB. Physical-node inspection, not string
    // matching: partitionSpec is checked on every WindowExec-family node.
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    // the sweep runs in a PRODUCTION-shaped session (extensions + catalog,
    // exactly graft.core.Sessions): the SQL/catalog queries (q156+)
    // require it, and it is the session the driver's Verify/Bench use —
    // the plans audited here are the plans that actually run
    val shared = spark // force-init the plain shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val prodLike = try SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.spark_catalog", "graft.sources.GraftCatalog")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(prodLike, sfDir).queryExecution.sparkPlan
      val bad = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w.nodeName
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w.nodeName
      }
      if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"single-partition windows found:\n${offenders.mkString("\n")}")
  }

  test("q110: curation pipeline — broadcast threshold join, keyed dedup window, no products") {
    val df = Queries.q110CurationPipeline(spark, sfDir)
    val plan = planOf(df)
    // the group-sized threshold table must broadcast onto the corpus —
    // a sort-merge join here would shuffle the whole corpus on lang
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    // the dedup window partitions on the text digest (never empty spec —
    // also enforced by the inventory-wide sweep, asserted here for locality)
    import org.apache.spark.sql.execution.window.WindowExec
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty), plan)
  }

  test("q99: substring dedup marks duplicates without any join — no pair expansion") {
    val plan = planOf(Queries.q99SubstringDedup(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"anchor marking degenerated into a product join:\n$plan")
    // default minDocFreq=2 folds the cross-doc mark into a hash-partitioned
    // window (min≠max): the md5 anchor scan — the dominant cost — must be
    // evaluated ONCE, so the plan has no join at all
    assert(!plan.contains("Join"),
      s"default-threshold marking must be the single-pass window, not a join:\n$plan")
  }

  test("q103: LM training + scoring are equi-joins with map-side partial counts") {
    val plan = planOf(Queries.q103LmScore(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"LM model/scoring join degenerated into a product join:\n$plan")
    // pair counting must combine map-side: a partial count before the
    // exchange on the bigram key (corpus-sized explode → model-sized shuffle)
    assert(plan.contains("partial_count") || plan.contains("partial count") ||
      plan.contains("Partial"), s"no map-side partial aggregation in:\n$plan")
  }

  test("q86: incremental dedup is equi-joins only (no product join against the corpus)") {
    val plan = planOf(Queries.q86IncrementalDedup(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"band/signature join degenerated into a product join:\n$plan")
  }

  test("q25/q42/q85: the dedup family never degenerates into a product join") {
    for ((name, df) <- Seq(
        "q25" -> Queries.q25NearDupPairs(spark, sfDir),
        "q42" -> Queries.q42SimhashPairs(spark, sfDir),
        "q85" -> Queries.q85SemanticDedup(spark, sfDir))) {
      val plan = planOf(df)
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$name degenerated into a product join:\n$plan")
    }
  }

  test("q85's pair pipeline: every LSH band carries its bucket-size cap window") {
    // the skew guard is a count window over the self-join's own __bucket
    // key — one per band (numBands=2 default); losing it re-opens the
    // O((N/2^planes)²) degenerate-bucket bomb at scale. Asserted on the
    // pair-generation pipeline (q85's final frame hides it: the ≤2M-edge
    // clusters() gate executes the pairs eagerly into a LocalTableScan).
    import org.apache.spark.sql.functions.col
    val pairs = graft.operators.Similarity.embeddingNearDuplicates(
      Tables.load(spark, sfDir, "embeddings"), threshold = 0.999, numPlanes = 4)
    val plan = planOf(pairs)
    assert(plan.split("\n").count(_.contains("windowspecdefinition(__bucket")) >= 2,
      s"expected a bucket-cap window per band:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"bucket self-join degenerated into a product join:\n$plan")
    // the exact kernel runs AFTER the cross-band distinct — each surviving
    // pair is scored exactly once
    assert(!plan.contains("cosine_similarity") ||
      plan.indexOf("cosine_similarity") < plan.indexOf("HashAggregate"),
      s"cosine kernel should sit above the candidate distinct:\n$plan")
  }

  test("q93: redaction is one scan — doc filter pushed down, no shuffle before the sort") {
    val df = Queries.q93PiiRedact(spark, sfDir)
    val scan = scanOf(df)
    assert(scan.contains("LessThan(doc_id,300)"), scan)
    assert(!scan.contains("n_chars") && !scan.contains("source"),
      s"redaction scans unneeded columns:\n$scan")
    val plan = df.queryExecution.executedPlan.toString()
    val exchanges = plan.split("\n").count(_.contains("Exchange"))
    assert(exchanges == 1, s"redaction should only exchange for the final sort:\n$plan")
  }

  test("q91/q92/q94/q95/q96/q112: recall + serving pipelines — no CartesianProduct") {
    for ((name, df) <- Seq(
        "q91" -> Queries.q91LshRecall(spark, sfDir),
        "q92" -> Queries.q92IvfRecall(spark, sfDir),
        "q94" -> Queries.q94IvfServe(spark, sfDir),
        "q95" -> Queries.q95PqServe(spark, sfDir),
        "q96" -> Queries.q96LshMultiband(spark, sfDir),
        "q112" -> Queries.q112IvfPqTopK(spark, sfDir))) {
      val plan = planOf(df)
      // BroadcastNestedLoopJoin appears by design (brute-force exact side +
      // broadcast centroid probing); what must never appear is an unplanned
      // CartesianProduct shuffling both sides
      assert(!plan.contains("CartesianProduct"),
        s"$name grew a product join:\n$plan")
    }
  }

  test("q87: PQ corpus scan prunes to id+vector; only the query side broadcasts") {
    val df = Queries.q87PqTopK(spark, sfDir)
    val scan = scanOf(df)
    assert(scan.contains("vec_id") && scan.contains("embedding"))
    assert(!scan.contains("label"), s"PQ scan reads unneeded columns:\n$scan")
    val plan = planOf(df)
    // the deliberate broadcast cross join of the (small) query side — the
    // corpus side must never be the broadcast/shuffle-heavy side
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q88: chunking is row-local — no shuffle before the output sort") {
    // executedPlan, not sparkPlan: EnsureRequirements places the Exchange
    // nodes during prepareForExecution, so sparkPlan would count zero and
    // the guard could never fail
    val plan = Queries.q88Chunking(spark, sfDir)
      .queryExecution.executedPlan.toString()
    val exchanges = plan.split("\n").count(_.contains("Exchange"))
    assert(exchanges == 1, s"chunking should only exchange for the final sort:\n$plan")
  }

  test("incremental rollup refresh: membership joins broadcast, never sort-merge") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("planroll").toString
    val (src, roll) = (s"$root/src", s"$root/roll")
    val aggs = Seq(count(lit(1)).alias("n"),
      sum($"x".cast("decimal(30,6)")).cast("double").alias("sum_x"))
    graft.sources.SnapshotManifest.commit(spark, src,
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "grp", "x"))
    graft.operators.IncrementalRollup.refresh(spark, src, roll, Seq("id"), Seq("grp"), aggs)
    graft.sources.SnapshotManifest.commit(spark, src,
      Seq((1L, "a", 1.0), (2L, "b", 3.0), (3L, "c", 4.0)).toDF("id", "grp", "x"))
    val plan = planOf(graft.operators.IncrementalRollup.incrementalMerge(
      spark, src, roll, Seq("id"),
      Seq("grp" -> org.apache.spark.sql.functions.col("grp")), aggs, 0L, 1L))
    // the churn-sized touched-key set is the broadcast side of BOTH
    // membership joins — the source and the rollup must never shuffle or
    // sort-merge just to learn which of their groups are stale
    assert(plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi")), plan)
    assert(plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti")), plan)
    // the only sort-merge allowed is changesBetween's FullOuter pk diff
    // (full-outer has no broadcast form; its inputs are churned files, not
    // the table) — membership must never fall back to it
    assert(!plan.linesIterator.exists(l => l.contains("SortMergeJoin") &&
      (l.contains("LeftSemi") || l.contains("LeftAnti"))), plan)
  }

  test("ANN frozen-centroid append is row-local: zero exchanges in the assignment plan") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val (_, cents) = graft.operators.Similarity.ivfAssignCells(emb, 8)
    val plan = planOf(graft.operators.Similarity.ivfAssignWith(emb, cents))
    assert(!plan.contains("Exchange"),
      s"frozen-centroid assignment should not shuffle:\n$plan")
  }

  test("with extensions: q10's row_number window rewrites to the topk aggregate") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val plan = Queries.q10WindowRank(ext, sfDir).queryExecution.sparkPlan.toString()
      assert(plan.contains("partial_topk"), plan)
      assert(!plan.contains("row_number"), plan)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
