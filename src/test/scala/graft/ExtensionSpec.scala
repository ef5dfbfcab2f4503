package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** BASELINE north-star extensions: dedup, similarity, text, multimodal. */
class ExtensionSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different content about spark engines and scale"),
    (4L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 1
    (5L, "")                                              // empty
  ).toDF("doc_id", "text")

  test("exact dedup groups identical canonical text, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text").orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == 2L) // docs 1 and 4 collapse, representative id 1
    assert(!byId.contains(4L))
    assert(byId(2L) == 1L && byId(3L) == 1L)
  }

  test("shingles: 3-word windows, distinct") {
    val sh = docs.filter($"doc_id" === 1L)
      .select(Dedup.shingles($"text").alias("s"))
      .head().getSeq[String](0)
    assert(sh.contains("the quick brown"))
    assert(sh.forall(_.split(" ").length == 3))
    assert(sh.length == 7) // 9 tokens → 7 windows, all distinct
  }

  test("minhash LSH finds the near-dup pair and not the distinct pair") {
    val pairs = Dedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 4L)))
    assert(pairs.contains((1L, 4L))) // exact dup always survives
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram jaccard: exact dup = 1.0, disjoint = 0") {
    val pairs = Seq((1L, 4L), (1L, 3L)).toDF("id_a", "id_b")
    val j = Dedup.ngramJaccard(pairs, docs, "doc_id", "text")
      .orderBy("id_b").collect()
    assert(j(0).getDouble(2) == 0.0) // (1,3)
    assert(j(1).getDouble(2) == 1.0) // (1,4)
  }

  test("simhash: identical text → identical fingerprint; hamming to near-dup is small") {
    val fp = docs.select($"doc_id", Dedup.simhash($"text").alias("f"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(4L))
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(2L)) < java.lang.Long.bitCount(fp(1L) ^ fp(3L)))
  }

  test("simhashNearDuplicates finds exact dup at distance 0") {
    val out = Dedup.simhashNearDuplicates(docs, "doc_id", "text", maxDistance = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 4L)))
  }

  test("simhashNearDuplicates maxBlockSize drops degenerate blocks (skew guard)") {
    // worst case: every document identical → one block holds the whole
    // corpus and the within-block self-join would be O(n²)
    val degenerate = (1L to 60L).map(i => (i, "all documents share this exact text"))
      .toDF("doc_id", "text")
    val capped = Dedup.simhashNearDuplicates(degenerate, "doc_id", "text",
      maxDistance = 0, maxBlockSize = 10)
    assert(capped.isEmpty) // the oversized block is dropped, not exploded
    // under the cap the result is the full pair set, unchanged by the guard
    val under = Dedup.simhashNearDuplicates(degenerate, "doc_id", "text",
      maxDistance = 0, maxBlockSize = 60)
    assert(under.count() == 60L * 59 / 2)
  }

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosine: orthogonal → 0, identical → 1") {
    val c = vecs.filter($"vec_id" === 1L).crossJoin(
      vecs.filter($"vec_id" === 3L).select($"embedding".alias("e2")))
      .select(Similarity.cosine($"embedding", $"e2").alias("c"))
    assert(math.abs(c.head().getDouble(0)) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine desc with deterministic tie-break") {
    val q = vecs.filter($"vec_id" === 1L).select($"vec_id".alias("query_id"), $"embedding")
    val out = Similarity.bruteForceTopK(q, vecs, k = 3)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSeq
    assert(out.map(_._1) == Seq(4L, 2L, 3L)) // exact dup first, near second
  }

  test("lshTopK recall: exact duplicates always share a bucket") {
    val q = vecs.filter($"vec_id" === 1L).select($"vec_id".alias("query_id"), $"embedding")
    val out = Similarity.lshTopK(q, vecs, k = 3, numPlanes = 4)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out.contains(4L))
  }

  test("lshTopK maxBucketSize drops a degenerate corpus bucket (skew guard)") {
    // all-identical corpus → ONE bucket holds everything; the per-query
    // candidate set would be the whole corpus
    val degenerate = (1L to 40L).map(i => (i, Array(1.0f, 0.5f, 0.25f)))
      .toDF("vec_id", "embedding")
    val q = degenerate.limit(1).select($"vec_id".alias("query_id"), $"embedding")
    val capped = Similarity.lshTopK(q, degenerate, k = 3, numPlanes = 2,
      maxBucketSize = 10)
    assert(capped.isEmpty) // oversized bucket dropped, not exploded
    // under the cap the guard changes nothing
    val under = Similarity.lshTopK(q, degenerate, k = 3, numPlanes = 2,
      maxBucketSize = 40).count()
    assert(under == 3)
  }

  test("ivfTopK: exact duplicate lands in the same cell and is recalled at rank 1") {
    val q = vecs.filter($"vec_id" === 1L).select($"vec_id".alias("query_id"), $"embedding")
    val out = Similarity.ivfTopK(q, vecs, k = 2, cells = 2, nprobe = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(out.keySet.contains(4L))
    assert(out(4L) == 1)
  }

  test("ANN serving paths: materialized IVF index / PQ code table round-trip parquet and match the inline result") {
    val dir = java.nio.file.Files.createTempDirectory("ann_idx").toString
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter($"vec_id" < 5).select($"vec_id".alias("query_id"), $"embedding")
    // IVF: index built once, persisted, reloaded, served — identical to inline
    val inlineIvf = Similarity.ivfTopK(q, emb, k = 3, cells = 8, nprobe = 3, refineIters = 1)
      .collect().map(_.toSeq).toSet
    val (assigned, centroids) = Similarity.ivfAssignCells(emb, 8, refineIters = 1)
    assigned.write.parquet(s"$dir/assigned")
    centroids.write.parquet(s"$dir/centroids")
    val servedIvf = Similarity.ivfTopKFromIndex(q,
      spark.read.parquet(s"$dir/assigned"), spark.read.parquet(s"$dir/centroids"),
      k = 3, nprobe = 3).collect().map(_.toSeq).toSet
    assert(servedIvf == inlineIvf && servedIvf.nonEmpty)
    // PQ: code table persisted, codebook re-derived (deterministic) — identical
    val inlinePq = Similarity.pqTopK(q, emb, k = 3, refineIters = 1)
      .collect().map(_.toSeq).toSet
    val cb = Similarity.pqCodebook(emb, m = 8, k = 16, refineIters = 1)
    Similarity.pqEncodeCorpus(emb, cb).write.parquet(s"$dir/codes")
    val servedPq = Similarity.pqTopKFromCodes(q,
      spark.read.parquet(s"$dir/codes"), cb, k = 3).collect().map(_.toSeq).toSet
    assert(servedPq == inlinePq && servedPq.nonEmpty)
  }

  test("ivfCellStats: integer witnesses partition the corpus; cohesion matches brute force within tolerance") {
    val emb = Tables.load(spark, sfDir, "embeddings").filter($"vec_id" < 200)
    val (assigned, centroids) = Similarity.ivfAssignCells(emb, 4, refineIters = 1)
    val stats = Similarity.ivfCellStats(assigned, centroids).collect()
    // the integer witnesses (the q115 differential gate) are a partition of
    // the assigned corpus: counts and id-sums reconcile exactly
    val (n, idSum) = assigned.agg(count(lit(1)), sum($"vec_id")).as[(Long, Long)].head()
    assert(stats.map(_.getAs[Long]("n_vectors")).sum == n)
    assert(stats.map(_.getAs[Long]("sum_vec_id")).sum == idSum)
    // cohesion (float, monitoring-only — NEVER hashed): mean_cos must agree
    // with a per-cell brute-force recomputation within tolerance, and sit in
    // (0,1] for Lloyd-refined cells over a real corpus
    val brute = assigned
      .join(broadcast(centroids.select($"cell_id", $"__centroid")), Seq("cell_id"))
      .groupBy($"cell_id")
      .agg(avg(Similarity.cosine($"embedding", $"__centroid")).alias("m"))
      .as[(Int, Double)].collect().toMap
    stats.foreach { r =>
      val m = r.getAs[Double]("mean_cos")
      assert(m > 0.0 && m <= 1.0, s"cohesion out of range: $r")
      assert(math.abs(m - brute(r.getAs[Int]("cell_id"))) < 1e-6,
        s"cohesion drifted from brute force: $r")
    }
  }

  test("recall floors: the ANN paths must find planted near-neighbor structure") {
    // q90/q91/q92 gate DETERMINISM of the recall computation (a hash match
    // replays bit-for-bit) — but a deterministic recall of 0 would still
    // hash-match; these floors pin the approximation QUALITY itself. The
    // raw fixture cannot carry an absolute floor: its embeddings are
    // unstructured noise (same-label and cross-label mean cosine are both
    // ~0; the true top-3 sits at cosine ~0.35), and no sublinear ANN
    // recalls noise-level neighbors — so the floor corpus PLANTS the
    // structure ANN exists to find: three deterministic near-duplicates
    // (cosine ≈ 0.999) of every query vector. An operator regression that
    // breaks bucketing/probing/ADC breaks planted recall with it.
    val emb = Tables.load(spark, sfDir, "embeddings").select($"vec_id", $"embedding")
    val q = emb.filter($"vec_id" < 10).select($"vec_id".alias("query_id"), $"embedding")
    val planted = (0 until 3).map { copy =>
      emb.filter($"vec_id" < 10).select(
        (lit(10000) + $"vec_id" * 3 + lit(copy)).alias("vec_id"),
        transform($"embedding",
          (x, i) => when(i === ($"vec_id" + copy) % 64, x * 1.3f).otherwise(x))
          .cast("array<float>").alias("embedding"))
    }
    val corpus = (emb +: planted).reduce(_ unionByName _)
    val exact = Similarity.bruteForceTopK(q, corpus, k = 3)
    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(approx, exact, k = 3)
        .agg(avg($"recall")).head().getDouble(0)
    val measured = Seq(
      ("pq", meanRecall(Similarity.pqTopK(q, corpus, k = 3, refineIters = 4)), 0.8),
      ("ivf", meanRecall(Similarity.ivfTopK(q, corpus, k = 3,
        cells = 16, nprobe = 4, refineIters = 4)), 0.8),
      ("lsh", meanRecall(Similarity.lshTopK(q, corpus, k = 3,
        numPlanes = 6, bands = 4)), 0.8),
      ("ivfpq", meanRecall(Similarity.ivfPqTopK(q, corpus, k = 3,
        cells = 16, nprobe = 4, refineIters = 4)), 0.8))
    val failing = measured.filter { case (_, v, floor) => v < floor }
    assert(failing.isEmpty, s"mean planted recall@3 below floor: $measured")
  }

  test("multi-band lshTopK: candidate union over bands, each pair ranked once") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter($"vec_id" < 10).select($"vec_id".alias("query_id"), $"embedding")
    val single = Similarity.lshTopK(q, emb, k = 3, numPlanes = 6, bands = 1)
    val multi = Similarity.lshTopK(q, emb, k = 3, numPlanes = 6, bands = 4)
    // amplification can only widen the candidate set
    assert(multi.count() >= single.count())
    // a pair found by several bands must still occupy exactly one rank
    val dup = multi.groupBy($"query_id", $"neighbor_id").count().filter($"count" > 1)
    assert(dup.isEmpty)
    // ranks stay dense 1..n per query
    val ranks = multi.groupBy($"query_id")
      .agg(collect_list($"rank").alias("r")).select($"r").as[Seq[Int]].collect()
    assert(ranks.forall(r => r.sorted == (1 to r.length)))
  }

  test("embeddingNearDuplicates finds the exact-dup vector pair") {
    val out = Similarity.embeddingNearDuplicates(vecs, threshold = 0.999, numPlanes = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 4L)))
    assert(!out.contains((1L, 3L)))
  }

  test("PII redaction: typed tags, counts match removals, null-safe") {
    val r = Seq(
      "mail a.b+c@x-corp.io and b@y.org, call +49 (30) 1234-5678, host 192.168.0.255 end",
      "no pii here at all",
      null
    ).toDF("text").select(
      TextAnalysis.redactPii($"text").alias("clean"),
      TextAnalysis.piiCounts($"text").alias("c")).collect()
    assert(r(0).getString(0) ==
      "mail <EMAIL> and <EMAIL>, call <PHONE>, host <IP> end")
    assert(r(0).getStruct(1).toSeq == Seq(2, 1, 1, 0)) // email, ipv4, intl, paren
    assert(r(1).getString(0) == "no pii here at all")
    assert(r(1).getStruct(1).toSeq == Seq(0, 0, 0, 0))
    assert(r(2).isNullAt(0))
    // precision-first: dates, large integers, numeric rows, and non-IPv4
    // dotted numbers must SURVIVE the scrub untouched
    val safe = Seq(
      "released 2024-01-01 00:00:00 build 12345678",
      "rows: 10 20 30 40 50 60",
      "x 256.1.1.1 y",
      "a (202) 555-0147 b" // paren area code IS a phone
    ).toDF("text").select(TextAnalysis.redactPii($"text")).as[String].collect()
    assert(safe(0) == "released 2024-01-01 00:00:00 build 12345678")
    assert(safe(1) == "rows: 10 20 30 40 50 60")
    assert(safe(2) == "x 256.1.1.1 y")
    assert(safe(3) == "a <PHONE> b")
  }

  test("text analysis: token counts, ratios, language id") {
    val r = Seq("The cat and the dog, in a hat!").toDF("text").select(
      TextAnalysis.tokenCountWhitespace($"text").alias("ws"),
      TextAnalysis.tokenCountBpe($"text").alias("bpe"),
      TextAnalysis.punctRatio($"text").alias("pr"),
      TextAnalysis.langId($"text").alias("lang")).head()
    assert(r.getInt(0) == 8)
    assert(r.getInt(1) == 10) // 8 words + ',' + '!'
    assert(r.getDouble(2) > 0 && r.getDouble(2) < 0.1)
    assert(r.getString(3) == "en")
  }

  test("language id: de text → de; gibberish → und") {
    val r = Seq("der hund ist nicht ein katze und das haus", "zzz qqq xxx")
      .toDF("text").select(TextAnalysis.langId($"text").alias("l"))
      .as[String].collect().toSeq
    assert(r == Seq("de", "und"))
  }

  test("rolling fingerprint: deterministic, order-sensitive") {
    val fps = Seq("a b c", "a b c", "c b a").toDF("text")
      .select(TextAnalysis.rollingFingerprint($"text").alias("f"))
      .as[Long].collect().toSeq
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("hash sampling is content-keyed: invariant under repartitioning") {
    val df = spark.read.parquet(s"$sfDir/customer.parquet")
    val picked = graft.operators.Sampling
      .hashSample(df, Seq($"c_custkey"), 0.3).select($"c_custkey").as[Long].collect().sorted
    val repicked = graft.operators.Sampling
      .hashSample(df.repartition(13), Seq($"c_custkey"), 0.3)
      .select($"c_custkey").as[Long].collect().sorted
    assert(picked.sameElements(repicked) && picked.nonEmpty && picked.length < df.count())
  }

  test("toShards: layout-invariant assignment, partitionBy writes one dir per shard") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = graft.operators.Sampling.toShards(df, Seq($"doc_id"), 8)
      .select($"doc_id", $"shard").as[(Long, Long)].collect().sorted
    val b = graft.operators.Sampling.toShards(df.repartition(13), Seq($"doc_id"), 8)
      .select($"doc_id", $"shard").as[(Long, Long)].collect().sorted
    assert(a.sameElements(b), "shard assignment must not depend on input layout")
    assert(a.map(_._2).distinct.length == 8, "every shard populated on this fixture")
    // the export shape: partitionBy(shard) → one shard=K dir per shard,
    // and reading back reproduces the exact assignment
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString + "/out"
    graft.operators.Sampling.toShards(df, Seq($"doc_id"), 8)
      .write.partitionBy("shard").parquet(dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.toSeq == (0 until 8).map(i => s"shard=$i"))
    val back = spark.read.parquet(dir).select($"doc_id", $"shard".cast("long"))
      .as[(Long, Long)].collect().sorted
    assert(back.sameElements(a))
  }

  test("stratified sampling: missing stratum takes default rate 0") {
    val df = Seq((1L, "en"), (2L, "xx"), (3L, "en"), (4L, "xx")).toDF("id", "lang")
    val out = graft.operators.Sampling
      .stratified(df, "lang", Map("en" -> 1.0), Seq($"id"))
      .select($"lang").as[String].collect()
    assert(out.forall(_ == "en") && out.length == 2)
  }

  test("int8 quantization: codes within [-127,127], dequantize error ≤ half a step") {
    val vecs = Seq((1L, Array(0.5f, -1.0f, 0.25f)), (2L, Array(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8($"embedding")
    val rows = vecs.select($"vec_id", q.getField("scale").alias("s"),
      q.getField("codes").alias("c"), Similarity.dequantizeInt8(q).alias("d"))
      .collect()
    val r1 = rows.find(_.getLong(0) == 1L).get
    val scale = r1.getDouble(1)
    val codes = r1.getSeq[Byte](2)
    val deq = r1.getSeq[Double](3)
    assert(codes.forall(c => c >= -127 && c <= 127) && codes.contains(-127.toByte))
    val orig = Seq(0.5, -1.0, 0.25)
    assert(deq.zip(orig).forall { case (d, o) => math.abs(d - o) <= 0.5 / scale + 1e-12 })
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert(r2.getDouble(1) == 0.0 && r2.getSeq[Byte](2).forall(_ == 0) &&
      r2.getSeq[Double](3).forall(_ == 0.0))
    // the codes column is physically 1-byte (the operator's storage claim)
    val codesType = vecs.select(q.getField("codes")).schema.head.dataType
    assert(codesType == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.ByteType, containsNull = false) ||
      codesType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType ==
        org.apache.spark.sql.types.ByteType)
  }

  test("containment: embedded probe scores ~1 in its source, maxDocFreq only lowers") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "totally unrelated words in this other document right here")
    ).toDF("doc_id", "text")
    val probes = Seq((10L, "beta gamma delta epsilon zeta")).toDF("probe_id", "text")
    val out = Dedup.containment(corpus, probes, "doc_id", "probe_id", "text",
      minContainment = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 1 && out.head._1 == 10L && out.head._2 == 1L && out.head._3 == 1.0)
    val capped = Dedup.containment(corpus, probes, "doc_id", "probe_id", "text",
      minContainment = 0.0, maxDocFreq = Some(0)) // every shingle dropped
    assert(capped.isEmpty)
  }

  test("containment with bloom prefilter is exact (identical to the unfiltered result)") {
    val corpus = docs.filter(length($"text") > 0)
    val probes = docs.filter($"doc_id" < 10 && length($"text") > 0)
      .select($"doc_id".as("probe_id"), $"text")
    val plain = Dedup.containment(corpus, probes, "doc_id", "probe_id", "text",
      minContainment = 0.3).as[(Long, Long, Double)].collect().toSet
    val bloomed = Dedup.containment(corpus, probes, "doc_id", "probe_id", "text",
      minContainment = 0.3,
      bloomPrefilter = Some(Dedup.BloomConfig(expectedItems = 10000L, fpp = 0.01)))
      .as[(Long, Long, Double)].collect().toSet
    assert(plain.nonEmpty && bloomed == plain)
    // composes with the doc-freq cap (bloom runs first; df counts of
    // surviving shingles are unchanged, so results stay identical)
    val cappedPlain = Dedup.containment(corpus, probes, "doc_id", "probe_id", "text",
      minContainment = 0.1, maxDocFreq = Some(3)).as[(Long, Long, Double)].collect().toSet
    val cappedBloom = Dedup.containment(corpus, probes, "doc_id", "probe_id", "text",
      minContainment = 0.1, maxDocFreq = Some(3),
      bloomPrefilter = Some(Dedup.BloomConfig(expectedItems = 10000L, fpp = 0.01)))
      .as[(Long, Long, Double)].collect().toSet
    assert(cappedBloom == cappedPlain)
  }

  test("embeddingNearDuplicates maxBucketSize drops degenerate buckets (skew guard)") {
    // worst case: every embedding identical → each band's bucketing puts the
    // whole corpus in ONE bucket and the self-join would be O(n²)
    val degenerate = (1L to 50L).map(i => (i, Array(1.0f, 0.5f, 0.25f)))
      .toDF("vec_id", "embedding")
    val capped = Similarity.embeddingNearDuplicates(degenerate, threshold = 0.999,
      numPlanes = 2, numBands = 2, maxBucketSize = 10)
    assert(capped.isEmpty) // oversized buckets dropped in every band, not exploded
    // under the cap the guard changes nothing: full pair set, each pair once
    val under = Similarity.embeddingNearDuplicates(degenerate, threshold = 0.999,
      numPlanes = 2, numBands = 2, maxBucketSize = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(under.length == 50 * 49 / 2)
    assert(under.distinct.length == under.length) // banding dedups candidates
  }

  test("embeddingNearDuplicates banding: extra bands only add candidates") {
    val oneBand = Similarity.embeddingNearDuplicates(vecs, threshold = 0.9,
      numPlanes = 3, numBands = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val threeBands = Similarity.embeddingNearDuplicates(vecs, threshold = 0.9,
      numPlanes = 3, numBands = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // band 0 is the same plane set in both runs, so the union over bands is
    // a superset — banding recovers pairs a single unlucky split would lose
    assert(oneBand.subsetOf(threeBands))
    assert(threeBands.contains((1L, 4L)))
  }

  test("semanticDedup keepBy elects the highest-quality member, ties to min id") {
    // cluster {1, 4, 5}: identical embeddings (always co-bucketed in every
    // band). Quality 4 > 1; member 5 has NULL quality and must never beat a
    // scored member. 2 and 3 are singletons at this threshold.
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), Some(0.5)),
      (2L, Array(0.9f, 0.1f, 0.0f), Option.empty[Double]),
      (3L, Array(0.0f, 1.0f, 0.0f), Option.empty[Double]),
      (4L, Array(1.0f, 0.0f, 0.0f), Some(0.9)),
      (5L, Array(1.0f, 0.0f, 0.0f), Option.empty[Double])
    ).toDF("vec_id", "embedding", "quality")
    val out = Similarity.semanticDedup(corpus, threshold = 0.999, numPlanes = 2,
      keepBy = Some($"quality"))
      .orderBy("vec_id").as[(Long, Long, Boolean)].collect()
    val byId = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(4L) == ((1L, true)))  // highest quality in {1,4,5} wins
    assert(byId(1L) == ((1L, false)) && byId(5L) == ((1L, false)))
    assert(byId(2L)._2 && byId(3L)._2) // singletons kept, null quality or not
    // tie case: equal quality everywhere → smaller id deterministically wins
    val tied = Similarity.semanticDedup(
      corpus.withColumn("quality", lit(1.0)), threshold = 0.999, numPlanes = 2,
      keepBy = Some($"quality"))
      .as[(Long, Long, Boolean)].collect()
    val tiedKept = tied.filter(_._3).map(_._1).toSet
    assert(tiedKept == Set(1L, 2L, 3L))
  }

  test("semanticDedup keeps the min-id representative per embedding cluster") {
    val out = Similarity.semanticDedup(vecs, threshold = 0.999, numPlanes = 2)
      .orderBy("vec_id").as[(Long, Long, Boolean)].collect()
    assert(out.length == 4)
    val byId = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L) == ((1L, true)))  // representative of {1, 4}
    assert(byId(4L) == ((1L, false))) // clustered with 1, dropped
    assert(byId(2L) == ((2L, true)) && byId(3L) == ((3L, true))) // singletons
  }

  test("incrementalNearDuplicates matches a new batch against the signature index only") {
    val index = Dedup.signatureIndex(docs, "doc_id", "text")
    val newBatch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"), // dup of 1 and 4
      (102L, "entirely unrelated text about something else entirely different")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalNearDuplicates(newBatch, index, "doc_id", "text",
      threshold = 0.5).select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(out.contains((101L, 1L)) && out.contains((101L, 4L)))
    assert(!out.exists(_._1 == 102L))
    // degenerate index bands above the cap are dropped, bounding the join
    val boiler = (1L to 40L).map(i => (i, "same boilerplate text every single time"))
      .toDF("doc_id", "text")
    val capped = Dedup.incrementalNearDuplicates(
      newBatch, Dedup.signatureIndex(boiler, "doc_id", "text"), "doc_id", "text",
      threshold = 0.0, maxBucketSize = 10)
    assert(capped.isEmpty)
    // an index built with a different numHashes fails loudly at execution.
    // Too short: ANSI element_at throws in banding. Too long: bands still
    // collide on the shared prefix, and without the explicit guard the
    // null estimate would silently drop every candidate — the raise_error
    // in the verification step covers that case.
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    val shortErr = intercept[Exception] {
      Dedup.incrementalNearDuplicates(newBatch,
        Dedup.signatureIndex(docs, "doc_id", "text", numHashes = 6),
        "doc_id", "text", threshold = 0.0).collect()
    }
    assert(messages(shortErr).exists(_.contains("INVALID_ARRAY_INDEX")), shortErr.toString)
    val longErr = intercept[Exception] {
      Dedup.incrementalNearDuplicates(newBatch,
        Dedup.signatureIndex(docs, "doc_id", "text", numHashes = 24),
        "doc_id", "text", threshold = 0.0).collect()
    }
    assert(messages(longErr).exists(_.contains("signature length")), longErr.toString)
  }

  test("pqTopK: exact-duplicate vector is the rank-1 hit (ADC global minimum)") {
    val q = vecs.filter($"vec_id" === 1L)
      .select($"vec_id".alias("query_id"), $"embedding")
    val out = Similarity.pqTopK(q, vecs, k = 1, m = 3, numCentroids = 4).collect()
    // doc 4 shares doc 1's vector → identical codes → its ADC score is the
    // per-subspace minimum sum, the global minimum
    assert(out.length == 1 && out.head.getLong(1) == 4L && out.head.getInt(2) == 1)
  }

  test("pqRerankTopK with a full-corpus shortlist equals exact brute force") {
    val q = vecs.filter($"vec_id" <= 2L)
      .select($"vec_id".alias("query_id"), $"embedding")
    val rerank = Similarity.pqRerankTopK(q, vecs, k = 2, candidates = 3,
      m = 3, numCentroids = 4)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    val brute = Similarity.bruteForceTopK(q, vecs, k = 2)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    assert(rerank.toSeq == brute.toSeq)
  }

  test("PQ encode: identical vectors → identical codes; mismatched dim → null") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val cb = Similarity.pqCodebook(vecs, m = 3, k = 4)
    assert(cb.length == 3 && cb(0).length == 4 && cb(0)(0).length == 1)
    def enc(v: org.apache.spark.sql.Column) =
      ColumnBridge.column(graft.functions.expressions.PqEncode(ColumnBridge.expression(v), cb))
    val codes = vecs.select($"vec_id", enc($"embedding").alias("c"))
      .as[(Long, Seq[Byte])].collect().toMap
    assert(codes(1L) == codes(4L))
    assert(codes.values.forall(c => c.length == 3 && c.forall(j => j >= 0 && j < 4)))
    val bad = Seq((9L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
      .select(enc($"embedding").alias("c")).head()
    assert(bad.isNullAt(0))
  }

  test("streaming ingest + incremental dedup against a persisted index (foreachBatch)") {
    // the continuous-ingest loop the operator documents: the corpus index is
    // a materialized parquet artifact; each streaming micro-batch of new
    // documents dedups against it without touching corpus text
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("inc_dedup").toString
    try {
      Dedup.signatureIndex(docs, "doc_id", "text").write.parquet(s"$dir/index")
      val index = spark.read.parquet(s"$dir/index")
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      mem.addData((101L, "the quick brown fox jumps over the lazy dog"),
        (102L, "entirely unrelated text about something else entirely different"))
      val found = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      val q = mem.toDF().toDF("doc_id", "text").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          found ++= Dedup.incrementalNearDuplicates(batch, index, "doc_id", "text",
            threshold = 0.5)
            .select("new_id", "corpus_id").as[(Long, Long)].collect()
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // the exact duplicates (1, 4) and the one-token near-dup (2) match;
      // the unrelated batch doc 102 matches nothing
      assert(found.toSet == Set((101L, 1L), (101L, 2L), (101L, 4L)))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("signature jaccard estimate tracks exact jaccard on near/exact/disjoint pairs") {
    val withSig = docs.filter(length($"text") > 0)
      .select($"doc_id", Dedup.minhashSignature($"text", 12).alias("sig"),
        Dedup.shingles($"text").alias("sh"))
    val pairs = withSig.alias("a").crossJoin(withSig.alias("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id"), col("b.doc_id"),
        Dedup.jaccardEstimateFromSignatures(col("a.sig"), col("b.sig")).alias("est"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).alias("exact"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    val (estDup, exactDup) = pairs((1L, 4L))     // exact duplicates
    assert(estDup == 1.0 && exactDup == 1.0)
    val (estDisj, exactDisj) = pairs((1L, 3L))   // disjoint content
    assert(estDisj <= 0.25 && exactDisj == 0.0)  // k=12: estimator noise bounded
    val (estNear, exactNear) = pairs((1L, 2L))   // near-dup: one word differs
    assert(math.abs(estNear - exactNear) <= 0.35, s"est $estNear vs exact $exactNear")
    // contract: size mismatch / null → null
    val bad = spark.sql("SELECT 1").select(
      Dedup.jaccardEstimateFromSignatures(
        array(lit(1L), lit(2L)), array(lit(1L))).alias("x"))
    assert(bad.head().isNullAt(0))
  }

  test("chunk: window/overlap arithmetic, truncated tail, short docs, empty docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens: full windows
      (2L, "one two three"),                          // shorter than a chunk
      (3L, ""),                                       // no tokens → no chunks
      (4L, (1 to 11).map(i => s"t$i").mkString(" "))  // 11 tokens: 2-token tail
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, "doc_id", "text", chunkTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, String)].collect()
    // doc 1: stride 3, ceil((10-4)/3)+1 = 3 chunks, all full windows
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(d1.head._4 == "t1 t2 t3 t4")
    assert(d1(1)._4 == "t4 t5 t6 t7")   // overlap of 1 token
    assert(d1(2)._4 == "t7 t8 t9 t10")
    assert(d1.forall(_._3 == 4L))
    val d2 = out.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._4 == "one two three" && d2.head._3 == 3L)
    assert(!out.exists(_._1 == 3L))
    // doc 4: ceil((11-4)/3)+1 = 4 chunks; the final slice truncates to the
    // 2-token remainder, not an empty or padded window
    val d4 = out.filter(_._1 == 4L)
    assert(d4.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(d4(3)._4 == "t10 t11" && d4(3)._3 == 2L)
  }

  test("bigramModel: pair counts, full-mass prefix denominator, minCount prune") {
    val docs = Seq(
      (1L, "the cat sat"),        // the>cat, cat>sat
      (2L, "the cat ran"),        // the>cat, cat>ran
      (3L, "THE  cat   sat"),     // canonicalization: same as doc 1
      (4L, "solo")                // <2 tokens: contributes nothing
    ).toDF("doc_id", "text")
    val m = TextAnalysis.bigramModel(docs, "text", minCount = 2)
      .select($"w1", $"bg", $"c12", $"c1").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).sorted
    val S = TextAnalysis.BigramSep
    // cat>ran (count 1) is pruned, but cat's prefix mass stays 3: the
    // denominator keeps the full distribution after pruning
    assert(m.toSeq == Seq((s"cat${S}sat", 2L, 3L), (s"the${S}cat", 3L, 3L)))
  }

  test("lmScore: known/unknown accounting and the perplexity signal") {
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the cat ran"),
      (3L, "the cat sat"),
      (4L, "dog dog")             // all pairs unknown to the pruned model
    ).toDF("doc_id", "text")
    val model = TextAnalysis.bigramModel(docs, "text", minCount = 2)
    val out = TextAnalysis.lmScore(docs, "doc_id", "text", model)
      .orderBy($"doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // corpus counts: the>cat=3 (c1 the=3), cat>sat=2, cat>ran=1 (c1 cat=3),
    // dog>dog=1 (c1 dog=1); minCount=2 keeps the>cat and cat>sat only.
    // doc 1: both pairs known → logprob = avg(ln(3/3), ln(2/3)) < 0
    assert(byId(1L).getLong(1) == 2 && byId(1L).getLong(2) == 2)
    assert(byId(1L).getLong(3) == 5 && byId(1L).getLong(4) == 6)
    val lp = byId(1L).getDouble(5)
    assert(math.abs(lp - (math.log(3.0 / 3) + math.log(2.0 / 3)) / 2) < 1e-12)
    // doc 2: cat>ran was pruned → 1 known of 2, mass sums count known only
    assert(byId(2L).getLong(1) == 2 && byId(2L).getLong(2) == 1)
    assert(byId(2L).getLong(3) == 3 && byId(2L).getLong(4) == 3)
    // doc 4: nothing known → null masses, null logprob
    assert(byId(4L).getLong(2) == 0 && byId(4L).isNullAt(3) && byId(4L).isNullAt(5))
  }

  test("repetition profile: counts and ratios on a hand-checked doc") {
    val df = Seq((1L, "a a a b"), (2L, "x y z w")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionProfile(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((4L, 2L, 0.5, 0.75)))
    assert(out(2L) == ((4L, 4L, 0.0, 0.25)))
  }

  test("multimodal: resize keeps one row per asset with requested dims") {
    val assets = Multimodal.toAssets(docs, "doc_id", "text")
    val out = Multimodal.resize(assets, 224, 224).collect()
    assert(out.length == 5)
    assert(out.forall(r => r.getAs[Int]("width") == 224 && r.getAs[Int]("height") == 224))
    // deterministic: exact dup docs produce identical resized bytes
    val byId = out.map(r => r.getAs[Long]("asset_id") -> r.getAs[Array[Byte]]("bytes")).toMap
    assert(java.util.Arrays.equals(byId(1L), byId(4L)))
  }

  test("multimodal: frame sampling emits strided frames, empty payload → none") {
    val assets = Multimodal.toAssets(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(assets, everyNth = 2, maxFrames = 4)
    val byAsset = frames.groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!byAsset.contains(5L)) // empty doc → no frames
    assert(byAsset(1L) >= 1 && byAsset(1L) <= 4)
    val idx = frames.filter($"asset_id" === 1L)
      .select("frame_index").as[Int].collect().sorted.toSeq
    assert(idx == idx.indices.map(_ * 2)) // stride honored
  }

  test("native cosine rejects non-array inputs at analysis time") {
    val bad = Seq((1, 2)).toDF("a", "b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(Similarity.cosine($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("cosine_similarity expects two non-decimal numeric arrays"))
  }

  test("multimodal: asset layout + stubbed feature extraction batch shape") {
    val assets = Multimodal.toAssets(docs, "doc_id", "text", "text/plain")
    assert(assets.columns.toSeq == Seq("asset_id", "media_type", "bytes", "byte_len"))
    val feats = Multimodal.extractFeatures(assets).orderBy("asset_id").collect()
    assert(feats.length == 5)
    val f1 = feats(0)
    assert(f1.getAs[Long]("byte_len") == 43L)
    assert(f1.getAs[Int]("channels") == 3)
    // deterministic: same bytes → same checksum as doc 4
    assert(f1.getAs[String]("checksum") == feats(3).getAs[String]("checksum"))
  }

  test("multimodal: REAL image codec — PNG fixtures decode to true dims, resize re-encodes at target size, non-images fall back") {
    def png(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var x = 0
      while (x < w) {
        var y = 0
        while (y < h) { img.setRGB(x, y, seed ^ (x * 31 + y * 7)); y += 1 }
        x += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val rows = Seq(
      (1L, "image/png", png(64, 48, 0xff0000)),
      (2L, "image/png", png(31, 97, 0x00ff00)),
      (3L, "text/plain", "definitely not an image".getBytes("UTF-8")))
    val assets = rows.toDF("asset_id", "media_type", "bytes")
      .withColumn("byte_len", length(col("bytes")).cast("long"))
    // feature pass: TRUE header dimensions for the images (no stub shapes)
    val feats = Multimodal.extractFeatures(assets).orderBy("asset_id").collect()
    assert(feats(0).getAs[Int]("width") == 64 && feats(0).getAs[Int]("height") == 48)
    assert(feats(0).getAs[Int]("channels") == 3)
    assert(feats(1).getAs[Int]("width") == 31 && feats(1).getAs[Int]("height") == 97)
    // resize: the output BYTES decode back to exactly the target raster
    val out = Multimodal.resize(assets, 24, 16).collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getAs[Array[Byte]]("bytes")).toMap
    Seq(1L, 2L).foreach { id =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(out(id)))
      assert(img != null && img.getWidth == 24 && img.getHeight == 16,
        s"asset $id must re-decode at the target dimensions")
    }
    // deterministic for identical input, content-sensitive across inputs
    val again = Multimodal.resize(assets, 24, 16).collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getAs[Array[Byte]]("bytes")).toMap
    assert(java.util.Arrays.equals(out(1L), again(1L)))
    assert(!java.util.Arrays.equals(out(1L), out(2L)))
    // the non-image payload flows through the declared stub fallback —
    // same plumbing, no failure, deterministic bytes
    assert(out(3L).nonEmpty && java.util.Arrays.equals(out(3L), again(3L)))
    // alpha survives the resize: a transparent source must not come back
    // flattened onto an opaque background
    val argb = {
      val img = new java.awt.image.BufferedImage(
        40, 40, java.awt.image.BufferedImage.TYPE_INT_ARGB)
      (0 until 40).foreach(x => (0 until 40).foreach { y =>
        img.setRGB(x, y, if (x < 20) 0x00000000 else 0xffff0000)
      })
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val alphaOut = Multimodal.resize(
      Seq((9L, "image/png", argb)).toDF("asset_id", "media_type", "bytes")
        .withColumn("byte_len", length(col("bytes")).cast("long")),
      20, 20).collect().head.getAs[Array[Byte]]("bytes")
    val decoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(alphaOut))
    assert(decoded.getColorModel.hasAlpha)
    assert((decoded.getRGB(2, 10) >>> 24) < 32,
      "the transparent half must stay transparent after resize")
    assert((decoded.getRGB(17, 10) >>> 24) > 224,
      "the opaque half must stay opaque after resize")
  }

  test("multimodal: REAL frame sampling — animated GIF fixtures decode per-frame, stride and cap honored, non-media falls back") {
    // generated animated-GIF fixture: nFrames solid-color frames, color a
    // deterministic function of (seed, frame) so each sampled frame is
    // checkable back to its SOURCE index after the PNG re-encode
    def gif(w: Int, h: Int, nFrames: Int, seed: Int): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val baos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until nFrames).foreach { f =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val color = (seed ^ (f * 0x202020)) & 0xffffff
        (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, color)))
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
      ios.close()
      writer.dispose()
      baos.toByteArray
    }
    val assets = Seq(
      (1L, "image/gif", gif(12, 8, 7, 0x4080c0)),   // 7 frames
      (2L, "image/gif", gif(6, 6, 2, 0x102030)),    // 2 frames
      (3L, "text/plain", "not a gif at all".getBytes("UTF-8")))
      .toDF("asset_id", "media_type", "bytes")
      .withColumn("byte_len", length(col("bytes")).cast("long"))
    val frames = Multimodal.sampleFrames(assets, everyNth = 2, maxFrames = 16)
      .collect()
      .map(r => (r.getAs[Long]("asset_id"), r.getAs[Int]("frame_index"),
        r.getAs[Array[Byte]]("frame_bytes")))
    // stride over SOURCE indices: 7 frames every 2nd → 0,2,4,6
    val a1 = frames.filter(_._1 == 1L).sortBy(_._2)
    assert(a1.map(_._2).toSeq == Seq(0, 2, 4, 6))
    // every sampled frame is a REAL decodable PNG at the GIF's dimensions,
    // carrying that source frame's color — proof read(i) hit frame i
    a1.foreach { case (_, i, png) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null && img.getWidth == 12 && img.getHeight == 8)
      assert((img.getRGB(5, 3) & 0xffffff) == ((0x4080c0 ^ (i * 0x202020)) & 0xffffff),
        s"frame $i must carry its own source frame's pixels")
    }
    assert(frames.filter(_._1 == 2L).map(_._2).toSeq == Seq(0))
    // maxFrames caps the sample, not the source walk
    val capped = Multimodal.sampleFrames(assets, everyNth = 1, maxFrames = 3)
      .filter(col("asset_id") === 1L).select("frame_index")
      .as[Int].collect().sorted.toSeq
    assert(capped == Seq(0, 1, 2))
    // non-media payloads keep flowing through the declared stub fallback
    assert(frames.exists(_._1 == 3L))
  }
}
