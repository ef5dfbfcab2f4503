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

  test("ivfTopK: exact duplicate lands in the same cell and is recalled at rank 1") {
    val q = vecs.filter($"vec_id" === 1L).select($"vec_id".alias("query_id"), $"embedding")
    val out = Similarity.ivfTopK(q, vecs, k = 2, cells = 2, nprobe = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(out.keySet.contains(4L))
    assert(out(4L) == 1)
  }

  test("embeddingNearDuplicates finds the exact-dup vector pair") {
    val out = Similarity.embeddingNearDuplicates(vecs, threshold = 0.999, numPlanes = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 4L)))
    assert(!out.contains((1L, 3L)))
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
    assert(e.getMessage.contains("cosine_similarity expects two numeric arrays"))
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
}
