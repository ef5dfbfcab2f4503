package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** BM25 family: the exact-rational keyword form (q108's oracle-gated path)
  * against an independent float reformulation, and the classic ln-idf
  * retrieval scorer against hand-computed values on a tiny corpus (ln is
  * not engine-portable at the ulp, so the scorer is spec-gated here rather
  * than DuckDB-hashed).
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // doc 4 shares no term with the test queries; doc lengths differ so the
  // b-normalization term is actually exercised
  private def tiny = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple cherry cherry date"),
    (4L, "elderberry fig")
  ).toDF("doc_id", "text")

  test("bm25Keywords rational weight equals the float BM25 it folds") {
    // num/den is algebraically idfRatio * tfsat with k1=1.2, b=0.75 —
    // recompute the float form from first principles and compare per row
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val tf = docs
      .select($"doc_id", explode(TextAnalysis.canonicalTokens($"text")).alias("token"))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).alias("tf"))
    val stats = tf.collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val dl = stats.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val dfreq = stats.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val n = docs.count().toDouble
    val s = dl.values.sum.toDouble
    val avgdl = s / n

    val got = TextAnalysis.bm25Keywords(docs, "doc_id", "text", k = 3).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (id, token) = (r.getLong(0), r.getString(2))
      val tfv = stats((id, token)).toDouble
      val dlv = dl(id).toDouble
      val dfv = dfreq(token).toDouble
      val idfRatio = (n - dfv + 0.5) / (dfv + 0.5)
      val tfsat = tfv * 2.2 / (tfv + 1.2 * (0.25 + 0.75 * dlv / avgdl))
      val expected = idfRatio * tfsat
      val score = r.getDouble(5)
      assert(math.abs(score - expected) <= 1e-9 * math.max(1.0, expected),
        s"doc $id token $token: got $score expected $expected")
      // and the committed integer ratio IS the score
      assert(score == r.getLong(3).toDouble / r.getLong(4).toDouble)
    }
  }

  test("bm25Keywords emits exactly k rows per doc, rank-ordered") {
    val got = TextAnalysis.bm25Keywords(tiny, "doc_id", "text", k = 2).collect()
    val byDoc = got.groupBy(_.getLong(0))
    assert(byDoc.keySet == Set(1L, 2L, 3L, 4L))
    byDoc.values.foreach { rows =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length).toSeq)
      assert(rows.length <= 2)
      // scores non-increasing in rank
      val byRank = rows.sortBy(_.getLong(1)).map(_.getDouble(5))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("bm25Score matches hand-computed classic BM25 on the tiny corpus") {
    // N=4 docs, S=11 tokens, avgdl=11/4
    val n = 4.0; val avgdl = 11.0 / 4.0
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def tfsat(tf: Double, dlv: Double) =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dlv / avgdl))
    // df: apple=2, cherry=2
    val expected = Map(
      1L -> idf(2) * tfsat(2, 3), // apple×2 in a 3-token doc
      2L -> idf(2) * tfsat(1, 2), // cherry×1 in a 2-token doc
      3L -> (idf(2) * tfsat(1, 4) + idf(2) * tfsat(2, 4)) // apple + cherry
    )
    val got = TextAnalysis.bm25Score(tiny, "doc_id", "text", Seq("apple", "cherry"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got.keySet == expected.keySet, "docs with no query term must not appear")
    expected.foreach { case (id, e) =>
      assert(math.abs(got(id)._1 - e) <= 1e-12 * math.max(1.0, e),
        s"doc $id: got ${got(id)._1} expected $e")
    }
    assert(got(3L)._2 == 2 && got(1L)._2 == 1) // n_matched_terms
  }

  test("bm25 input guards") {
    intercept[IllegalArgumentException](TextAnalysis.bm25Keywords(tiny, "doc_id", "text", k = 0))
    intercept[IllegalArgumentException](TextAnalysis.bm25Score(tiny, "doc_id", "text", Nil))
    intercept[IllegalArgumentException](
      TextAnalysis.bm25Score(tiny, "doc_id", "text", Seq("apple"), b = 1.5))
  }
}
