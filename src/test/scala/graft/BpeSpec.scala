package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE trainer/encoder: the textbook low/lower/newest/widest example
  * hand-checked end to end, plus the overlap and tie-break contracts.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic corpus: low×5, lower×2, newest×6, widest×3
  private def corpus = Seq(
    (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
    (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
  ).toDF("doc_id", "text")

  test("trainMerges reproduces the textbook merge sequence with tie-breaks") {
    val (merges, _) = Bpe.trainMerges(Bpe.wordFreq(corpus, "text"), 3)
    // counts: es=9, st=9, t</w>=9 → lexicographic tie-break picks 'e s';
    // merging cascades: 'es t' then 'est </w>', each still at mass 9
    assert(merges == Seq(
      (0, "e s", 9L),
      (1, "es t", 9L),
      (2, "est </w>", 9L)))
  }

  test("encode applies merges in rank order; unknown words stay char-split") {
    val (merges, _) = Bpe.trainMerges(Bpe.wordFreq(corpus, "text"), 3)
    val enc = Bpe.encode(Seq((1L, "newest zap")).toDF("doc_id", "text"),
      "text", merges.map(_._2))
      .select($"bpe_tokens").as[Seq[String]].head()
    assert(enc == Seq("n", "e", "w", "est</w>", "z", "a", "p", "</w>"))
  }

  test("merge replace is left-to-right non-overlapping (aaa under 'a a')") {
    val enc = Bpe.encode(Seq((1L, "aaa")).toDF("doc_id", "text"),
      "text", Seq("a a"))
      .select($"bpe_tokens").as[Seq[String]].head()
    assert(enc == Seq("aa", "a", "</w>"))
  }

  test("encodeVocab is the differential twin of encode (same symbol multiset per doc)") {
    val (merges, _) = Bpe.trainMerges(Bpe.wordFreq(corpus, "text"), 3)
    val direct = Bpe.encode(corpus, "text", merges.map(_._2))
      .select($"doc_id", explode($"bpe_tokens").alias("s"))
      .groupBy($"doc_id", $"s").count()
      .as[(Long, String, Long)].collect().sorted.toSeq
    val words = corpus.select($"doc_id",
      explode(graft.operators.TextAnalysis.canonicalTokens($"text")).alias("word"))
    val viaVocab = words
      .join(Bpe.encodeVocab(words.select($"word").distinct(), merges.map(_._2)), Seq("word"))
      .select($"doc_id", explode($"syms").alias("s"))
      .groupBy($"doc_id", $"s").count()
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(direct == viaVocab && direct.nonEmpty)
  }

  test("batched trainer: maxBatch=1 reproduces the sequential trainer exactly") {
    val wf = Bpe.wordFreq(corpus, "text")
    val (seq3, _) = Bpe.trainMerges(wf, 3)
    val (bat3, seqs) = Bpe.trainMergesBatched(wf, 3, maxBatch = 1)
    assert(bat3 == seq3)
    // the cascade fixture also pins the PREFIX-CUT under a big batch: each
    // merge creates the next pair, so every batch degrades to a singleton
    // and the batched result stays sequential-exact
    val (bat3wide, _) = Bpe.trainMergesBatched(wf, 3, maxBatch = 64)
    assert(bat3wide == seq3)
    // returned sequences reflect all merges (est</w> collapsed)
    assert(seqs.filter(col("seq").contains("est</w>")).count() == 2)
  }

  test("batched trainer merges a disjoint top prefix in one job, sequential-equal") {
    // two independent high-mass pairs: 'a b' spread across two word
    // families (so its successor pairs split below 'c d') and 'c d' in a
    // third — the top-2 candidates are symbol-disjoint, one batch takes
    // both, and the result equals the two-job sequential pick
    val docs = Seq(
      (1L, (Seq.fill(5)("abx") ++ Seq.fill(4)("aby")).mkString(" ")),
      (2L, Seq.fill(7)("cd").mkString(" "))).toDF("doc_id", "text")
    val wf = Bpe.wordFreq(docs, "text")
    val (seq2, _) = Bpe.trainMerges(wf, 2)
    val (bat2, _) = Bpe.trainMergesBatched(wf, 2, maxBatch = 8)
    assert(bat2 == seq2)
    assert(bat2.map(_._2) == Seq("a b", "c d"))
    // and the batched merge list encodes losslessly like any merge list
    val words = docs.select(
      explode(graft.operators.TextAnalysis.canonicalTokens($"text")).alias("word"))
      .distinct()
    val rebuilt = Bpe.encodeVocab(words, bat2.map(_._2))
      .select($"word", array_join($"syms", "").alias("joined"))
      .as[(String, String)].collect()
    rebuilt.foreach { case (w, j) => assert(j == w + Bpe.EndOfWord) }
  }

  test("trainMerges stops early when no pairs remain") {
    // single 1-char word: seq 'x </w>' has one pair, then none
    val (merges, _) = Bpe.trainMerges(
      Bpe.wordFreq(Seq((1L, "x x")).toDF("doc_id", "text"), "text"), 5)
    assert(merges == Seq((0, "x </w>", 2L)))
  }
}
