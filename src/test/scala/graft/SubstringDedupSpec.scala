package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Substring-level exact dedup ([[Dedup.substringDupSpans]]): content-
  * defined anchors find verbatim cross-document spans wherever each copy
  * lands (alignment independence — the property that separates this from
  * stride sampling), exact mode (empty prefix) recovers tight span bounds,
  * and within-document repetition alone never fires (cross-doc contract).
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // deterministic high-entropy shared payload: Scala's Random is a spec'd
  // LCG, so the fixture is identical on every JVM. lowercase + digits only
  // (already canonical: Dedup.canonical is then the identity).
  private val sharedSpan: String =
    new scala.util.Random(42).alphanumeric.map(_.toLower).take(400).mkString
  private def filler(c: Char, n: Int): String = c.toString * n

  test("a shared 400-char span is found at DIFFERENT offsets in each doc (alignment independence)") {
    val docs = Seq(
      (1L, filler('a', 57) + sharedSpan + filler('b', 80)),
      (2L, filler('c', 213) + sharedSpan + filler('d', 10)),
      (3L, filler('e', 500)) // unrelated; self-repetition only
    ).toDF("doc_id", "text")
    val spans = Dedup.substringDupSpans(docs, "doc_id", "text", k = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // every hit lies inside the planted copy's true bounds; both docs hit;
    // the unrelated doc never appears (its repeated 'e' grams live in ONE doc)
    val bounds = Map(1L -> (57, 57 + 400), 2L -> (213, 213 + 400))
    assert(spans.nonEmpty && spans.forall { case (id, s0, s1) =>
      bounds.get(id).exists { case (lo, hi) => s0 >= lo && s1 <= hi && s1 - s0 >= 40 }
    }, s"spans outside planted bounds: ${spans.mkString(", ")}")
    assert(spans.map(_._1).toSet == Set(1L, 2L))
    // 1/16 anchor sampling over 361 grams: expected ~22 anchors, and the
    // merged span(s) must cover most of the 400 chars (a coverage floor,
    // not exact bounds — anchor-mode spans are a sample)
    val covered = spans.filter(_._1 == 1L).map { case (_, s0, s1) => s1 - s0 }.sum
    assert(covered >= 200, s"anchor-mode coverage too low: $covered of 400")
  }

  test("exact mode (empty prefix) recovers the planted span bounds exactly") {
    val docs = Seq(
      (1L, filler('a', 57) + sharedSpan + filler('b', 80)),
      (2L, filler('c', 213) + sharedSpan + filler('d', 10))
    ).toDF("doc_id", "text")
    val spans = Dedup.substringDupSpans(
        docs, "doc_id", "text", k = 40, anchorHexPrefix = "")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // every gram fully inside the copy is duplicated; boundary grams mix in
    // doc-unique filler, so the island is exactly the planted region
    assert(spans == Set((1L, 57, 57 + 400), (2L, 213, 213 + 400)),
      s"got $spans")
  }

  test("within-document repetition alone never fires; short and null docs are dropped") {
    val docs = Seq(
      (1L, filler('a', 300)),             // 260 identical grams, ONE doc
      (2L, "short"),                      // < k
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    assert(Dedup.substringDupSpans(docs, "doc_id", "text", k = 40,
      anchorHexPrefix = "").isEmpty)
  }

  test("canonicalization aligns case and whitespace variants before gram hashing") {
    // same payload, one copy upper-cased with doubled spaces: canonical
    // text is identical, so exact mode sees one duplicated region per doc
    val plain = sharedSpan.take(100).replace("a", " a ")
    val spaced = plain.toUpperCase.replace(" ", "  ")
    val docs = Seq((1L, spaced), (2L, plain)).toDF("doc_id", "text")
    val spans = Dedup.substringDupSpans(
        docs, "doc_id", "text", k = 40, anchorHexPrefix = "")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val canonLen = plain.toLowerCase.replaceAll("\\s+", " ").trim.length
    assert(spans == Set((1L, 0, canonLen), (2L, 0, canonLen)), s"got $spans")
  }

  test("minDocFreq=3 (semi-join path) agrees with the default window path on shared structure") {
    // three docs share the span: both code paths must find it; at
    // minDocFreq=3 a 2-doc-only span must NOT fire
    val three = Seq(
      (1L, filler('a', 50) + sharedSpan),
      (2L, filler('c', 90) + sharedSpan),
      (3L, sharedSpan + filler('e', 30))
    ).toDF("doc_id", "text")
    val at2 = Dedup.substringDupSpans(three, "doc_id", "text", k = 40,
      anchorHexPrefix = "", minDocFreq = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val at3 = Dedup.substringDupSpans(three, "doc_id", "text", k = 40,
      anchorHexPrefix = "", minDocFreq = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(at2 == at3 && at3 == Set((1L, 50, 450), (2L, 90, 490), (3L, 0, 400)),
      s"at2=$at2 at3=$at3")
    // a span in only two docs drops at minDocFreq=3
    val two = Seq(
      (1L, filler('a', 50) + sharedSpan),
      (2L, filler('c', 90) + sharedSpan),
      (3L, filler('e', 500))
    ).toDF("doc_id", "text")
    assert(Dedup.substringDupSpans(two, "doc_id", "text", k = 40,
      anchorHexPrefix = "", minDocFreq = 3).isEmpty)
  }

  test("incrementalDupSpans finds corpus-duplicated regions; batch-only repetition never fires") {
    val corpus = Seq(
      (100L, filler('a', 60) + sharedSpan),
      (101L, filler('b', 500))
    ).toDF("doc_id", "text")
    val idx = Dedup.anchorIndex(corpus, "doc_id", "text", k = 40,
      anchorHexPrefix = "")
    // doc 1 embeds the corpus span mid-document; docs 2+3 share a span
    // with EACH OTHER but not with the corpus — incremental mode must stay
    // silent on them (membership in the index is the only evidence)
    val batchSpan = new scala.util.Random(7).alphanumeric.map(_.toLower)
      .take(300).mkString
    val batch = Seq(
      (1L, filler('x', 33) + sharedSpan + filler('y', 20)),
      (2L, filler('p', 45) + batchSpan),
      (3L, batchSpan + filler('q', 80))
    ).toDF("doc_id", "text")
    val spans = Dedup.incrementalDupSpans(batch, idx, "doc_id", "text",
        k = 40, anchorHexPrefix = "")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(spans == Set((1L, 33, 33 + 400)), s"got $spans")
  }

  test("incrementalDupSpans: bloom-prefiltered path is result-identical") {
    val corpus = Seq(
      (100L, filler('a', 60) + sharedSpan),
      (101L, filler('b', 500))
    ).toDF("doc_id", "text")
    val idx = Dedup.anchorIndex(corpus, "doc_id", "text", k = 40,
      anchorHexPrefix = "")
    val batch = Seq(
      (1L, filler('x', 33) + sharedSpan + filler('y', 20)),
      (2L, filler('p', 45) + sharedSpan.take(200))
    ).toDF("doc_id", "text")
    def run(bloom: Option[Dedup.BloomConfig]) =
      Dedup.incrementalDupSpans(batch, idx, "doc_id", "text", k = 40,
        anchorHexPrefix = "", bloomPrefilter = bloom)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val plain = run(None)
    val bloomed = run(Some(Dedup.BloomConfig(expectedItems = 10000L, fpp = 0.01)))
    assert(plain == bloomed && plain.nonEmpty, s"plain=$plain bloomed=$bloomed")
    // an empty batch (no anchors) with the bloom path returns no spans
    // without error (null bloom aggregate → empty index)
    val empty = Seq((9L, "tiny")).toDF("doc_id", "text")
    assert(Dedup.incrementalDupSpans(empty, idx, "doc_id", "text", k = 40,
      anchorHexPrefix = "",
      bloomPrefilter = Some(Dedup.BloomConfig(10000L, 0.01))).isEmpty)
  }

  test("anchorIndex stamps (k, prefix); a mismatched query fails fast, even after parquet") {
    val corpus = Seq((100L, filler('a', 60) + sharedSpan)).toDF("doc_id", "text")
    val batch = Seq((1L, filler('x', 33) + sharedSpan)).toDF("doc_id", "text")
    val idx = Dedup.anchorIndex(corpus, "doc_id", "text", k = 40,
      anchorHexPrefix = "")
    val dir = java.nio.file.Files.createTempDirectory("graft-anchoridx").toString
    idx.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    // matching parameters: the reloaded index serves the batch
    val spans = Dedup.incrementalDupSpans(batch, reloaded, "doc_id", "text",
      k = 40, anchorHexPrefix = "").collect()
    assert(spans.nonEmpty)
    // mismatched k or prefix would silently report a clean batch (digests
    // can never match) — the metadata stamp survives parquet and fails fast
    intercept[IllegalArgumentException](Dedup.incrementalDupSpans(
      batch, reloaded, "doc_id", "text", k = 32, anchorHexPrefix = ""))
    intercept[IllegalArgumentException](Dedup.incrementalDupSpans(
      batch, reloaded, "doc_id", "text", k = 40, anchorHexPrefix = "0"))
    // a bare-hash index without the stamp (legacy/external) still runs
    val bare = reloaded.select(col("h").cast("binary").alias("h"))
    assert(Dedup.incrementalDupSpans(batch, bare, "doc_id", "text",
      k = 40, anchorHexPrefix = "").collect().nonEmpty)
  }

  test("stripSpans cuts exactly the detected regions; span-free docs pass through canonical") {
    val docs = Seq(
      (1L, filler('a', 57) + sharedSpan + filler('b', 80)),
      (2L, filler('c', 213) + sharedSpan + filler('d', 10)),
      (3L, "No Spans  Here")
    ).toDF("doc_id", "text")
    val spans = Dedup.substringDupSpans(
      docs, "doc_id", "text", k = 40, anchorHexPrefix = "")
    val byId = Dedup.stripSpans(docs, spans, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    // exact-mode spans are the planted region exactly → clean = fillers only
    assert(byId(1L) == (filler('a', 57) + filler('b', 80), 400))
    assert(byId(2L) == (filler('c', 213) + filler('d', 10), 400))
    assert(byId(3L) == ("no spans here", 0)) // canonicalized, untouched
  }

  test("stripSpans clips overlapping and touching spans; whole-doc span empties the text") {
    val docs = Seq((1L, "abcdefghij"), (2L, "0123456789")).toDF("doc_id", "text")
    val spans = Seq(
      (1L, 2, 5), (1L, 4, 7),  // overlap: cut [2,7) once
      (2L, 0, 10)              // whole doc
    ).toDF("doc_id", "span_start", "span_end")
    val byId = Dedup.stripSpans(docs, spans, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(byId(1L) == ("abhij", 5))
    assert(byId(2L) == ("", 10))
  }

  test("argument guards: k, hex prefix alphabet, cross-doc minDocFreq") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Dedup.substringDupSpans(docs, "doc_id", "text", k = 0))
    intercept[IllegalArgumentException](
      Dedup.substringDupSpans(docs, "doc_id", "text", anchorHexPrefix = "G"))
    intercept[IllegalArgumentException](
      Dedup.substringDupSpans(docs, "doc_id", "text", minDocFreq = 1))
  }
}
