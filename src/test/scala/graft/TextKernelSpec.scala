package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Fused text kernels (WordShingles / MinHashSig / HashedTokens) vs their
  * builtin-expression twins: bit-identical on real fixture text and on the
  * edge cases (null, empty, whitespace-only, short docs, messy whitespace).
  */
class TextKernelSpec extends SparkSpec {
  import spark.implicits._

  private def edgeTexts = Seq(
    Some("The quick  brown\tfox jumps over the lazy dog"),
    Some("one two"),            // fewer tokens than shingle width
    Some("one two three"),      // exactly one shingle
    Some("a a a a a"),          // repeated tokens → distinct collapses
    Some(""),                   // empty
    Some("   \t\n  "),          // whitespace only
    Some("MiXeD CaSe   MiXeD CaSe extra"),
    None                        // null text
  ).toDF("text")

  private def fixtureTexts =
    spark.read.parquet(s"$sfDir/documents.parquet").select($"text")

  test("WordShingles matches builtin shingles on edge cases and fixtures") {
    for (df <- Seq(edgeTexts, fixtureTexts)) {
      val rows = df.select(
        Dedup.shingles($"text").alias("native"),
        Dedup.shinglesBuiltin($"text").alias("builtin")).collect()
      rows.foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1))
        if (!r.isNullAt(0))
          assert(r.getSeq[String](0) == r.getSeq[String](1))
      }
    }
  }

  test("MinHashSig matches the builtin affine-min formulation") {
    // Contract note: for a NULL shingle array the native kernel returns NULL
    // while the builtin `array(array_min(...))` returns [null × k] — every
    // element access / band hash downstream yields identical values, so the
    // twins are compared on non-null inputs and the null case is pinned
    // separately ("kernel null/empty contracts").
    for (df <- Seq(edgeTexts, fixtureTexts)) {
      val sh = df.select(Dedup.shinglesBuiltin($"text").alias("sh"))
        .filter($"sh".isNotNull)
      val rows = sh.select(
        Dedup.minhashSignatureOfShingles($"sh", 12).alias("native"),
        Dedup.minhashSignatureOfHashes(
          transform($"sh", Dedup.shingleHash(_)), 12).alias("builtin")).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(!r.isNullAt(0) && !r.isNullAt(1))
        assert(r.getSeq[Any](0) == r.getSeq[Any](1))
      }
    }
  }

  test("HashedTokens matches the builtin md5-60bit formulation") {
    for (df <- Seq(edgeTexts, fixtureTexts)) {
      val rows = df.select(
        Dedup.simhashTokenHashes($"text").alias("native"),
        Dedup.simhashTokenHashesBuiltin($"text").alias("builtin")).collect()
      rows.foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1))
        if (!r.isNullAt(0))
          assert(r.getSeq[Long](0).sorted == r.getSeq[Long](1).sorted)
      }
    }
  }

  test("HashedTokens preserves the builtin's first-occurrence order") {
    val r = Seq("b a c a b").toDF("text").select(
      Dedup.simhashTokenHashes($"text").alias("n"),
      Dedup.simhashTokenHashesBuiltin($"text").alias("b")).head()
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
  }

  test("CanonicalTokens matches the builtin filter(split(...)) twin") {
    import graft.operators.TextAnalysis
    for (df <- Seq(edgeTexts, fixtureTexts)) {
      val rows = df.select(
        TextAnalysis.canonicalTokens($"text").alias("native"),
        TextAnalysis.canonicalTokensBuiltin($"text").alias("builtin")).collect()
      rows.foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1))
        if (!r.isNullAt(0))
          assert(r.getSeq[String](0) == r.getSeq[String](1))
      }
    }
  }

  test("TextProfile kernel matches every builtin metric twin") {
    import graft.operators.TextAnalysis
    for (df <- Seq(edgeTexts, fixtureTexts)) {
      val rows = df.select(
        TextAnalysis.tokenCountWhitespace($"text").alias("ws_n"),
        TextAnalysis.tokenCountWhitespaceBuiltin($"text").alias("ws_b"),
        TextAnalysis.tokenCountBpe($"text").alias("bpe_n"),
        TextAnalysis.tokenCountBpeBuiltin($"text").alias("bpe_b"),
        TextAnalysis.punctRatio($"text").alias("pr_n"),
        TextAnalysis.punctRatioBuiltin($"text").alias("pr_b"),
        TextAnalysis.meanWordLength($"text").alias("mwl_n"),
        TextAnalysis.meanWordLengthBuiltin($"text").alias("mwl_b"),
        TextAnalysis.langId($"text").alias("lang_n"),
        TextAnalysis.langIdBuiltin($"text").alias("lang_b"),
        TextAnalysis.profileStruct($"text").getField("fingerprint").alias("fp_n"),
        md5(graft.operators.Dedup.canonical($"text")).alias("fp_b")).collect()
      rows.foreach { r =>
        for (base <- Seq(0, 2, 4, 6, 8, 10)) {
          assert(r.isNullAt(base) == r.isNullAt(base + 1), s"null mismatch at field $base: $r")
          if (!r.isNullAt(base)) assert(r.get(base) == r.get(base + 1), s"field $base: $r")
        }
      }
    }
  }

  test("qualityDecis: kernel-field form matches builtin twin and the double rubric") {
    import graft.operators.TextAnalysis
    for (df <- Seq(edgeTexts, fixtureTexts)) {
      val rows = df.select(
        TextAnalysis.qualityDecis($"text").alias("decis"),
        TextAnalysis.qualityDecisBuiltin($"text").alias("decis_b"),
        TextAnalysis.qualityScore($"text").alias("score")).collect()
      rows.foreach { r =>
        assert(!r.isNullAt(0) && !r.isNullAt(1))
        assert(r.getInt(0) == r.getInt(1), s"decis twins diverge: $r")
        // decis IS 10× the double rubric (the scores land on exact tenths)
        assert(r.getInt(0) == Math.round(r.getDouble(2) * 10).toInt,
          s"decis vs double rubric: $r")
      }
    }
  }

  test("GramAnchors matches the builtin explode+md5(substr) formulation") {
    // multi-byte codepoints exercise the codepoint→byte offset table: the
    // kernel hashes byte SLICES, the builtin hashes substring getBytes —
    // they must agree on non-ASCII too
    val texts = Seq(
      "abcdefghij" * 20,
      "päällekkäisyys — überlappende Zeichenketten, 重复的文本片段重复的文本片段",
      ("şehir çarşı 汉字漢字 " * 30).trim,
      "xy" // shorter than k → no grams
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (prefix <- Seq("", "0", "ab")) {
      val canon = texts.select($"id",
        Dedup.canonical($"text").alias("__c")).filter(length($"__c") >= 8)
      val native = canon
        .select($"id", explode(org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.functions.expressions.GramAnchors(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression($"__c"),
            8, prefix))).alias("__a"))
        .select($"id", $"__a.off".alias("off"), lower(hex($"__a.h")).alias("h"))
        .as[(Long, Int, String)].collect().toSet
      val builtin = Dedup.gramAnchorsBuiltin(canon, "id", 8, prefix)
        .as[(Long, Int, String)].collect().toSet
      assert(native == builtin, s"prefix='$prefix'")
      assert(prefix != "" || native.nonEmpty) // exact mode must emit grams
    }
  }

  test("PiiScrub matches the redactPii + piiCounts builtin pair") {
    import graft.operators.TextAnalysis
    val planted = Seq(
      Some("contact jane.doe@example.com or +1 (555) 123-4567 from 10.0.0.1"),
      Some("two mails a@b.co c@d.org, ip 255.255.255.255, (030) 1234 5678"),
      Some("no pii here, just 2024-01-01 and v1.2.3 and 999999999999"),
      Some("edge: +49 30 123456 then @ alone then 1.2.3.4.5 run-on"),
      Some(""),
      None
    ).toDF("text")
    for (df <- Seq(planted, fixtureTexts)) {
      val s = TextAnalysis.piiScrub($"text")
      val c = TextAnalysis.piiCounts($"text")
      val rows = df.select(
        s.getField("clean_text").alias("k_clean"),
        TextAnalysis.redactPii($"text").alias("b_clean"),
        s.getField("n_email"), c.getField("n_email"),
        s.getField("n_ipv4"), c.getField("n_ipv4"),
        s.getField("n_phone_intl"), c.getField("n_phone_intl"),
        s.getField("n_phone_paren"), c.getField("n_phone_paren"),
        $"text").collect()
      rows.foreach { r =>
        for (base <- Seq(0, 2, 4, 6, 8)) {
          assert(r.isNullAt(base) == r.isNullAt(base + 1),
            s"null mismatch field $base for text=${r.get(10)}")
          if (!r.isNullAt(base))
            assert(r.get(base) == r.get(base + 1),
              s"field $base for text=${r.get(10)}: ${r.get(base)} != ${r.get(base + 1)}")
        }
      }
    }
  }

  test("kernel null/empty contracts") {
    val r = edgeTexts.select(
      Dedup.shingles($"text").alias("sh"),
      Dedup.minhashSignatureOfShingles(Dedup.shingles($"text"), 3).alias("sig"))
      .collect()
    // empty text → empty shingles, all-null signature
    val empty = r(4)
    assert(empty.getSeq[String](0).isEmpty)
    assert(empty.getSeq[Any](1) == Seq(null, null, null))
    // null text → null shingles, null signature
    val nul = r(7)
    assert(nul.isNullAt(0) && nul.isNullAt(1))
  }
}
