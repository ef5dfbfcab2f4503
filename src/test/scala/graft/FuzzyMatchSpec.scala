package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, FuzzyMatch}

/** Fuzzy record linkage: canonical edit similarity, prefix+suffix blocking
  * (an edit anywhere still pairs), block-size skew guard, and cluster
  * composition with the shared pair machinery.
  */
class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  test("editSimilarity: normalized levenshtein with null/empty contract") {
    val rows = Seq(
      ("kitten", "sitting"),
      ("same", "same"),
      (null.asInstanceOf[String], "x"),
      ("", "")
    ).toDF("a", "b")
      .select(FuzzyMatch.editSimilarity(col("a"), col("b")).alias("s"))
      .as[Option[Double]].collect()
    assert(math.abs(rows(0).get - (1.0 - 3.0 / 7.0)) < 1e-12)
    assert(rows(1).contains(1.0))
    assert(rows(2).isEmpty)
    assert(rows(3).contains(1.0))
  }

  test("blocking: an edit anywhere in the string still produces the pair, exactly once") {
    val df = Seq(
      (1L, "Johnathan Smith"),   // clean
      (2L, "Jonathan Smith"),    // head-region edit (within prefix 4) → suffix key pairs it
      (3L, "Johnathan Smyth"),   // tail edit → prefix key pairs it
      (4L, "Johnathan Smiths"),  // interior/tail append → both keys pair it (dedup to one row)
      (5L, "completely unrelated name")
    ).toDF("id", "name")
    val pairs = FuzzyMatch.blockedCandidatePairs(df, "id", "name")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    // dedup across the two key passes: no pair appears twice
    val all = FuzzyMatch.blockedCandidatePairs(df, "id", "name")
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(all.length == all.toSet.size)
  }

  test("fuzzyDuplicates: threshold filters, similarity matches the definition") {
    val df = Seq(
      (1L, "ACME Corp."),
      (2L, "acme corp"),     // identical canonical → 1.0
      (3L, "ACME Corpse"),   // 1 edit on "acmecorp(se)"
      (4L, "Widget Works")
    ).toDF("id", "name")
    val out = FuzzyMatch.fuzzyDuplicates(df, "id", "name", threshold = 0.7)
      .as[(Long, Long, Double)].collect().toMap2
    assert(out((1L, 2L)) == 1.0)
    // acmecorp vs acmecorpse: lev 2, maxlen 10
    assert(math.abs(out((1L, 3L)) - 0.8) < 1e-12)
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("a pair exactly AT the threshold survives the length prefilter") {
    // canonical lengths 10 vs 9, one deletion: similarity = 1 - 1/10 = 0.9
    // exactly; a bound computed as (1-t)*maxLen would lose it to float
    // rounding (1.0 - 0.9 = 0.09999999999999998)
    val df = Seq((1L, "abcdefghij"), (2L, "abcdefghi")).toDF("id", "name")
    val out = FuzzyMatch.fuzzyDuplicates(df, "id", "name", threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSet == Set((1L, 2L)))
    assert(out.head._3 == 0.9)
  }

  test("short names: a single edit ANYWHERE is still a candidate (deletion-neighborhood keys)") {
    // length 7 < 2*prefixLen: a substitution at position 4 corrupts BOTH
    // the prefix-4 and suffix-4 windows — only the deletion neighborhood
    // can pair these
    val df = Seq(
      (1L, "abcdefg"), (2L, "abcxefg"),  // substitution mid-overlap
      (3L, "pqrstuv"), (4L, "pqrstv"),   // deletion, lengths 7/6
      (5L, "zz")                          // unrelated
    ).toDF("id", "name")
    val pairs = FuzzyMatch.blockedCandidatePairs(df, "id", "name")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((3L, 4L)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    val scored = FuzzyMatch.fuzzyDuplicates(df, "id", "name", threshold = 0.85)
      .as[(Long, Long, Double)].collect().toMap2
    assert(math.abs(scored((1L, 2L)) - (1.0 - 1.0 / 7.0)) < 1e-12)
  }

  test("repeated-character names emit each deletion variant once (no block-count inflation)") {
    // 'aaaaaaaa' (len 8, short class): all 8 deletions collapse to ONE
    // variant — without dedup the d-block would count 8 members per record
    // and trip maxBlockSize on far fewer distinct records than intended
    val df = (1L to 5L).map(i => (i, "aaaaaaaa")).toDF("id", "name")
    val perKey = FuzzyMatch.blockedCandidatePairs(df, "id", "name", maxBlockSize = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // 5 identical records → C(5,2) = 10 pairs, none lost to inflated counts
    assert(perKey.size == 10)
  }

  test("maxBlockSize drops degenerate blocks (the boilerplate guard)") {
    val common = (1L to 50L).map(i => (i, s"shared prefix name $i"))
    val df = common.toDF("id", "name")
    val capped = FuzzyMatch.blockedCandidatePairs(df, "id", "name", maxBlockSize = 10)
    // the prefix block holds all 50 → dropped; suffix keys differ per row
    assert(capped.count() == 0)
    val uncapped = FuzzyMatch.blockedCandidatePairs(df, "id", "name", maxBlockSize = 1000)
    assert(uncapped.count() > 0)
  }

  test("2-edit recall: bottom-k gram keys recover pairs hitting BOTH windows (measured floor)") {
    // the adversarial 2-edit shape: one substitution inside the prefix-4
    // window AND one inside the suffix-4 window — both window keys differ,
    // so the guaranteed-at-distance-1 blocking is structurally blind here.
    // Names are md5-derived (deterministic, low cross-record gram sharing);
    // canonical form == the name itself (lowercase alphanumeric).
    def h(i: Int) = java.util.UUID.nameUUIDFromBytes(
      s"rec$i".getBytes("UTF-8")).toString.replace("-", "")
    val n = 200
    val rows = (1 to n).flatMap { i =>
      val base = "rec" + h(i) // 35 chars
      val cs = base.toCharArray
      cs(1) = 'x'                 // prefix-window edit ('e' -> 'x')
      cs(cs.length - 2) = 'x'     // suffix-window edit (hex digit -> 'x')
      Seq((i.toLong, base), (i.toLong + 100000L, new String(cs)))
    }
    val df = rows.toDF("id", "name")
    val truePairs = (1 to n).map(i => (i.toLong, i.toLong + 100000L)).toSet
    def recall(gramKeys: Int): Double =
      FuzzyMatch.blockedCandidatePairs(df, "id", "name", gramKeys = gramKeys)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        .intersect(truePairs).size / n.toDouble
    // window keys alone CANNOT pair these — the gap this key family closes
    assert(recall(0) == 0.0)
    // measured on this fixed corpus (xxhash64 is deterministic): the floors
    // are the DOCUMENTED distance-2 recall contract for gramKeys = 2 / 4
    val r2 = recall(2)
    val r4 = recall(4)
    assert(r2 >= 0.75, s"gramKeys=2 distance-2 recall $r2 below floor 0.75")
    assert(r4 >= 0.90, s"gramKeys=4 distance-2 recall $r4 below floor 0.90")
    assert(r4 >= r2)
    // end-to-end: the recovered pairs survive scoring (2 edits on 35 chars
    // = 1 - 2/35 ≈ 0.943)
    val scored = FuzzyMatch.fuzzyDuplicates(df, "id", "name",
      threshold = 0.9, gramKeys = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(scored.intersect(truePairs).size / n.toDouble >= 0.90)
  }

  test("gramKeys leaves distance-1 guarantees and block capping intact") {
    // same fixtures as the distance-1 tests, gram keys ON: nothing lost
    val df = Seq(
      (1L, "Johnathan Smith"), (2L, "Jonathan Smith"),
      (3L, "abcdefg"), (4L, "abcxefg"), // short class: deletion neighborhood
      (5L, "zz")
    ).toDF("id", "name")
    val pairs = FuzzyMatch.blockedCandidatePairs(df, "id", "name", gramKeys = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.length == pairs.toSet.size) // still deduped across families
    assert(pairs.toSet.contains((1L, 2L)) && pairs.toSet.contains((3L, 4L)))
    // the cap applies to gram blocks exactly as to window blocks: 50
    // records sharing every gram form only oversized blocks — all dropped
    val common = (1L to 50L).map(i => (i, "identical company name")).toDF("id", "name")
    val capped = FuzzyMatch.blockedCandidatePairs(common, "id", "name",
      maxBlockSize = 10, gramKeys = 2)
    assert(capped.count() == 0)
  }

  test("pairs compose with Dedup.clusters for entity resolution") {
    val df = Seq(
      (1L, "Data Systems Inc"), (2L, "Data Systems Inc."), (3L, "Dato Systems Inc"),
      (10L, "Other Business LLC")
    ).toDF("id", "name")
    val pairs = FuzzyMatch.fuzzyDuplicates(df, "id", "name", threshold = 0.85)
    val clusters = Dedup.clusters(pairs.select(col("id_a"), col("id_b")))
      .as[(Long, Long)].collect().toMap
    assert(clusters(2L) == 1L && clusters(3L) == 1L) // min-id representative
    assert(!clusters.contains(10L))
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = rows.map(r => ((r._1, r._2), r._3)).toMap
  }
}
