package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / fuzzy entity matching — blocked candidate generation +
  * edit-distance scoring: the classic BI master-data problem ("are these
  * two customer/part names the same entity?") and, for corpus curation,
  * near-duplicate short strings (titles, authors, product names) where
  * shingle MinHash ([[Dedup]]) is too coarse.
  *
  * Shape, in the dedup family's mold (never all-pairs):
  *   1. canonicalize names (lowercase, alphanumeric only);
  *   2. BLOCK on two keys per record — canonical prefix and canonical
  *      suffix (reverse-prefix); for strings at least `2·prefixLen` long
  *      the two windows are disjoint, so a single edit hits at most one
  *      and the other key stays intact. Shorter strings (where the
  *      windows would overlap and one edit could corrupt both) get their
  *      DELETION NEIGHBORHOOD as extra keys (SymSpell-style: the string
  *      plus every 1-deletion variant) — two short strings within edit
  *      distance 1 always share a variant. Together: ANY pair within
  *      edit distance 1 is guaranteed a candidate at every length;
  *      multi-edit pairs rely on an intact prefix or suffix window — or,
  *      with `gramKeys > 0`, on bottom-k MinHash gram keys that catch
  *      the both-windows-hit case with measured (FuzzyMatchSpec)
  *      probability.
  *      Only records sharing a key become candidates: one shuffle on the
  *      block key, pairs expanded map-side after the aggregation,
  *      oversized blocks (degenerate common names) dropped by
  *      `maxBlockSize` — the O(block²) skew guard, as in
  *      [[Dedup.lshCandidatePairsFromShingles]];
  *   3. score survivors with normalized edit similarity
  *      `1 − levenshtein/max(len)` and keep pairs at/above `threshold`
  *      (a cheap length-difference bound prunes first: distance ≥
  *      |len_a − len_b|, so the full DP never runs on hopeless pairs).
  *
  * Cluster the emitted pairs with [[Dedup.clusters]] for entity
  * resolution, exactly like the other pair producers here.
  */
object FuzzyMatch {

  /** Canonical matching form: lowercase, alphanumerics only. Blocking and
    * scoring both operate on this — punctuation/spacing/case never split a
    * block or tax the score.
    */
  def canonicalName(name: Column): Column =
    regexp_replace(lower(name), "[^a-z0-9]", "")

  /** Normalized edit similarity in [0, 1]: `1 − levenshtein/max(len)`.
    * Null on either side → null (SQL comparison semantics); two empty
    * strings → 1.0 (identical).
    */
  def editSimilarity(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(null).cast("double"))
      .when(length(a) === 0 && length(b) === 0, lit(1.0))
      .otherwise(lit(1.0) - levenshtein(a, b).cast("double") /
        greatest(length(a), length(b)).cast("double"))

  /** Candidate pairs `(id_a, id_b, __ca, __cb)` via prefix+suffix blocking
    * — oriented `id_a < id_b`, de-duplicated across the two key passes,
    * canonical names carried so scoring needs no join back. Rows whose
    * canonical name is empty never block (nothing to match on). Blocks
    * larger than `maxBlockSize` are dropped — the boilerplate-key guard;
    * size the cap to the worst tolerable block² (as with every bucketed
    * candidate generator here).
    *
    * `gramKeys > 0` adds a THIRD key family for multi-edit recall: the
    * `gramKeys` character `prefixLen`-grams with the smallest `xxhash64`
    * (a bottom-k MinHash over the gram set — [[Dedup]]'s sketch, at
    * character granularity). The window keys guarantee edit distance 1;
    * a 2-edit pair that hits BOTH windows still shares most of its gram
    * set (each edit destroys at most `prefixLen` grams), so with high
    * probability one of the bottom-k grams survives on both sides and
    * they land in a common `g|` block. Probabilistic by design — the
    * measured floor on a planted 2-edit corpus lives in FuzzyMatchSpec —
    * and linear in cost: ≤ `gramKeys` extra keys per record, same single
    * shuffle, same `maxBlockSize` skew guard (a boilerplate gram shared
    * by everything lands in an oversized block and is dropped, exactly
    * like a degenerate prefix).
    */
  def blockedCandidatePairs(df: DataFrame, idCol: String, nameCol: String,
      prefixLen: Int = 4, maxBlockSize: Int = 1000,
      gramKeys: Int = 0): DataFrame = {
    require(prefixLen >= 1, "prefixLen must be >= 1")
    require(maxBlockSize >= 2, "maxBlockSize must be >= 2")
    require(gramKeys >= 0, "gramKeys must be >= 0")
    val rows = df
      .select(col(idCol).alias("__id"), canonicalName(col(nameCol)).alias("__c"))
      .filter(col("__c").isNotNull && length(col("__c")) > 0)
    val c = col("__c")
    val windowKeys = array(
      concat_ws("|", lit("p"), substring(c, 1, prefixLen)),
      concat_ws("|", lit("s"), substring(reverse(c), 1, prefixLen)))
    // deletion neighborhood for short strings (the string itself at i=0,
    // the 1-deletion variants at i=1..len): bounded — only strings of at
    // most 2·prefixLen+1 chars emit it, ≤ 2·prefixLen+2 keys each. The
    // +1 covers the cross-class deletion pair (a 2·prefixLen+2-char
    // string pairs with its 1-shorter twin through prefix/suffix — see
    // the class doc; everything shorter pairs through here)
    val delKeys = transform(sequence(lit(0), length(c)), i =>
      when(i === 0, concat(lit("d|"), c))
        .otherwise(concat(lit("d|"),
          c.substr(lit(1), i - 1), c.substr(i + 1, length(c)))))
    // bottom-k min-hash grams (empty when off, or when the string is too
    // short to have a full gram — the deletion neighborhood owns that
    // regime). NOTE the length guard also keeps `sequence` ascending:
    // sequence(1, 0) would DESCEND.
    val minhashGramKeys =
      if (gramKeys == 0) array().cast("array<string>")
      else when(length(c) >= prefixLen, {
        val grams = array_distinct(transform(
          sequence(lit(1), length(c) - prefixLen + 1),
          i => c.substr(i, lit(prefixLen))))
        // array_sort on (hash, gram) structs orders by hash first; the
        // gram tiebreak makes key choice deterministic under collisions
        val byHash = array_sort(transform(grams,
          g => struct(xxhash64(g).alias("h"), g.alias("g"))))
        transform(slice(byHash, 1, gramKeys),
          s => concat(lit("g|"), s.getField("g")))
      }).otherwise(array().cast("array<string>"))
    // array_distinct: repeated characters make several deletions collapse
    // to the SAME variant ('aaaa' → 'aaa' four times); duplicate keys would
    // inflate block counts toward maxBlockSize (dropping genuine pairs)
    // and multiply the map-side pair expansion
    val keys = array_distinct(concat(
      when(length(c) <= 2 * prefixLen + 1,
        concat(windowKeys, delKeys)).otherwise(windowKeys),
      minhashGramKeys))
    val keyed = rows.select(col("__id"), c, explode(keys).alias("__k"))
    val ids = col("__m")
    keyed.groupBy(col("__k"))
      .agg(collect_list(struct(col("__id").alias("id"), col("__c").alias("c"))).alias("__m"))
      .filter(size(ids) >= 2 && size(ids) <= maxBlockSize)
      .select(explode(flatten(transform(ids, a =>
        filter(transform(ids, b => struct(
          a.getField("id").alias("id_a"), b.getField("id").alias("id_b"),
          a.getField("c").alias("c_a"), b.getField("c").alias("c_b"))),
          p => p.getField("id_a") < p.getField("id_b"))))).alias("p"))
      .select(col("p.id_a").alias("id_a"), col("p.id_b").alias("id_b"),
        col("p.c_a").alias("__ca"), col("p.c_b").alias("__cb"))
      .distinct()
  }

  /** Fuzzy duplicate pairs `(id_a, id_b, similarity)` at/above `threshold`.
    * The length-difference prefilter is semantics-free: it evaluates the
    * pair's BEST-POSSIBLE similarity (edit distance is bounded below by
    * the length difference) with the SAME arithmetic as the final score,
    * so a pair exactly at the threshold passes both identically — no
    * float-rounding gap between the bound and the filter. It exists to
    * keep the levenshtein DP off obviously-hopeless candidates.
    */
  def fuzzyDuplicates(df: DataFrame, idCol: String, nameCol: String,
      threshold: Double = 0.85, prefixLen: Int = 4,
      maxBlockSize: Int = 1000, gramKeys: Int = 0): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    val la = length(col("__ca")).cast("double")
    val lb = length(col("__cb")).cast("double")
    blockedCandidatePairs(df, idCol, nameCol, prefixLen, maxBlockSize, gramKeys)
      .filter(lit(1.0) - abs(la - lb) / greatest(la, lb) >= threshold)
      .withColumn("similarity", editSimilarity(col("__ca"), col("__cb")))
      .filter(col("similarity") >= threshold)
      .select(col("id_a"), col("id_b"), col("similarity"))
  }
}
