package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (BASELINE north star):
  * language-ID, quality scoring, token counting, document fingerprinting.
  * Every metric is a built-in-expression composition — codegen'd, one
  * projection over the corpus, no shuffle, no UDF — so a 100 TB corpus pays
  * exactly one scan for the whole profile.
  */
object TextAnalysis {

  /** The fused one-pass profile struct (native kernel; see
    * [[graft.functions.expressions.TextProfile]]) — all single-document
    * metrics below project fields off it; whole-stage codegen CSEs the
    * kernel call, so touching five metrics still costs one pass.
    */
  def profileStruct(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.TextProfile(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** Whitespace token count. */
  def tokenCountWhitespace(text: Column): Column =
    profileStruct(text).getField("n_tokens_ws")

  /** Builtin twin of [[tokenCountWhitespace]] (differential testing). */
  def tokenCountWhitespaceBuiltin(text: Column): Column =
    when(text.isNull, lit(null))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: word pieces + digits + punctuation as separate
    * tokens (the standard pre-tokenizer regex family: letter runs, digit
    * runs, single non-space symbols).
    */
  def tokenCountBpe(text: Column): Column =
    profileStruct(text).getField("n_tokens_bpe")

  /** Builtin twin of [[tokenCountBpe]] (differential testing). */
  def tokenCountBpeBuiltin(text: Column): Column =
    when(text.isNull, lit(null))
      .otherwise(size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))))

  /** Punctuation ratio: punctuation chars / total chars (0 for empty).
    * The class is the explicit ASCII punctuation range (what Java calls
    * `\p{Punct}`) spelled out so RE2-based engines match identically.
    */
  val PunctClass = "[!-/:-@\\[-`{-~]"
  def punctRatio(text: Column): Column =
    profileStruct(text).getField("punct_ratio")

  /** Builtin twin of [[punctRatio]] (differential testing). */
  def punctRatioBuiltin(text: Column): Column =
    when(text.isNull || length(text) === 0, lit(0.0))
      .otherwise(
        size(regexp_extract_all(text, lit(PunctClass), lit(0))).cast("double") / length(text))

  /** Stopword ratio for a given stopword list (case-insensitive). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val tokens = split(lower(trim(text)), "\\s+")
    val hits = size(filter(tokens, t => t.isInCollection(stopwords.map(_.toLowerCase))))
    when(text.isNull || size(tokens) === 0, lit(0.0))
      .otherwise(hits.cast("double") / size(tokens))
  }

  /** Mean word length (quality signal: gibberish skews extreme). */
  def meanWordLength(text: Column): Column =
    profileStruct(text).getField("mean_word_len")

  /** Builtin twin of [[meanWordLength]] (differential testing). */
  def meanWordLengthBuiltin(text: Column): Column = {
    val tokens = split(trim(text), "\\s+")
    when(text.isNull || size(tokens) === 0, lit(0.0))
      .otherwise(aggregate(tokens, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(tokens))
  }

  /** Composite quality score in [0,1]: length band + punct band + mean-word
    * band (a C4-style heuristic filter, expressed as one expression).
    *
    * Monitoring/caller convenience only — a double crossing into any exact
    * type (DECIMAL cast, round) is engine-dependent at scale midpoints, so
    * differential gates and thresholds must use [[qualityDecis]], the
    * integer form of the same rubric (decis = 10 × score, exactly).
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(coalesce(text, lit("")))
    val lengthOk = when(nChars >= 50 && nChars <= 20000, 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(text) <= 0.3, 1.0).otherwise(0.0)
    val mwl = meanWordLength(text)
    val wordsOk = when(mwl >= 2.5 && mwl <= 12.0, 1.0).otherwise(0.0)
    lengthOk * lit(0.4) + punctOk * lit(0.3) + wordsOk * lit(0.3)
  }

  /** Integer-decis quality score in {0, 3, 4, 6, 7, 10} — the same rubric
    * as [[qualityScore]] scaled by 10 into INT, with every sub-predicate an
    * integer CROSS-comparison so no float exists anywhere in the
    * derivation:
    *   - length band  (+4): 50 ≤ n_chars ≤ 20000
    *   - punct band   (+3): punct_ratio ≤ 0.3   ⟺  punct_count·10 ≤ n_chars·3
    *   - words band   (+3): 2.5 ≤ mean_word_len ≤ 12
    *                        ⟺  n_words ≥ 1 ∧ n_words·5 ≤ sum_word_len·2
    *                           ∧ sum_word_len ≤ n_words·12
    * The cross-multiplied forms are exactly equivalent to the double
    * comparisons (rationals with denominators ≤ doc length are spaced far
    * wider than an ulp around the band edges) AND every engine computes
    * identical integers — so decis sums/thresholds are differential-hash
    * stable where any double→DECIMAL cast of the score is not (the proven
    * q30/q109 divergence class; see COVERAGE.md stability audit).
    *
    * Null text scores like empty text minus the words band: length 0,
    * punct vacuously ok → 3.
    */
  def qualityDecis(text: Column): Column = {
    val p = profileStruct(text)
    val nChars = p.getField("n_chars")
    val punctCnt = p.getField("punct_count")
    val nWords = coalesce(p.getField("n_tokens_ws"), lit(0))
    val sumLen = p.getField("sum_word_len")
    val lengthOk = when(nChars >= 50 && nChars <= 20000, 4).otherwise(0)
    val punctOk = when(punctCnt * 10 <= nChars * 3, 3).otherwise(0)
    val wordsOk = when(nWords >= 1 &&
        nWords * 5 <= sumLen * 2 && sumLen <= nWords * 12, 3).otherwise(0)
    lengthOk + punctOk + wordsOk
  }

  /** Builtin twin of [[qualityDecis]] (differential testing). */
  def qualityDecisBuiltin(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val nChars = length(t)
    val punctCnt = size(regexp_extract_all(t, lit(PunctClass), lit(0)))
    val tokens = split(trim(t), "\\s+")
    val nWords = when(text.isNull, 0).otherwise(size(tokens))
    val sumLen = when(text.isNull, 0L)
      .otherwise(aggregate(tokens, lit(0L), (acc, tok) => acc + length(tok)))
    val lengthOk = when(nChars >= 50 && nChars <= 20000, 4).otherwise(0)
    val punctOk = when(punctCnt * 10 <= nChars * 3, 3).otherwise(0)
    val wordsOk = when(nWords >= 1 &&
        nWords * 5 <= sumLen * 2 && sumLen <= nWords * 12, 3).otherwise(0)
    lengthOk + punctOk + wordsOk
  }

  /** Tiny per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Deliberately small and public-knowledge (most frequent
    * function words).
    */
  val StopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "du", "que"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "de", "que"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这")
  )

  /** Language-ID: argmax over per-language stopword hit counts; ties and
    * zero hits → "und" (undetermined). Deterministic tie-break: higher count
    * wins, then lexicographic language code.
    */
  def langId(text: Column): Column =
    profileStruct(text).getField("lang_pred")

  /** Builtin twin of [[langId]] (differential testing; also the variant
    * that accepts custom profiles).
    */
  def langIdBuiltin(text: Column, profiles: Map[String, Seq[String]] = StopwordProfiles): Column = {
    val tokens = split(lower(trim(coalesce(text, lit("")))), "\\s+")
    // build array<struct<neg_hits, lang>> and array_min for deterministic argmax
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val hits = size(filter(tokens, t => t.isInCollection(words)))
      struct((-hits).alias("neg_hits"), lit(lang).alias("lang"))
    }
    val best = array_min(array(scored: _*))
    when(best.getField("neg_hits") >= 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Document fingerprint: polynomial rolling hash (base 31, mod 2^61-1) of
    * the canonical text's characters — an order-sensitive fingerprint that
    * any engine can reproduce (unlike md5, it is also incrementally
    * computable in a rolling window). Expressed over the char array with
    * `aggregate`; pmod keeps it in [0, M).
    */
  def rollingFingerprint(text: Column): Column = {
    val M = 2305843009213693951L // 2^61 − 1
    val chars = split(Dedup.canonical(coalesce(text, lit(""))), "")
    aggregate(chars, lit(0L),
      (acc, ch) => pmod(acc * 31L + coalesce(ascii(ch).cast("long"), lit(0L)), lit(M)))
  }

  /** Canonical token stream for corpus statistics: tokens of the canonical
    * (lowercased, whitespace-collapsed) text, empty tokens excluded. The
    * single definition q61's vocabulary and [[repetitionProfile]] share —
    * a tokenization change must not let corpus metrics drift apart.
    *
    * Native fused kernel ([[graft.functions.expressions.CanonicalTokens]]):
    * the builtin `filter(split(...))` twin below is CodegenFallback (every
    * token pays an interpreted-lambda round-trip), which made vocabulary
    * builds the slowest query in the suite.
    */
  def canonicalTokens(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.CanonicalTokens(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** Built-in-only twin of [[canonicalTokens]] — the differential cross-check
    * for the native kernel.
    */
  def canonicalTokensBuiltin(text: Column): Column =
    filter(split(Dedup.canonical(text), " "), t => length(t) > 0)

  /** Intra-document repetition profile (Gopher-style quality rule: heavily
    * repeated content predicts boilerplate/spam). Per document: token count,
    * distinct-token count, duplicate-token ratio, and the most frequent
    * token's share. Computed via explode + two keyed aggregations (shuffle
    * keys (doc, token) then doc) — linear in corpus size, no per-document
    * quadratic work, unlike the tempting `transform`-over-distinct-tokens
    * formulation.
    */
  def repetitionProfile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perToken = docs
      .select(col(idCol), explode(canonicalTokens(col(textCol))).alias("__tok"))
      .groupBy(col(idCol), col("__tok"))
      .agg(count(lit(1)).alias("__n"))
    perToken
      .groupBy(col(idCol))
      .agg(
        sum(col("__n")).alias("n_tokens"),
        count(lit(1)).alias("n_distinct"),
        max(col("__n")).alias("__max_n"))
      .select(
        col(idCol),
        col("n_tokens"),
        col("n_distinct"),
        // raw fixed IEEE DAG over exact counts (one division [+ one
        // subtraction]) — bit-stable across engines; round() would add
        // decimal-midpoint divergence risk, not remove it
        (lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"))
          .alias("dup_token_ratio"),
        (col("__max_n").cast("double") / col("n_tokens"))
          .alias("top_token_share"))
  }

  /** Pattern redaction (PII-style scrub): replace every match of `pattern`
    * with `replacement`. Row-local, codegen'd, composes with pushdown —
    * and the pattern class is spelled in portable regex (no engine-specific
    * shorthand) so cleaning is differential-testable (q71).
    */
  def redact(text: Column, pattern: String = "[0-9]",
      replacement: String = "#"): Column =
    regexp_replace(text, pattern, replacement)

  /** Fixed-size token chunking with overlap — the training/RAG preprocessing
    * step that turns documents into model-sized windows. Chunk `i` covers
    * canonical tokens `[i·stride, i·stride + chunkTokens)` with
    * `stride = chunkTokens − overlap`; the count of chunks is
    * `ceil((n − chunkTokens)/stride) + 1` (one chunk when `n ≤ chunkTokens`,
    * none for empty docs). Row-local (tokenize → posexplode of a chunk-index
    * sequence → slice), no shuffle — a 100 TB corpus chunks in one scan.
    * All arithmetic is integer, replayed exactly by the DuckDB oracle.
    *
    * @return idCol + (chunk_id, n_tokens, chunk_text), one row per chunk
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 128, overlap: Int = 16): DataFrame = {
    require(chunkTokens >= 1, "chunkTokens must be >= 1")
    require(overlap >= 0 && overlap < chunkTokens, "overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    val toks = canonicalTokens(col(textCol))
    val n = size(toks)
    // floor-div via double is exact here: token counts are far below 2^26,
    // so the quotient cannot round across an integer boundary
    val nChunks = when(n <= 0, lit(0L))
      .when(n <= chunkTokens, lit(1L))
      .otherwise(floor((n - chunkTokens + stride - 1).cast("double") / stride).cast("long") + 1L)
    docs
      .select(col(idCol), toks.alias("__toks"), nChunks.alias("__nc"))
      .filter(col("__nc") > 0)
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0L), col("__nc") - 1L)).alias("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        slice(col("__toks"), (col("chunk_id") * stride + 1L).cast("int"), lit(chunkTokens))
          .alias("__w"))
      .select(col(idCol), col("chunk_id"),
        size(col("__w")).cast("long").alias("n_tokens"),
        array_join(col("__w"), " ").alias("chunk_text"))
  }

  /** PII patterns for corpus scrubbing, ordered (applied first to last —
    * email before phone so an address's digits are already gone when the
    * phone pattern runs). Restricted to the regex subset Java regex and
    * RE2 evaluate identically — no lookaround, no backreferences, explicit
    * character classes — so any engine replays the redaction bit-for-bit
    * (the differential-test requirement, same as every kernel here).
    *
    * Phone matching is PRECISION-FIRST: only international (+CC ...) and
    * parenthesized-area-code forms match, because without lookaround any
    * bare digit-run pattern also swallows dates (`2024-01-01`), large
    * integers, and numeric table rows — silently mangling most documents
    * at corpus scale. Bare national numbers (`555-123-4567`) are a
    * documented miss, not a latent false-positive class.
    */
  val PiiPatterns: Seq[(String, String, String)] =
    graft.functions.expressions.Kernels.PiiPatterns

  /** Fused scrub ([[graft.functions.expressions.PiiScrub]]): one struct
    * `(clean_text, n_email, n_ipv4, n_phone_intl, n_phone_paren)` with one
    * matcher pass per pattern computing the replacement AND its staged
    * count together — half the regex passes of the
    * [[redactPii]]+[[piiCounts]] pair, which stays as the builtin
    * differential twin.
    */
  def piiScrub(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.PiiScrub(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** Redact PII in place: each pattern replaced by its typed tag. One
    * projection, row-local, codegen'd `regexp_replace` chain — a 100 TB
    * scrub is one scan. Null text stays null.
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (_, re, tag)) =>
      regexp_replace(acc, re, tag)
    }

  /** Per-type PII hit counts (audit/reporting side of the scrub): counts
    * are taken on the SAME progressively-redacted text the replacements
    * see, so they equal exactly what [[redactPii]] removed.
    */
  def piiCounts(text: Column): Column = {
    val (_, counts) = PiiPatterns.foldLeft((text, Seq.empty[Column])) {
      case ((acc, cols), (name, re, tag)) =>
        (regexp_replace(acc, re, tag),
          cols :+ regexp_count(acc, lit(re)).alias(s"n_$name"))
    }
    struct(counts: _*)
  }

  // ---------------------------------------------------------------------------
  // Bigram language model — the CCNet/KenLM-style corpus-fit quality signal:
  // train n-gram statistics on a reference corpus, score each document by
  // how typical its token transitions are. Low-probability (surprising)
  // documents are boilerplate/garbled/foreign candidates.
  // ---------------------------------------------------------------------------

  /** Bigram separator: US control char — cannot occur in whitespace-split
    * tokens, so `w1 + Sep + w2` is collision-free as a single join key
    * (DuckDB twin: `chr(31)`).
    */
  val BigramSep = "\u001f"

  /** Canonical token array: lowercase, whitespace-collapsed, empties out. */
  private def canonTokens(text: Column): Column =
    filter(split(trim(regexp_replace(lower(text), "\\s+", " ")), " "),
      (t: Column) => t =!= lit(""))

  /** Adjacent-pair keys (`w1<US>w2`) of each doc, exploded row-locally —
    * empty output for texts with fewer than two tokens.
    */
  private def bigramsExploded(docs: DataFrame, idCols: Seq[Column], textCol: String): DataFrame =
    docs.select(idCols :+ canonTokens(col(textCol)).alias("__graft_toks"): _*)
      .filter(size(col("__graft_toks")) >= 2)
      .select(idCols :+ explode(transform(
        sequence(lit(0), size(col("__graft_toks")) - 2),
        i => concat(element_at(col("__graft_toks"), i + 1), lit(BigramSep),
          element_at(col("__graft_toks"), i + 2)))).alias("bg"): _*)

  /** Train a bigram model over `docs(textCol)`: one row per surviving
    * bigram — `(bg, w1, c12, c1)` with `c12` = corpus count of the pair and
    * `c1` = corpus count of `w1` as a bigram prefix (the conditional's
    * denominator: P(w2|w1) ≈ c12/c1).
    *
    * `minCount` prunes rare bigrams AFTER `c1` is computed (the denominator
    * keeps full mass — standard LM pruning), which is the 100-TB lever: the
    * model a scoring join must materialize shrinks to the head of the
    * Zipf curve while scoring semantics degrade gracefully (pruned pairs
    * score as unknown). Shape: one corpus scan, one map-side-combined
    * shuffle on the pair key, then a rollup + join over DISTINCT bigrams
    * (model-sized, not corpus-sized).
    */
  def bigramModel(docs: DataFrame, textCol: String, minCount: Long = 1L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val c12 = bigramsExploded(docs, Seq.empty, textCol)
      .groupBy(col("bg")).agg(count(lit(1)).alias("c12"))
      .withColumn("w1", substring_index(col("bg"), BigramSep, 1))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).alias("c1"))
    c12.join(c1, Seq("w1")).filter(col("c12") >= minCount)
      .select(col("bg"), col("w1"), col("c12"), col("c1"))
  }

  /** Score each document against a trained [[bigramModel]]. Output per doc:
    * `n_bigrams`, `n_known` (pairs the model retains), exact integer mass
    * sums `sum_c12`/`sum_c1` (null when every pair is unknown — the
    * engine-portable statistics), and `avg_logprob` = mean ln(c12/c1) over
    * known pairs (the perplexity-style float signal; `exp(-avg_logprob)`
    * is per-bigram perplexity). Shape: one corpus scan, one shuffle join
    * on the pair key (AQE broadcasts pruned models that fit), one doc-key
    * aggregation.
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String, model: DataFrame): DataFrame =
    bigramsExploded(docs, Seq(col(idCol)), textCol)
      .join(model.select(col("bg"), col("c12"), col("c1")), Seq("bg"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).alias("n_bigrams"),
        count(col("c12")).alias("n_known"),
        sum(col("c12")).alias("sum_c12"),
        sum(col("c1")).alias("sum_c1"),
        avg(log(col("c12").cast("double") / col("c1").cast("double"))).alias("avg_logprob"))

  // ---------------------------------------------------------------------------
  // BM25 — the standard lexical relevance weighting (Robertson/Spärck Jones;
  // the scoring function behind Lucene/Elasticsearch defaults). Two forms:
  // a rational exact-integer keyword-extraction form (differential-testable
  // bit-for-bit — the q108 gate) and the classic log-IDF retrieval scorer
  // (the production serving path; ln() is not engine-portable at the ulp,
  // so it is spec-tested rather than oracle-hashed).
  // ---------------------------------------------------------------------------

  /** Per-(doc, term) BM25 weights with `k1 = 1.2`, `b = 0.75` (the standard
    * defaults), top `k` terms per document — BM25-saturated keyword
    * extraction. Uses the EXP-IDF variant: the classic idf is
    * `ln((N−df+½)/(df+½))`; this ranks terms by the ratio itself (monotone
    * in the per-term comparison, and — unlike ln — exactly reproducible on
    * any IEEE engine). With those constants the whole weight is one integer
    * ratio:
    *
    *   num = 22·tf·S·(2N − 2df + 1)
    *   den = (10·tf·S + 3·S + 9·dl·N)·(2df + 1)
    *
    * where `tf` = term count in doc, `dl` = doc token count, `df` = doc
    * frequency, `N` = corpus doc count, `S` = corpus token count (so
    * `avgdl = S/N` never appears as a rounded intermediate). `score` is the
    * single division num/den — both engines divide the same two exact
    * int64s, so the double is bit-identical. Integer envelope: num stays
    * below 2^53 while `tf·S·N < 4·10^14` — a per-PARTITION corpus at 100 TB
    * (and far beyond any test SF); whole-corpus scale serving uses
    * [[bm25Score]].
    *
    * Shape: one corpus scan → (doc,term) count shuffle; `df` is a
    * vocab-sized rollup of that table; `dl` a window over the same
    * clustering; `N`,`S` one broadcast row. Same cost profile as TF-IDF
    * (q76) — every corpus-sized shuffle is keyed, nothing quadratic.
    */
  def bm25Keywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = docs
      .select(col(idCol), explode(canonicalTokens(col(textCol))).alias("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).alias("tf"))
    val withDl = tf.withColumn("dl",
      sum(col("tf")).over(org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).alias("df"))
    val totals = docs.agg(count(lit(1)).alias("n_docs"))
      .crossJoin(tf.agg(sum(col("tf")).alias("s_tokens")))
    val scored = withDl
      .join(dfreq, "token")
      .crossJoin(broadcast(totals))
      .withColumn("w_num",
        lit(22L) * col("tf") * col("s_tokens") *
          (lit(2L) * col("n_docs") - lit(2L) * col("df") + lit(1L)))
      .withColumn("w_den",
        (lit(10L) * col("tf") * col("s_tokens") + lit(3L) * col("s_tokens") +
          lit(9L) * col("dl") * col("n_docs")) *
          (lit(2L) * col("df") + lit(1L)))
      .withColumn("score", col("w_num").cast("double") / col("w_den").cast("double"))
    val rk = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("token").asc)
    scored
      .withColumn("rk", row_number().over(rk))
      .filter(col("rk") <= k)
      .select(col(idCol), col("rk").cast("long").alias("rk"), col("token"),
        col("w_num"), col("w_den"), col("score"))
  }

  /** Classic BM25 retrieval scoring of a term set against the corpus —
    * per-doc `Σ_t idf(t)·tfsat(t,d)` with the Lucene non-negative idf
    * `ln(1 + (N−df+½)/(df+½))` and `tfsat = tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))`.
    * This is the serving path (floats, ln) — keyword extraction and the
    * oracle gate use [[bm25Keywords]]'s exact rational twin. Only docs
    * containing ≥1 query term appear (score > 0). Shape: tf table
    * semi-joined to the (broadcast) query-term list before any stats join,
    * so the corpus-sized operand drops to matching (doc,term) rows first.
    */
  def bm25Score(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k1 > 0 && b >= 0 && b <= 1, s"need k1 > 0, b in [0,1]; got k1=$k1 b=$b")
    val tf = docs
      .select(col(idCol), explode(canonicalTokens(col(textCol))).alias("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).alias("tf"))
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).alias("dl"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).alias("df"))
    val totals = docs.agg(count(lit(1)).alias("n_docs"))
      .crossJoin(dl.agg(avg(col("dl")).alias("avgdl")))
    val hits = tf.filter(col("token").isInCollection(queryTerms))
    hits
      .join(dl, Seq(idCol))
      .join(dfreq, "token")
      .crossJoin(broadcast(totals))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("tfsat",
        col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(sum(col("idf") * col("tfsat")).alias("bm25"),
        count(lit(1)).alias("n_matched_terms"))
  }

  /** Full text profile in one projection. */
  def profile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      tokenCountWhitespace(t).alias("n_tokens_ws"),
      tokenCountBpe(t).alias("n_tokens_bpe"),
      punctRatio(t).alias("punct_ratio"),
      meanWordLength(t).alias("mean_word_len"),
      langId(t).alias("lang_pred"),
      rollingFingerprint(t).alias("fingerprint"))
  }
}
