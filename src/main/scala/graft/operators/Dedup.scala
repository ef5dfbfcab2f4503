package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines (SURVEY §7.2 slice 6 /
  * BASELINE north star). All variants are pure built-in-expression pipelines
  * (codegen'd, no UDFs) and are keyed so every shuffle is on a bounded hash
  * key — the shapes that survive 100 TB:
  *
  *   - exact:        one groupBy on a content digest (md5) — single shuffle,
  *                   map-side partial agg
  *   - MinHash/LSH:  shingle → per-seed min-hash → band → bucket join. The
  *                   candidate join is on (band_id, band_hash) buckets, never
  *                   all-pairs; a bucket-size cap guards against degenerate
  *                   buckets (the classic LSH skew bomb at scale)
  *   - SimHash:      64-bit fingerprint from token-hash bit votes; near-dup ⇔
  *                   small Hamming distance within blocking buckets
  *   - n-gram Jaccard: exact verification on LSH candidates (not all pairs)
  *
  * Determinism: "hash functions" are md5 over seed-prefixed text, so every
  * result is reproducible in any engine (the differential-test requirement) —
  * lexicographic min over hex digests is a valid min-hash.
  */
object Dedup {

  /** Canonical text for fingerprinting: lowercase, collapse whitespace. */
  def canonical(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Exact dedup — keep one row per distinct canonical text (deterministic
    * representative: min doc id). Single shuffle on the digest.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("__fp", md5(canonical(col(textCol))))
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).alias(idCol), count(lit(1)).alias("dup_count"))
      .drop("__fp")

  /** Word n-gram shingles of the canonical text (default 3-word shingles —
    * the standard near-dup granularity).
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val tokens = split(canonical(text), " ")
    // sliding windows via transform over token indices; filter short tails
    array_distinct(filter(
      transform(tokens, (_, i) => concat_ws(" ", slice(tokens, i + 1, lit(n)))),
      s => size(split(s, " ")) === n))
  }

  /** MinHash signature: for each of `numHashes` seeds, the lexicographic min
    * of md5(seed || shingle). Output: array<string> of length `numHashes`.
    * Runs entirely inside one projection — no shuffle, no UDF.
    */
  def minhashSignature(text: Column, numHashes: Int = 12): Column = {
    val sh = shingles(text)
    val mins = (0 until numHashes).map { seed =>
      array_min(transform(sh, s => md5(concat(lit(s"$seed|"), s))))
    }
    array(mins: _*)
  }

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand` and
    * hash each band. Output rows (id, band_id, band_hash) ready for the
    * bucket self-join. The band hash uses null-PROPAGATING concat, so
    * documents with no shingles (null signature) drop out instead of
    * colliding into one md5("") mega-bucket.
    */
  def lshBands(docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 3): DataFrame = {
    val sig = minhashSignature(col(textCol), bands * rowsPerBand)
    docs
      .select(col(idCol), sig.alias("__sig"))
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => {
          val parts: Seq[Column] = (0 until rowsPerBand).flatMap { j =>
            Seq(element_at(col("__sig"), (b * rowsPerBand + j + 1).cast("int")), lit("|"))
          }.dropRight(1)
          md5(concat(parts: _*))
        })))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_hash")
      .filter(col("band_hash").isNotNull)
  }

  /** LSH candidate pairs: docs sharing any band bucket. The join is
    * bucket-local; `maxBucketSize` drops degenerate buckets (boilerplate
    * documents) that would otherwise produce O(bucket²) pairs — at 100 TB
    * this cap is what keeps the operator bounded. Pairs are oriented a<b and
    * de-duplicated across bands.
    */
  def lshCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    val banded = lshBands(docs, idCol, textCol, bands, rowsPerBand)
    val bounded = banded
      .withColumn("__bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_id"), col("band_hash"))))
      .filter(col("__bucket_n") <= maxBucketSize)
      .drop("__bucket_n")
    val a = bounded.select(col("band_id"), col("band_hash"), col(idCol).alias("id_a"))
    val b = bounded.select(col("band_id"), col("band_hash"), col(idCol).alias("id_b"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for a pair frame (id_a, id_b) —
    * verification stage after LSH candidates. Joins the shingle sets back in
    * (two hash joins on ids) and computes |∩|/|∪| with array intrinsics.
    */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol), shingles(col(textCol), n).alias("__sh"))
    pairs
      .join(sh.withColumnRenamed(idCol, "id_a").withColumnRenamed("__sh", "__sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed(idCol, "id_b").withColumnRenamed("__sh", "__sh_b"), Seq("id_b"))
      .withColumn("__inter", size(array_intersect(col("__sh_a"), col("__sh_b"))))
      .withColumn("__union", size(array_union(col("__sh_a"), col("__sh_b"))))
      .select(col("id_a"), col("id_b"),
        when(col("__union") === 0, lit(0.0))
          .otherwise(col("__inter").cast("double") / col("__union")).alias("jaccard"))
  }

  /** MinHash near-dup end-to-end: LSH candidates verified by true Jaccard ≥
    * threshold.
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, bands: Int = 4, rowsPerBand: Int = 3): DataFrame = {
    val cands = lshCandidatePairs(docs, idCol, textCol, bands, rowsPerBand)
    ngramJaccard(cands, docs, idCol, textCol).filter(col("jaccard") >= threshold)
  }

  /** SimHash: 64-bit fingerprint. Each token votes its md5-derived 64-bit
    * hash's bits weighted ±1; fingerprint bit i = sign of the vote sum.
    * Computed with array/bit intrinsics only (conv on a 15-hex-digit slice
    * keeps the value positive within a signed 64-bit long: 60 bits).
    */
  def simhash(text: Column, bits: Int = 60): Column = {
    val tokens = array_distinct(split(canonical(text), " "))
    val hashes = transform(tokens, t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    val bitVotes = (0 until bits).map { i =>
      // vote_i = Σ tokens: +1 if bit set else −1  ⇒  2·popcount_i − n
      aggregate(hashes, lit(0L),
        (acc, h) => acc + shiftright(h, i).bitwiseAND(lit(1L)) * 2L - 1L)
    }
    // fingerprint = Σ (vote_i > 0) << i
    bitVotes.zipWithIndex.map { case (v, i) =>
      when(v > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two simhash fingerprints via bit_count(xor). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on the top `blockBits` bits (cheap LSH for
    * Hamming space) then verify distance ≤ maxDistance within blocks.
    */
  def simhashNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      maxDistance: Int = 3, blockBits: Int = 12): DataFrame = {
    val withFp = docs.select(col(idCol), simhash(col(textCol)).alias("__fp"))
    val blocked = withFp.withColumn("__block", shiftright(col("__fp"), 60 - blockBits))
    val a = blocked.select(col("__block"), col(idCol).alias("id_a"), col("__fp").alias("fp_a"))
    val b = blocked.select(col("__block"), col(idCol).alias("id_b"), col("__fp").alias("fp_b"))
    a.join(b, Seq("__block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hammingDistance(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
