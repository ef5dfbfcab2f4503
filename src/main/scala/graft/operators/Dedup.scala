package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Sizing for the optional broadcast-bloom corpus prefilter in
    * [[containment]]: `expectedItems` ≈ distinct probe shingles (the bloom
    * is built over the PROBE side, which is small by contract), `fpp` the
    * false-positive rate — at 1% the corpus-side shuffle shrinks to
    * ~matches + 1% of non-matches. A benchmark suite of 1M shingles at 1%
    * fpp is a ~1.2 MB broadcast.
    */
  case class BloomConfig(expectedItems: Long = 1000000L, fpp: Double = 0.01)

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
    * the standard near-dup granularity). Native fused kernel
    * ([[graft.functions.expressions.WordShingles]]): one pass per document,
    * stays in whole-stage codegen. [[shinglesBuiltin]] is the
    * differential-test twin.
    */
  def shingles(text: Column, n: Int = 3): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.WordShingles(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), n))

  /** Builtin-only formulation — `transform`/`filter`/`array_distinct` are
    * interpreted (CodegenFallback) per element, so this is the slow twin
    * kept for cross-checking the kernel.
    */
  def shinglesBuiltin(text: Column, n: Int = 3): Column = {
    val tokens = split(canonical(text), " ")
    // sliding windows via transform over token indices; filter short tails
    array_distinct(filter(
      transform(tokens, (_, i) => concat_ws(" ", slice(tokens, i + 1, lit(n)))),
      s => size(split(s, " ")) === n))
  }

  /** MinHash prime modulus and per-permutation affine parameters. One base
    * hash per shingle (md5 → 32-bit int) + `numHashes` affine maps
    * `h_i = (a_i·h + b_i) mod P` replaces `numHashes` independent digests —
    * the standard 2-universal construction, and ~12× fewer md5 evaluations.
    * Parameter ranges keep every product within a signed 64-bit long
    * (h < 2^32, a < 2^28), so the arithmetic is portable to any engine with
    * plain BIGINT math (the differential-test requirement).
    */
  val MinhashP: Long = graft.functions.expressions.Kernels.MinhashP

  def affineParams(i: Int): (Long, Long) =
    graft.functions.expressions.Kernels.affineParams(i)

  /** Base 32-bit shingle hash: first 8 md5 hex digits as an integer. */
  def shingleHash(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** MinHash signature: array<long> of length `numHashes`, min over the
    * affine-permuted base hashes. Native fused kernel
    * ([[graft.functions.expressions.MinHashSig]]) — one md5 pass over the
    * shingles, all permutations in one loop. The builtin twin
    * ([[minhashSignatureOfHashes]]) duplicates its input subtree per hash
    * (Catalyst re-evaluates the un-CSE'd branch `numHashes` times) — the
    * round-1 q25 bottleneck.
    */
  def minhashSignature(text: Column, numHashes: Int = 12): Column =
    minhashSignatureOfShingles(shingles(text), numHashes)

  def minhashSignatureOfShingles(sh: Column, numHashes: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.MinHashSig(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(sh), numHashes))

  /** Signature over an already-computed base-hash column — pipelines
    * materialize the md5 pass ONCE and derive all permutations from it.
    */
  def minhashSignatureOfHashes(h32: Column, numHashes: Int): Column = {
    val mins = (0 until numHashes).map { i =>
      val (a, b) = affineParams(i)
      array_min(transform(h32, h => (h * a + b) % MinhashP))
    }
    // null input → null signature (matches the native kernel; a bare
    // array(...) would yield an ARRAY OF NULLS instead)
    when(h32.isNull, lit(null).cast("array<bigint>")).otherwise(array(mins: _*))
  }

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand` and
    * hash each band. Output rows (id, band_id, band_hash) ready for the
    * bucket self-join. The band hash uses null-PROPAGATING concat, so
    * documents with no shingles (null signature) drop out instead of
    * colliding into one md5("") mega-bucket.
    */
  def lshBands(docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 3): DataFrame =
    bandRows(
      docs.select(col(idCol),
        minhashSignature(col(textCol), bands * rowsPerBand).alias("__sig")),
      idCol, bands, rowsPerBand)

  /** (id, __sig) → exploded (id, band_id, band_hash) rows. */
  private def bandRows(withSig: DataFrame, idCol: String,
      bands: Int, rowsPerBand: Int): DataFrame =
    withSig
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => {
          val parts: Seq[Column] = (0 until rowsPerBand).flatMap { j =>
            Seq(element_at(col("__sig"), (b * rowsPerBand + j + 1).cast("int")).cast("string"),
              lit("|"))
          }.dropRight(1)
          md5(concat(parts: _*))
        })))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_hash")
      .filter(col("band_hash").isNotNull)

  /** The shingle index: (id, __sh) — the one expensive projection (regex
    * split + sliding windows + distinct) the whole near-dup pipeline shares.
    * Persisted because both the candidate stage and the verification stage
    * read it; at warehouse scale this is the index you'd materialize to
    * storage once per corpus snapshot.
    */
  def shingleIndex(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    docs.select(col(idCol), shingles(col(textCol), n).alias("__sh"))

  /** LSH candidate pairs: docs sharing any band bucket. ONE shuffle: bands
    * are grouped by (band_id, band_hash) and pairs are expanded map-side
    * from each bucket's id list — no window pass, no self-join.
    * `maxBucketSize` drops degenerate buckets (boilerplate documents) that
    * would otherwise produce O(bucket²) pairs — at 100 TB this cap is what
    * keeps the operator bounded. Pairs are oriented a<b and de-duplicated
    * across bands.
    */
  def lshCandidatePairsFromShingles(shIdx: DataFrame, idCol: String,
      bands: Int = 4, rowsPerBand: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    val banded = bandRows(
      shIdx
        .filter(size(col("__sh")) > 0) // no shingles → never buckets
        .select(col(idCol),
          minhashSignatureOfShingles(col("__sh"), bands * rowsPerBand).alias("__sig")),
      idCol, bands, rowsPerBand)
    val ids = col("__ids")
    banded
      .groupBy(col("band_id"), col("band_hash"))
      .agg(sort_array(collect_list(col(idCol))).alias("__ids"))
      .filter(size(ids) >= 2 && size(ids) <= maxBucketSize)
      .select(explode(flatten(transform(ids, a =>
        filter(transform(ids, b => struct(a.alias("id_a"), b.alias("id_b"))),
          p => p.getField("id_a") < p.getField("id_b"))))).alias("p"))
      .select(col("p.id_a").alias("id_a"), col("p.id_b").alias("id_b"))
      .distinct()
  }

  /** Back-compat convenience over raw docs. */
  def lshCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 3, maxBucketSize: Int = 1000): DataFrame =
    lshCandidatePairsFromShingles(shingleIndex(docs, idCol, textCol), idCol,
      bands, rowsPerBand, maxBucketSize)

  /** Exact n-gram Jaccard for a pair frame (id_a, id_b) against a shingle
    * index — two hash joins on ids, |∩|/|∪| via array intrinsics.
    */
  def ngramJaccardFromShingles(pairs: DataFrame, shIdx: DataFrame, idCol: String): DataFrame =
    pairs
      .join(shIdx.select(col(idCol).alias("id_a"), col("__sh").alias("__sh_a")), Seq("id_a"))
      .join(shIdx.select(col(idCol).alias("id_b"), col("__sh").alias("__sh_b")), Seq("id_b"))
      .withColumn("__inter", size(array_intersect(col("__sh_a"), col("__sh_b"))))
      .withColumn("__union", size(array_union(col("__sh_a"), col("__sh_b"))))
      .select(col("id_a"), col("id_b"),
        when(col("__union") === 0, lit(0.0))
          .otherwise(col("__inter").cast("double") / col("__union")).alias("jaccard"))

  /** Back-compat convenience over raw docs. */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    ngramJaccardFromShingles(pairs, shingleIndex(docs, idCol, textCol, n), idCol)

  /** MinHash near-dup end-to-end: LSH candidates verified by true Jaccard ≥
    * threshold. The shingle index is computed once and persisted across the
    * two stages.
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, bands: Int = 4, rowsPerBand: Int = 3): DataFrame = {
    val shIdx = shingleIndex(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = lshCandidatePairsFromShingles(shIdx, idCol, bands, rowsPerBand)
    ngramJaccardFromShingles(cands, shIdx, idCol).filter(col("jaccard") >= threshold)
  }

  /** Connected components over an undirected near-dup pair frame — the
    * clustering step that turns pairwise matches into dedup groups (keep
    * one representative per component).
    *
    * Iterative min-label propagation: every node starts labeled with its
    * own id; each round every node takes the min of its label and its
    * neighbors' labels; fixpoint ⇒ label = component minimum. One shuffle
    * per round, O(diameter) rounds — near-dup components are shallow
    * (pairs share ≥70% content, so components are cliques-ish; diameters
    * of 2-4), which is why plain propagation beats the alternating
    * small-star/large-star scheme here. `localCheckpoint` after each round
    * keeps lineage (and thus plan size) constant.
    *
    * @return (id, cluster_id) for every id that appears in `pairs`;
    *         cluster_id = min id of the component.
    */
  def clusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxRounds: Int = 50, smallGraphMaxEdges: Long = 2000000L): DataFrame =
    clustersImpl(pairs, idA, idB, maxRounds, smallGraphMaxEdges)._1

  /** [[clusters]] plus whether the propagation reached its fixpoint — if
    * false (a component's diameter exceeded `maxRounds`), labels are only
    * partially propagated and one true component may carry several
    * cluster_ids. `clusters` itself logs a warning in that case rather than
    * failing: for dedup, a split component only means less aggressive
    * deduplication, never wrong merges.
    */
  def clustersConverged(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxRounds: Int = 50, smallGraphMaxEdges: Long = 2000000L): (DataFrame, Boolean) =
    clustersImpl(pairs, idA, idB, maxRounds, smallGraphMaxEdges)

  /** Best-copy selection per duplicate cluster — the curation policy on
    * top of [[clusters]]: every record (clustered or singleton) maps to
    * its cluster's REPRESENTATIVE, the member with the highest `scoreCol`
    * (quality score, length, recency — caller's choice), ties to the
    * smallest id. [[clusters]]' min-id convention answers "which cluster";
    * this answers "which COPY to keep" — FineWeb-style dedup keeps the
    * best-quality duplicate, not the lowest-numbered one.
    *
    * Output: one row per record — `(<idCol>, cluster_id, representative)`.
    * Singletons are their own cluster and representative (their id cannot
    * collide with a real cluster_id: cluster labels are member ids, and
    * ids are unique). A NULL-id record cannot appear in the pair graph
    * (pairs carry real ids) and has no joinable identity, so it passes
    * through as an anonymous singleton — `(null, null, null)` here, kept
    * verbatim by [[keepBestPerCluster]] — rather than silently vanishing
    * in the cluster join. Cost beyond [[clusters]]: one id-keyed join of
    * the pair graph's labels onto the records and a cluster-count-sized
    * argmax aggregation — nothing touches record payloads.
    */
  def clusterRepresentatives(records: DataFrame, pairs: DataFrame,
      idCol: String, scoreCol: String): DataFrame = {
    val comp = clusters(pairs)
    val scoredAll = records.select(col(idCol).alias("__id"),
      col(scoreCol).alias("__score"))
    // null-id branches only exist when the schema ADMITS null ids — a
    // non-nullable id column must not pay extra evaluations of the
    // (possibly expensive) records plan for provably-empty branches.
    // Resolution is case-INSENSITIVE (matching col()'s default analyzer
    // behavior); an unresolvable name stays conservative — col() will
    // raise the real error downstream
    val idNullable = records.schema.fields
      .find(_.name.equalsIgnoreCase(idCol)).forall(_.nullable)
    val nullRows =
      if (!idNullable) None
      else Some(scoredAll.filter(col("__id").isNull)
        .select(col("__id").alias(idCol), col("__id").alias("cluster_id"),
          col("__id").alias("representative")))
    val scored =
      if (idNullable) scoredAll.filter(col("__id").isNotNull) else scoredAll
    val withCluster = scored.join(comp, scored("__id") === comp("id"), "left")
      .select(col("__id"),
        coalesce(col("cluster_id"), col("__id")).alias("__cluster"),
        col("__score"))
    // argmax(score) with min-id tiebreak, EXACT for any orderable score
    // type under the TYPE'S OWN ordering (no double cast — a 2^53+1 long
    // or high-precision decimal elects correctly; string scores compare
    // lexicographically): max(score) ignores nulls (SQL aggregate
    // convention — an unscored copy can never win; an all-null cluster's
    // max is null and the null-safe filter below degrades it to min-id),
    // then the smallest id among the max-scored members. Both aggregates
    // and the join are cluster-count-sized. Float/double NaN would sort
    // ABOVE +Infinity and win every election — normalize it to null
    // (worst) first.
    val cleanScore = withCluster.schema("__score").dataType match {
      case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType =>
        when(isnan(col("__score")), lit(null)).otherwise(col("__score"))
      case _ => col("__score")
    }
    val cleaned = withCluster.withColumn("__score", cleanScore)
    val maxScore = cleaned.groupBy(col("__cluster"))
      .agg(max(col("__score")).alias("__m"))
    val best = cleaned.join(maxScore, "__cluster")
      .filter(col("__score") <=> col("__m"))
      .groupBy(col("__cluster"))
      .agg(min(col("__id")).alias("representative"))
    val main = withCluster.join(best, "__cluster")
      .select(col("__id").alias(idCol), col("__cluster").alias("cluster_id"),
        col("representative"))
    nullRows.map(main.unionByName(_)).getOrElse(main)
  }

  /** Filter `records` to each cluster's best copy ([[clusterRepresentatives]]
    * policy): the one-call "dedup, keep the best" — singletons always
    * survive, every duplicate cluster keeps exactly its representative.
    * NULL-id records are anonymous singletons (no joinable identity, can
    * never pair) and survive verbatim.
    */
  def keepBestPerCluster(records: DataFrame, pairs: DataFrame,
      idCol: String, scoreCol: String): DataFrame = {
    val keep = clusterRepresentatives(records, pairs, idCol, scoreCol)
      .filter(col(idCol) === col("representative"))
      .select(col(idCol).alias("__keep_id"))
    val idNullable = records.schema.fields
      .find(_.name.equalsIgnoreCase(idCol)).forall(_.nullable)
    if (!idNullable)
      // non-nullable id: no null branch to preserve, one semi-join
      records.join(keep, records(idCol) === col("__keep_id"), "left_semi")
    else
      records.filter(col(idCol).isNotNull)
        .join(keep, records(idCol) === col("__keep_id"), "left_semi")
        .unionByName(records.filter(col(idCol).isNull))
  }

  /** Driver-side union-find (path-halving; smaller id becomes the root, so
    * roots are component minima — identical labels to the distributed
    * fixpoint). Used below the size gate, where a handful of propagation
    * ROUNDS (each a join+agg+checkpoint job) would cost more in fixed
    * scheduling overhead than the whole graph costs to collect.
    */
  private def unionFindLabels(edges: Array[(Any, Any)], lt: (Any, Any) => Boolean)
      : scala.collection.mutable.HashMap[Any, Any] = {
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) {
        val p = parent(r)
        parent(r) = parent.getOrElse(p, p) // path halving
        r = parent(r)
      }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    val out = scala.collection.mutable.HashMap.empty[Any, Any]
    parent.keysIterator.foreach(k => out(k) = find(k))
    out
  }

  /** Comparison for the union-find root choice; None for id types where the
    * distributed path must be used (no deterministic "min id" ordering).
    * Strings compare by UTF-8 BYTES, matching Spark's min() (UTF8String
    * binary order) — Java's String '<' is UTF-16 code-unit order, which
    * disagrees for non-BMP characters and would elect a different root than
    * the distributed fixpoint.
    */
  private def idOrdering(dt: org.apache.spark.sql.types.DataType): Option[(Any, Any) => Boolean] = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some((a, b) => a.asInstanceOf[Number].longValue < b.asInstanceOf[Number].longValue)
      case StringType => Some { (a, b) =>
        val x = a.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val y = b.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
        java.util.Arrays.compareUnsigned(x, y) < 0
      }
      case _ => None
    }
  }

  private def clustersImpl(pairs: DataFrame, idA: String, idB: String,
      maxRounds: Int, smallGraphMaxEdges: Long): (DataFrame, Boolean) = {
    val edges = pairs.select(col(idA).alias("src"), col(idB).alias("dst"))
      .union(pairs.select(col(idB).alias("src"), col(idA).alias("dst")))
      .distinct()
      // lazy: the count right below is the materializing action — an eager
      // checkpoint would run the same plan as a separate job first
      .localCheckpoint(eager = false)
    val idType = edges.schema("src").dataType
    val nEdges = edges.count() // materializes the checkpoint blocks
    val lt = idOrdering(idType)
    if (nEdges <= smallGraphMaxEdges && lt.isDefined) {
      // Small-graph fast path: near-dup graphs are usually a sliver of the
      // corpus (edges ∝ duplicates found, not documents scanned), so even at
      // 100 TB of input this branch is often the one taken. Above the gate —
      // or for exotic id types — the distributed fixpoint below runs instead.
      val labelOf = unionFindLabels(
        edges.collect().map(r => (r.get(0), r.get(1))), lt.get)
      val spark = pairs.sparkSession
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("cluster_id", idType)))
      val rows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(labelOf.toSeq.map {
          case (k, v) => org.apache.spark.sql.Row(k, v)
        }: _*)
      return (spark.createDataFrame(rows, schema), true)
    }
    var labels = edges.select(col("src").alias("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(eager = false) // round 1's convergence probe runs it
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val neighborMin = edges
        .join(labels.select(col("id").alias("dst"), col("label").alias("__nl")), Seq("dst"))
        .groupBy(col("src").alias("id"))
        .agg(min(col("__nl")).alias("__nmin"))
      val updated = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("__nmin"), col("label"))).alias("__next"))
        .localCheckpoint(eager = false) // the probe below materializes it
      converged = updated.filter(col("__next") =!= col("label")).isEmpty
      labels = updated.select(col("id"), col("__next").alias("label"))
      round += 1
    }
    if (!converged)
      graft.core.Logging.logger("graft.dedup").warn(
        s"clusters: label propagation did not converge within $maxRounds rounds; " +
          "components wider than that are split into multiple cluster_ids " +
          "(use clustersConverged to detect this programmatically)")
    (labels.select(col("id"), col("label").alias("cluster_id")), converged)
  }

  /** Token hashes for simhash: md5 of each distinct token, first 15 hex
    * digits as a positive 60-bit long. Native fused kernel
    * ([[graft.functions.expressions.HashedTokens]]); builtin twin below.
    */
  def simhashTokenHashes(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.HashedTokens(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** Builtin-only twin of [[simhashTokenHashes]] for differential testing. */
  def simhashTokenHashesBuiltin(text: Column): Column =
    transform(array_distinct(split(canonical(text), " ")),
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))

  /** SimHash: 60-bit fingerprint via the native fused kernel
    * ([[graft.functions.expressions.SimHash]]): each token votes its hash's
    * bits ±1, fingerprint bit i = sign of vote i. The builtin-expression
    * twin ([[simhashBuiltin]]) is the cross-check.
    */
  def simhash(text: Column, bits: Int = 60): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.SimHash(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(simhashTokenHashes(text)),
        bits))

  /** Builtin-only formulation: `bits` aggregate lambdas — correct but
    * O(bits) codegen units; kept for differential testing of the kernel.
    */
  def simhashBuiltin(text: Column, bits: Int = 60): Column = {
    val hashes = simhashTokenHashes(text)
    val bitVotes = (0 until bits).map { i =>
      // vote_i = Σ tokens: +1 if bit set else −1  ⇒  2·popcount_i − n
      aggregate(hashes, lit(0L),
        (acc, h) => acc + shiftright(h, i).bitwiseAND(lit(1L)) * 2L - 1L)
    }
    // fingerprint = Σ (vote_i > 0) << i; null token hashes (null text) →
    // null fingerprint, matching the native kernel — without the guard the
    // when(...).otherwise(0) branches would swallow the null votes into 0
    val fp = bitVotes.zipWithIndex.map { case (v, i) =>
      when(v > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ + _)
    when(hashes.isNull, lit(null).cast("long")).otherwise(fp)
  }

  /** Hamming distance between two simhash fingerprints via bit_count(xor). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** MinHash signature index of a corpus: `(id, __sig)` — the artifact an
    * incremental pipeline materializes ONCE per corpus snapshot (k longs per
    * document, ~100 bytes vs the document text) and joins every new crawl
    * batch against. Documents with no shingles carry an all-null signature
    * and never band-match.
    */
  def signatureIndex(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 12): DataFrame =
    docs.select(col(idCol),
      minhashSignature(col(textCol), numHashes).alias("__sig"))

  /** Incremental near-dup detection: match a NEW batch against an existing
    * [[signatureIndex]] WITHOUT re-reading corpus text — the shape that
    * keeps continuous-ingest dedup linear in the batch, not the corpus.
    * Candidates come from an LSH band equi-join (new bands ⋈ index bands,
    * one shuffle, never all-pairs); verification is the signature-agreement
    * Jaccard estimate, so corpus documents are never re-tokenized.
    * `maxBucketSize` caps degenerate index-side bands (the boilerplate skew
    * guard, as in [[lshCandidatePairsFromShingles]]).
    *
    * The index and the new batch are each consumed twice (banding +
    * verification); caching is deliberately the CALLER's choice — in the
    * continuous-ingest deployment the index is a materialized table (that is
    * the point of [[signatureIndex]]) and re-reads are cheap columnar scans,
    * while an operator-internal persist would leak one cached plan per
    * batch for the session's lifetime.
    *
    * @return (new_id, corpus_id, jaccard_est) for estimate ≥ threshold
    */
  def incrementalNearDuplicates(newDocs: DataFrame, index: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.7,
      bands: Int = 4, rowsPerBand: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    require(bands * rowsPerBand >= 1, "bands*rowsPerBand must be >= 1")
    val newSigs = signatureIndex(newDocs, idCol, textCol, bands * rowsPerBand)
    val newBands = bandRows(newSigs.withColumnRenamed(idCol, "new_id"),
      "new_id", bands, rowsPerBand)
      .select(col("band_id"), col("band_hash"), col("new_id"))
    val idxBands0 = bandRows(index.withColumnRenamed(idCol, "corpus_id"),
      "corpus_id", bands, rowsPerBand)
      .select(col("band_id"), col("band_hash"), col("corpus_id"))
    // skew guard on the corpus side (the big side): drop index bands that
    // bucket more than maxBucketSize documents. Window count, not
    // groupBy+anti-join — shares the candidate join's (band_id, band_hash)
    // partitioning and avoids recomputing the index banding lineage twice
    val idxBands = idxBands0
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col("band_id"), col("band_hash"))))
      .filter(col("__n") <= maxBucketSize)
      .drop("__n")
    val cands = newBands.join(idxBands, Seq("band_id", "band_hash"))
      .filter(col("new_id") =!= col("corpus_id"))
      .select(col("new_id"), col("corpus_id")).distinct()
    cands
      .join(newSigs.select(col(idCol).alias("new_id"), col("__sig").alias("__sa")), Seq("new_id"))
      .join(index.select(col(idCol).alias("corpus_id"), col("__sig").alias("__sb")), Seq("corpus_id"))
      // A mismatched index (built with a different numHashes) would not fail
      // on its own: bands still collide, but the estimate nulls out and
      // every candidate silently drops. Fail at execution instead — lazily,
      // so constructing the plan stays job-free.
      .withColumn("jaccard_est",
        when(col("__sa").isNotNull && col("__sb").isNotNull &&
            size(col("__sa")) =!= size(col("__sb")),
          raise_error(concat(
            lit("incrementalNearDuplicates: index signature length "),
            size(col("__sb")).cast("string"),
            lit(s" != bands*rowsPerBand (${bands * rowsPerBand}); rebuild the index " +
              "with signatureIndex(..., numHashes = bands*rowsPerBand)"))).cast("double"))
          .otherwise(jaccardEstimateFromSignatures(col("__sa"), col("__sb"))))
      .filter(col("jaccard_est") >= threshold)
      .select(col("new_id"), col("corpus_id"), col("jaccard_est"))
  }

  /** Jaccard ESTIMATE from two MinHash signatures: the fraction of agreeing
    * positions (an unbiased estimator of the true Jaccard similarity, ±
    * O(1/√k)). The at-scale substitute for exact shingle-set verification:
    * signatures are k longs per document, so pair scoring never re-touches
    * the text.
    */
  def jaccardEstimateFromSignatures(sigA: Column, sigB: Column): Column =
    when(sigA.isNull || sigB.isNull || size(sigA) === 0 || size(sigA) =!= size(sigB),
      lit(null))
      .otherwise(
        size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))
          .cast("double") / size(sigA))

  /** Benchmark-contamination check: shingle containment of each probe
    * ("benchmark") document in each corpus document —
    * |sh(corpus) ∩ sh(probe)| / |sh(probe)|. The asymmetric cousin of
    * Jaccard: a training document that embeds a whole benchmark item scores
    * ~1 even when the document is much longer.
    *
    * Plan shape: explode both sides to (doc, shingle) rows and equi-join on
    * the shingle — a hash join on a bounded-cardinality key, never an
    * all-pairs comparison. Probe shingle-set sizes broadcast (the probe set
    * is a benchmark: small by construction). `maxDocFreq` drops shingles
    * that occur in more than that many corpus documents (stopword-ish
    * n-grams) — the cap that keeps the join linear at 100 TB; dropped
    * shingles can only LOWER containment, so the filter is conservative for
    * a ≥-threshold use.
    */
  def containment(corpus: DataFrame, probes: DataFrame,
      corpusIdCol: String, probeIdCol: String, textCol: String,
      minContainment: Double = 0.8, n: Int = 3,
      maxDocFreq: Option[Int] = None,
      bloomPrefilter: Option[BloomConfig] = None): DataFrame = {
    val shC0 = corpus.select(col(corpusIdCol).alias("doc_id"),
      explode(shingles(col(textCol), n)).alias("__sh"))
    val shP = probes.select(col(probeIdCol).alias("probe_id"),
      shingles(col(textCol), n).alias("__shl"))
    val probeSizes = shP.select(col("probe_id"), size(col("__shl")).alias("__n_probe"))
    val shPe = shP.select(col("probe_id"), explode(col("__shl")).alias("__sh"))
    // Optional broadcast-bloom prefilter over the CORPUS side (the 100 TB
    // side): almost no corpus shingle appears in any benchmark, so testing
    // membership against a bloom of the probe shingles before the exchange
    // cuts shuffle volume by ~1/fpp. Exactness is untouched — bloom false
    // positives are discarded by the equi-join that follows; false
    // negatives cannot occur. Applied BEFORE the doc-frequency cap so the
    // cap's groupBy also runs on the prefiltered set (the bloom is
    // per-shingle deterministic: a surviving shingle keeps ALL its corpus
    // occurrences, so its doc-freq count is unchanged; a dropped shingle
    // could never join anyway).
    val shC1 = bloomPrefilter match {
      // bloom over the probe side ([[bloomPruned]]); an empty probe set can
      // join nothing anyway, so the corpus passes through unfiltered
      case Some(cfg) => bloomPruned(shC0, shPe, "__sh", cfg, onEmpty = shC0)
      case None => shC0
    }
    val shC = maxDocFreq match {
      case Some(cap) =>
        // window count, not groupBy+anti-join: shares the probe join's __sh
        // partitioning and evaluates the corpus shingle-explode lineage once
        shC1.withColumn("__df",
            count(lit(1)).over(Window.partitionBy(col("__sh"))))
          .filter(col("__df") <= cap)
          .drop("__df")
      case None => shC1
    }
    shC.join(shPe, Seq("__sh"))
      .groupBy(col("doc_id"), col("probe_id"))
      .agg(count(lit(1)).alias("__n_common"))
      .join(broadcast(probeSizes), Seq("probe_id"))
      .withColumn("containment",
        // one IEEE division of exact counts — bit-stable raw, no round()
        col("__n_common").cast("double") / col("__n_probe"))
      .filter(col("containment") >= minContainment)
      .select(col("probe_id"), col("doc_id"), col("containment"))
  }

  /** SimHash near-dup pairs: block on the top `blockBits` bits (cheap LSH for
    * Hamming space) then verify distance ≤ maxDistance within blocks.
    *
    * `maxBlockSize` drops degenerate blocks before the within-block
    * self-join — the same skew guard as `maxBucketSize` in the MinHash
    * path: a boilerplate-heavy corpus where many documents share the top
    * fingerprint bits would otherwise make one reducer O(block²).
    */
  def simhashNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      maxDistance: Int = 3, blockBits: Int = 12, maxBlockSize: Int = 1000): DataFrame = {
    val withFp = docs.select(col(idCol), simhash(col(textCol)).alias("__fp"))
    val blocked0 = withFp.withColumn("__block", shiftright(col("__fp"), 60 - blockBits))
    // cap via a window count, not groupBy+anti-join: the count shares the
    // self-join's __block partitioning (no extra shuffle) and avoids a
    // third evaluation of the simhash kernel lineage
    val blocked = blocked0
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__block"))))
      .filter(col("__n") <= maxBlockSize)
      .drop("__n")
    val a = blocked.select(col("__block"), col(idCol).alias("id_a"), col("__fp").alias("fp_a"))
    val b = blocked.select(col("__block"), col(idCol).alias("id_b"), col("__fp").alias("fp_b"))
    a.join(b, Seq("__block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hammingDistance(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact substring-level dedup — the pass that removes VERBATIM character
    * spans repeated across documents (boilerplate, licence blocks, quoted
    * chain mail), where whole-document MinHash/SimHash sees two "different"
    * documents. The literature shape is a corpus-wide suffix array; the
    * Spark-first shape is content-defined ANCHORS:
    *
    *   - every k-char gram of the canonical text whose md5 starts with
    *     `anchorHexPrefix` is an anchor — a deterministic 16^-len(prefix)
    *     sample that is ALIGNMENT-INDEPENDENT (selection depends only on
    *     gram content, so both copies of a duplicated span select the same
    *     grams wherever the span lands in each document);
    *   - an anchor hash occurring in ≥ `minDocFreq` DISTINCT documents
    *     marks its gram's offset as duplicated;
    *   - marked offsets gapped ≤ k chars merge into one span
    *     `[span_start, span_end)` (gram overlap chains through a run).
    *
    * Sensitivity: a duplicated span of length L holds L-k+1 grams ⇒
    * ~(L-k+1)/16^p anchors in expectation; spans ≫ k·16^p are caught with
    * high probability, shorter ones are sampled (a miss UNDER-reports —
    * conservative for a filter). At 100 TB, set a 2-hex prefix (1/256) to
    * cut the anchor shuffle 16× at a ~256+k-char sensitivity floor.
    *
    * Plan shape: one codegen projection explodes offsets and keeps only
    * anchors (~len/16^p rows per doc reach the exchange); the cross-doc
    * mark is min(doc)≠max(doc) over a hash-partitioned window for the
    * default `minDocFreq = 2` (one shuffle, constant window state, single
    * evaluation of the md5 scan) and a countDistinct + LEFT SEMI join for
    * higher thresholds — either way never a pair expansion, so a
    * boilerplate gram in a million documents costs one group's scalars,
    * not 10^12 pairs — then a doc-partitioned window merges islands.
    *
    * Returns one row per merged span: `(idCol, span_start, span_end)`,
    * offsets into the CANONICAL text (0-based, end-exclusive).
    */
  def substringDupSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 40, anchorHexPrefix: String = "0",
      minDocFreq: Int = 2): DataFrame = {
    require(k >= 1, s"gram length k must be >= 1, got $k")
    require(anchorHexPrefix.length <= 32 && anchorHexPrefix.matches("[0-9a-f]*"),
      s"anchorHexPrefix must be lowercase hex, at most 32 chars (md5 width), got '$anchorHexPrefix'")
    require(minDocFreq >= 2,
      s"minDocFreq must be >= 2 (cross-document dedup), got $minDocFreq")
    val anchors = anchorRows(docs, idCol, textCol, k, anchorHexPrefix)
    val marked = if (minDocFreq == 2) {
      // min(doc) ≠ max(doc) over a hash-partitioned window ⟺ ≥2 distinct
      // docs — exact for the default threshold, and it folds the mark into
      // ONE shuffle with no join and a SINGLE evaluation of the anchor
      // lineage (the per-gram md5 scan is the operator's dominant cost; the
      // agg+semi-join diamond below evaluates it twice). Window state is
      // two scalars per hash group, never a per-row collection.
      val byHash = Window.partitionBy(col("__h"))
      anchors
        .withColumn("__dmin", min(col(idCol)).over(byHash))
        .withColumn("__dmax", max(col(idCol)).over(byHash))
        .filter(col("__dmin") =!= col("__dmax"))
        .drop("__dmin", "__dmax")
    } else {
      val dupHashes = anchors
        .groupBy(col("__h"))
        .agg(countDistinct(col(idCol)).alias("__df"))
        .filter(col("__df") >= minDocFreq)
        .select(col("__h"))
      anchors.join(dupHashes, Seq("__h"), "left_semi")
    }
    mergeAnchorIslands(marked, idCol, k)
  }

  /** Anchor `(idCol, __off, __h)` rows of every k-gram whose md5 matches
    * the hex prefix — the fused-kernel front end shared by
    * [[substringDupSpans]], [[anchorIndex]] and [[incrementalDupSpans]]:
    * one pass per document over a reused digest, and the explode is
    * anchor-sized (~len/16^p), not gram-sized.
    * [[gramAnchorsBuiltin]] is the differential twin.
    */
  private def anchorRows(docs: DataFrame, idCol: String, textCol: String,
      k: Int, anchorHexPrefix: String): DataFrame =
    docs
      .select(col(idCol), canonical(col(textCol)).alias("__c"))
      .filter(length(col("__c")) >= k)
      .select(col(idCol),
        explode(org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.functions.expressions.GramAnchors(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("__c")),
            k, anchorHexPrefix))).alias("__a"))
      .select(col(idCol), col("__a").getField("off").alias("__off"),
        col("__a").getField("h").alias("__h"))

  /** Merge marked anchor offsets (gap ≤ k chains through a duplicated run)
    * into `(idCol, span_start, span_end)` islands — the doc-partitioned
    * back end shared by [[substringDupSpans]] and [[incrementalDupSpans]].
    */
  private def mergeAnchorIslands(marked: DataFrame, idCol: String,
      k: Int): DataFrame = {
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("__off"))
    marked
      .withColumn("__brk",
        when(col("__off") - lag(col("__off"), 1).over(byDoc) <= k, lit(0))
          .otherwise(lit(1))) // first row per doc: lag null → otherwise → 1
      .withColumn("__island", sum(col("__brk")).over(byDoc))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("__off")).alias("span_start"),
        (max(col("__off")) + k).alias("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  /** Anchor-hash index of a corpus: the DISTINCT anchor digests — the
    * artifact an incremental substring-dedup pipeline materializes once per
    * corpus snapshot (16 bytes per distinct surviving gram,
    * ~corpus_chars/16^p rows before dedup) and matches every new ingest
    * batch against WITHOUT re-reading corpus text. Membership alone is the
    * cross-document evidence, so the index needs no doc ids or offsets.
    * Written `bucketBy`-partitioned on `h`, the per-batch semi-join stops
    * shuffling the index side at all (the same lever BucketingSpec pins
    * for the merge target).
    *
    * The build parameters are stamped on the `h` column as field metadata
    * (`graft_anchor_k` / `graft_anchor_prefix`, which survive a parquet
    * round-trip): digests from different (k, prefix) can NEVER match, so
    * [[incrementalDupSpans]] validates the stamp instead of silently
    * reporting a clean batch against a mismatched index.
    */
  def anchorIndex(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 40, anchorHexPrefix: String = "0"): DataFrame = {
    require(k >= 1, s"gram length k must be >= 1, got $k")
    require(anchorHexPrefix.length <= 32 && anchorHexPrefix.matches("[0-9a-f]*"),
      s"anchorHexPrefix must be lowercase hex, at most 32 chars (md5 width), got '$anchorHexPrefix'")
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft_anchor_k", k.toLong)
      .putString("graft_anchor_prefix", anchorHexPrefix)
      .build()
    anchorRows(docs, idCol, textCol, k, anchorHexPrefix)
      .select(col("__h").as("h", meta)).distinct()
  }

  /** Incremental substring dedup: spans of NEW documents that duplicate
    * EXISTING corpus content, via an [[anchorIndex]] — linear in the batch,
    * the corpus never re-read (q86's continuous-ingest shape, at substring
    * granularity). A batch anchor marks its offset iff its digest exists in
    * the index; marked offsets island-merge exactly as in
    * [[substringDupSpans]]. The detection contract follows the index's
    * sampling: spans ≫ k·16^p are caught with high probability, and a miss
    * UNDER-reports (conservative for a filter).
    *
    * Caller contract: the index must not contain the batch's own documents
    * (re-ingesting an indexed document would self-match wall-to-wall), and
    * it must have been built with the SAME (k, anchorHexPrefix) — digests
    * from different parameters never match, so a mismatch reads as a
    * falsely clean batch. [[anchorIndex]] stamps its parameters as column
    * metadata; when the stamp is present (it survives parquet) a mismatch
    * fails fast here instead.
    *
    * `bloomPrefilter` builds a bloom over the BATCH's anchor digests (the
    * small side — one broadcast-sized aggregate) and prunes the index scan
    * before the semi-join exchange: almost no index hash occurs in any
    * given batch, so the index-side shuffle shrinks to ~matches + fpp.
    * False positives are discarded by the exact semi-join that follows;
    * exactness is untouched. Size `expectedItems` to the BATCH anchor
    * count, not the index.
    *
    * @return one row per merged span: `(idCol, span_start, span_end)`,
    *         offsets into the batch document's CANONICAL text
    */
  def incrementalDupSpans(newDocs: DataFrame, index: DataFrame,
      idCol: String, textCol: String, k: Int = 40,
      anchorHexPrefix: String = "0",
      bloomPrefilter: Option[BloomConfig] = None): DataFrame = {
    require(k >= 1, s"gram length k must be >= 1, got $k")
    require(anchorHexPrefix.length <= 32 && anchorHexPrefix.matches("[0-9a-f]*"),
      s"anchorHexPrefix must be lowercase hex, at most 32 chars (md5 width), got '$anchorHexPrefix'")
    index.schema.find(_.name == "h").map(_.metadata).foreach { m =>
      if (m.contains("graft_anchor_k"))
        require(m.getLong("graft_anchor_k") == k.toLong,
          s"anchor index was built with k=${m.getLong("graft_anchor_k")} but the " +
            s"query uses k=$k — digests can never match; rebuild or re-query " +
            "with matching gram length")
      if (m.contains("graft_anchor_prefix"))
        require(m.getString("graft_anchor_prefix") == anchorHexPrefix,
          s"anchor index was built with prefix='${m.getString("graft_anchor_prefix")}' " +
            s"but the query uses prefix='$anchorHexPrefix' — the anchor samples " +
            "differ; rebuild or re-query with the matching prefix")
    }
    val anchors = anchorRows(newDocs, idCol, textCol, k, anchorHexPrefix)
    val idx0 = index.select(col("h").alias("__h"))
    val idx = bloomPrefilter match {
      // bloom over the batch side (the small one); empty batch → nothing
      // can join, so the index prunes to empty without an aggregate result
      case Some(cfg) => bloomPruned(idx0, anchors, "__h", cfg,
        onEmpty = idx0.limit(0))
      case None => idx0
    }
    val marked = anchors.join(idx, Seq("__h"), "left_semi")
    mergeAnchorIslands(marked, idCol, k)
  }

  /** Shared broadcast-bloom prefilter ([[containment]] and
    * [[incrementalDupSpans]]): build a bloom over `small`'s `keyCol` hashes
    * (one aggregate job) and prune `big` to might-contain rows with the
    * same native BloomFilterAggregate/MightContain pair Spark's runtime
    * filters use — the membership test stays inside whole-stage codegen.
    * Exactness is untouched: false positives die in the exact equi-join
    * that follows, false negatives cannot occur. Returns `onEmpty` when
    * the small side has no rows (null bloom). Fails loudly when the
    * requested size exceeds the session's runtime-bloom ceilings —
    * BloomFilterAggregate silently clamps, and a clamped filter's realized
    * fpp balloons exactly at the scale the prefilter exists for.
    */
  private def bloomPruned(big: DataFrame, small: DataFrame, keyCol: String,
      cfg: BloomConfig, onEmpty: => DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    val numBits = math.max(64L,
      (-cfg.expectedItems * math.log(cfg.fpp) / (math.log(2) * math.log(2))).toLong)
    val conf = big.sparkSession.conf
    val maxItems = conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(cfg.expectedItems <= maxItems && numBits <= maxBits,
      s"bloom prefilter needs $numBits bits for ${cfg.expectedItems} items, above the " +
        "session's runtime-bloom ceiling; raise spark.sql.optimizer.runtime.bloomFilter." +
        "maxNumItems/maxNumBits or shrink BloomConfig")
    val bloomBin = small.select(ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col(keyCol))),
        Literal(cfg.expectedItems), Literal(numBits))
        .toAggregateExpression()).alias("__bloom")).head().get(0)
    if (bloomBin == null) onEmpty
    else big.filter(ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBin, org.apache.spark.sql.types.BinaryType),
      ColumnBridge.expression(xxhash64(col(keyCol))))))
  }

  /** Builtin-only twin of the fused anchor kernel — the original
    * `explode(sequence)` + `md5(substr)` + `startsWith` formulation, which
    * generates a row per gram and filters 15/16 of them away. Kept for
    * differential testing ([[graft.functions.expressions.GramAnchors]]
    * must emit the same (id, off, md5) set; the kernel's binary digest
    * compares via `hex()`). Input: `(idCol, __c)` with canonical text.
    */
  def gramAnchorsBuiltin(canon: DataFrame, idCol: String, k: Int,
      anchorHexPrefix: String): DataFrame =
    canon
      .select(col(idCol), col("__c"),
        explode(sequence(lit(0), length(col("__c")) - k)).alias("__off"))
      .select(col(idCol), col("__off"),
        md5(col("__c").substr(col("__off") + 1, lit(k))).alias("__h"))
      .filter(if (anchorHexPrefix.isEmpty) lit(true)
              else col("__h").startsWith(anchorHexPrefix))

  /** Apply span removal — the ACTION half of substring dedup: cut every
    * `[span_start, span_end)` region (offsets into the CANONICAL text, as
    * [[substringDupSpans]] emits) out of each document. Policy lives in
    * the caller: pass the spans frame as-is to drop duplicated text
    * everywhere, or pre-filter it (e.g. keep the min-id document's rows
    * out of the frame) for a keep-one-copy corpus.
    *
    * Row-local after one join: spans collect to a per-doc sorted array
    * (bounded by doc length / k — a handful of islands in practice), and
    * the rebuild is a single `aggregate` fold over that array per row —
    * no window, no extra shuffle. Overlapping or touching input spans are
    * clipped in the fold (`stripSpans` never produces negative segments),
    * so any span source is safe, not just island-merged ones.
    *
    * Returns every input document: `(idCol, clean_text, removed_chars)`,
    * `clean_text` being the canonical text with spans cut (unchanged
    * canonical text for documents with no spans).
    */
  def stripSpans(docs: DataFrame, spans: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val spanArr = spans
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(
        col("span_start").alias("s"), col("span_end").alias("e")))).alias("__spans"))
    docs
      .select(col(idCol), canonical(col(textCol)).alias("__c"))
      .join(spanArr, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__spans").isNull, col("__c")).otherwise(
          aggregate(col("__spans"),
            struct(lit(0).alias("pos"), lit("").alias("acc")),
            (acc, sp) => {
              val segLen = greatest(sp.getField("s") - acc.getField("pos"), lit(0))
              struct(
                greatest(acc.getField("pos"), sp.getField("e")).alias("pos"),
                concat(acc.getField("acc"),
                  col("__c").substr(acc.getField("pos") + 1, segLen)).alias("acc"))
            },
            acc => concat(acc.getField("acc"),
              col("__c").substr(acc.getField("pos") + 1,
                length(col("__c")) - acc.getField("pos")))))
          .alias("clean_text"),
        col("__c"))
      .select(col(idCol), col("clean_text"),
        (length(col("__c")) - length(col("clean_text"))).alias("removed_chars"))
  }
}
