package graft
// (TopK aggregate tests appended below)

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Native CosineSimilarity expression: interpreted vs codegen vs built-in
  * formulation, null contracts, SQL registration via GraftExtensions.
  */
class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)), // zero norm
    (4L, Array(2.0f, 2.0f, 2.0f), Array(1.0f, 1.0f, 1.0f))
  ).toDF("id", "a", "b")

  test("native cosine matches the built-in zip_with/aggregate formulation bit-for-bit") {
    val both = vecs.select(
      $"id",
      Similarity.cosine($"a", $"b").alias("native"),
      Similarity.cosineBuiltin($"a", $"b").alias("builtin"))
    both.collect().foreach { r =>
      val n = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      val b = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      assert(n == b, s"row ${r.getLong(0)}")
    }
  }

  test("null contracts: zero-norm vector and null input → null; parallel → 1") {
    val out = vecs.select($"id", Similarity.cosine($"a", $"b").alias("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(2L).contains(0.0))
    assert(out(3L).isEmpty)
    assert(math.abs(out(4L).get - 1.0) < 1e-12)
    val withNull = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b").select(Similarity.cosine($"a", $"b").alias("c"))
    assert(withNull.head().isNullAt(0))
  }

  test("works on double arrays and codegen path survives wide rows") {
    val d = (1 to 200).map(i => (i.toLong, Array.tabulate(64)(j => (i + j).toDouble),
      Array.tabulate(64)(j => (i * j + 1).toDouble))).toDF("id", "a", "b")
    val n = d.select(Similarity.cosine($"a", $"b").alias("c"))
      .filter($"c".isNotNull).count()
    assert(n == 200)
  }

  test("twins agree on null text: simhash and minhash signature both null") {
    import graft.operators.Dedup
    val df = Seq(Option.empty[String], Some("hello world")).toDF("text")
    val out = df.select(
      Dedup.simhash($"text").alias("n_sh"),
      Dedup.simhashBuiltin($"text").alias("b_sh"),
      Dedup.minhashSignature($"text", 4).alias("n_mh"),
      Dedup.minhashSignatureOfHashes(
        transform(Dedup.shingles($"text"), Dedup.shingleHash(_)), 4).alias("b_mh"))
    val rows = out.collect()
    val nullRow = rows(0)
    assert(nullRow.isNullAt(0) && nullRow.isNullAt(1) &&
      nullRow.isNullAt(2) && nullRow.isNullAt(3))
    val liveRow = rows(1)
    assert(!liveRow.isNullAt(0) && liveRow.getLong(0) == liveRow.getLong(1))
  }

  test("native cosine matches builtin on null elements and ragged dims (both null)") {
    val df = Seq(
      (Seq(Some(1.0), None), Seq(Some(1.0), Some(1.0))),  // null element
      (Seq(Some(1.0), Some(2.0)), Seq(Some(1.0)))          // ragged dims
    ).toDF("a", "b")
    val out = df.select(
      Similarity.cosine($"a", $"b").alias("n"),
      Similarity.cosineBuiltin($"a", $"b").alias("bt")).collect()
    out.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1)))
  }

  test("native SimHash kernel matches the builtin bit-vote formulation") {
    import graft.operators.Dedup
    val texts = Seq(
      "the quick brown fox", "the quick brown cat",
      "spark engines at scale", "a", "").toDF("text")
    val both = texts.select(
      Dedup.simhash($"text").alias("native"),
      Dedup.simhashBuiltin($"text").alias("builtin"))
    both.collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("native Int8Quantize matches the builtin three-pass formulation incl. edge cases") {
    val cases = Seq(
      (1L, Array[java.lang.Float](1.0f, -2.0f, 0.5f)),
      (2L, Array[java.lang.Float](0.0f, 0.0f)),          // zero vector → scale 0
      (3L, Array.empty[java.lang.Float]),                // empty → scale 0, []
      (4L, null),                                        // null vector → struct(0.0, null)
      (5L, Array[java.lang.Float](3.5f, null, -3.5f)),   // null ELEMENT skipped, null code
      (6L, Array[java.lang.Float](-127.0f)),             // boundary: single negative max
      (7L, Array[java.lang.Float](1e-30f, -1e30f))       // extreme magnitudes
    ).toDF("id", "v")
    // BOTH evaluation paths, differentially: CODEGEN_ONLY (a Janino failure
    // in doGenCode must FAIL, not silently fall back) and NO_CODEGEN (the
    // hand-written interpreted eval() is just as load-bearing — constant
    // folding and post-fallback production paths run it)
    def collectIn(mode: String) = {
      val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try cases.select($"id",
        Similarity.quantizeInt8($"v").alias("native"),
        Similarity.quantizeInt8Builtin($"v").alias("builtin")).collect()
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    val rows = collectIn("CODEGEN_ONLY") ++ collectIn("NO_CODEGEN")
    rows.foreach { r =>
      val n = r.getStruct(1); val b = r.getStruct(2)
      assert(n.getDouble(0) == b.getDouble(0), s"scale mismatch on id ${r.getLong(0)}: $n vs $b")
      assert((n.isNullAt(1), b.isNullAt(1)) match {
        case (true, true) => true
        case (false, false) => n.getSeq[Any](1) == b.getSeq[Any](1)
        case _ => false
      }, s"codes mismatch on id ${r.getLong(0)}: $n vs $b")
    }
    // the round-trip contract survives the kernel swap
    val emb = Tables.load(spark, sfDir, "embeddings").limit(50)
    val rt = emb.select(Similarity.cosine($"embedding",
      Similarity.dequantizeInt8(Similarity.quantizeInt8($"embedding"))).alias("c"))
      .agg(org.apache.spark.sql.functions.min($"c")).head().getDouble(0)
    assert(rt > 0.999, s"quantize/dequantize round-trip degraded: min cosine $rt")
  }

  test("native Int8Dequantize matches the builtin twin incl. its corner branches") {
    import org.apache.spark.sql.functions.{array, expr, lit, struct}
    // hand-built structs hit branches quantize never emits: scale 0 with
    // non-null codes (incl. a null element), null scale, null codes
    val cases = spark.range(1).select(
      struct(lit(63.5).alias("scale"),
        array(lit(64.toByte), lit(null).cast("byte"), lit(-127.toByte)).alias("codes"))
        .alias("normal"),
      struct(lit(0.0).alias("scale"),
        array(lit(5.toByte), lit(null).cast("byte")).alias("codes")).alias("zeroScale"),
      struct(lit(null).cast("double").alias("scale"),
        array(lit(1.toByte)).alias("codes")).alias("nullScale"),
      struct(lit(1.0).alias("scale"),
        lit(null).cast("array<tinyint>").alias("codes")).alias("nullCodes"),
      expr("CAST(null AS struct<scale: double, codes: array<tinyint>>)").alias("nullStruct"))
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      val r =
        try cases.select(
          cases.columns.toSeq.flatMap(c => Seq(
            Similarity.dequantizeInt8(org.apache.spark.sql.functions.col(c)).alias(s"n_$c"),
            Similarity.dequantizeInt8Builtin(org.apache.spark.sql.functions.col(c)).alias(s"b_$c"))): _*)
          .head()
        finally prev match {
          case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
          case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
        }
      cases.columns.indices.foreach { i =>
        val (n, b) = (2 * i, 2 * i + 1)
        val nv = if (r.isNullAt(n)) null else r.getSeq[Any](n)
        val bv = if (r.isNullAt(b)) null else r.getSeq[Any](b)
        assert(nv == bv, s"$mode ${cases.columns(i)}: native=$nv builtin=$bv")
      }
    }
  }

  test("GraftExtensions registers SQL functions: cosine_similarity, graft_hash_id, text kernels") {
    // a fresh session over the shared context so withExtensions applies
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import ext.implicits._
      Seq((Array(1.0, 2.0), Array(2.0, 4.0), "42"))
        .toDF("a", "b", "s").createOrReplaceTempView("v_ext")
      val r = ext.sql(
        "SELECT cosine_similarity(a, b) AS c, graft_hash_id(s) AS h, graft_hash_id('') AS e FROM v_ext")
        .head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(r.getString(1) == "92cfceb39d57d914ed8b14d0e37643de0797ae56")
      assert(r.isNullAt(2))
      val k = ext.sql(
        """SELECT word_shingles('a b c d') AS sh,
          |       minhash_sig(word_shingles('a b c d'), 2) AS sig,
          |       size(hashed_tokens('x y x')) AS nt,
          |       graft_simhash('hello world') AS fp,
          |       text_profile('The quick fox!').lang_pred AS lang,
          |       text_profile('The quick fox!').n_tokens_ws AS ntok""".stripMargin).head()
      assert(k.getSeq[String](0) == Seq("a b c", "b c d"))
      assert(k.getSeq[Long](1).length == 2)
      assert(k.getInt(2) == 2)
      assert(k.getLong(3) != 0L)
      assert(k.getString(4) == "en")
      assert(k.getInt(5) == 3)
      val qz = ext.sql(
        "SELECT int8_quantize(array(1.0D, -2.0D)) AS q").head().getStruct(0)
      assert(qz.getDouble(0) == 63.5)
      assert(qz.getSeq[Byte](1) == Seq(64.toByte, (-127).toByte))
      val dq = ext.sql(
        "SELECT int8_dequantize(int8_quantize(array(1.0D, -2.0D))) AS d")
        .head().getSeq[Double](0)
      assert(dq == Seq(64.0 / 63.5, -2.0))
      // gram_anchors: exact mode emits every gram with its digest;
      // default prefix samples. pii_scrub: clean text + staged counts.
      val ga = ext.sql(
        """SELECT size(gram_anchors('abcdef', 3, '')) AS n_exact,
          |       gram_anchors('abcdef', 3, '')[0].off AS off0,
          |       hex(gram_anchors('abcdef', 3, '')[0].h) = upper(md5('abc')) AS h_ok,
          |       pii_scrub('mail a@b.co from 10.0.0.1').clean_text AS clean,
          |       pii_scrub('mail a@b.co from 10.0.0.1').n_email AS ne,
          |       pii_scrub('mail a@b.co from 10.0.0.1').n_ipv4 AS ni""".stripMargin).head()
      assert(ga.getInt(0) == 4 && ga.getInt(1) == 0 && ga.getBoolean(2))
      assert(ga.getString(3) == "mail <EMAIL> from <IP>")
      assert(ga.getInt(4) == 1 && ga.getInt(5) == 1)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("topk aggregate matches the window top-N idiom across many partitions") {
    import graft.functions.Functions
    val df = spark.read.parquet(s"$sfDir/orders.parquet").repartition(7)
    val agg = df.groupBy($"o_custkey")
      .agg(Functions.topK($"o_totalprice", 3).alias("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_totalprice".desc)
    val win = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .groupBy($"o_custkey").agg(sort_array(collect_list($"o_totalprice"), asc = false).alias("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(agg.keySet == win.keySet && agg.forall { case (k, v) => win(k) == v })
  }

  test("topk: nulls skipped, ascending mode, strings, buffer prune past 2k elems") {
    import graft.functions.Functions
    val df = (1 to 500).map(i => (1L, Some(i.toDouble))).toDF("g", "v")
      .union(Seq((1L, Option.empty[Double]), (2L, Some(9.0))).toDF("g", "v"))
      .repartition(5)
    val out = df.groupBy($"g")
      .agg(Functions.topK($"v", 2).alias("top"),
        Functions.topK($"v", 2, descending = false).alias("bottom"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Double](1), r.getSeq[Double](2))).toMap
    assert(out(1L) == ((Seq(500.0, 499.0), Seq(1.0, 2.0))))
    assert(out(2L) == ((Seq(9.0), Seq(9.0))))
    val s = Seq(("x", "pear"), ("x", "apple"), ("x", "mango"))
      .toDF("g", "v").groupBy($"g").agg(Functions.topK($"v", 2).alias("top"))
      .head().getSeq[String](1)
    assert(s == Seq("pear", "mango"))
  }

  test("topKBy returns payloads of the k best rows by value") {
    import graft.functions.Functions
    val df = Seq((1L, 5.0, "five"), (1L, 9.0, "nine"), (1L, 7.0, "seven"), (2L, 1.0, "one"))
      .toDF("g", "v", "tag")
    val out = df.groupBy($"g")
      .agg(Functions.topKBy($"v", $"tag", 2).alias("top"),
        Functions.topKBy($"v", $"tag", 1, descending = false).alias("worst"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[String](1), r.getSeq[String](2))).toMap
    assert(out(1L) == ((Seq("nine", "seven"), Seq("five"))))
    assert(out(2L) == ((Seq("one"), Seq("one"))))
  }

  test("native hyperplane bucketing matches the HOF twin across shapes and bands") {
    // deterministic pseudo-random fixture: dims 0..67 (empty, shorter and
    // longer than a plane slice boundary would care about), null ELEMENTS
    // every 7th row, a NULL vector row; both formulations must agree
    // bit-for-bit including the null-vec→0 and empty-vec→all-bits contracts
    val rows = (0 until 60).map { i =>
      val dim = i % 17 * 4 // 0, 4, ..., 64
      val v =
        if (i % 19 == 3) null
        else Array.tabulate(dim) { j =>
          if (i % 7 == 2 && j % 5 == 1) null
          else java.lang.Float.valueOf(
            (Similarity.planeComponent(i + 100, j) * 3).toFloat)
        }
      (i.toLong, v)
    }
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => org.apache.spark.sql.Row(r._1, r._2)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))))
    Seq((6, 0), (6, 1), (4, 2), (1, 0)).foreach { case (planes, band) =>
      val both = df.select($"id",
        Similarity.hyperplaneBucket($"v", planes, maxDims = 64, band = band).alias("native"),
        Similarity.hyperplaneBucketBuiltin($"v", planes, maxDims = 64, band = band).alias("builtin"))
      both.collect().foreach { r =>
        assert(!r.isNullAt(1) && !r.isNullAt(2),
          s"bucket must never be null (planes=$planes band=$band id=${r.getLong(0)})")
        assert(r.getLong(1) == r.getLong(2),
          s"planes=$planes band=$band id=${r.getLong(0)}: " +
            s"native=${r.getLong(1)} builtin=${r.getLong(2)}")
      }
    }
    // empty vector: every plane dot is 0.0 → all numPlanes bits set
    val emptyBucket = df.filter(size($"v") === 0)
      .select(Similarity.hyperplaneBucket($"v", 6, 64).alias("b")).head().getLong(0)
    assert(emptyBucket == 63L)
    // null vector: bucket 0 (the composed form's otherwise(0) per plane)
    val nullBucket = df.filter($"v".isNull)
      .select(Similarity.hyperplaneBucket($"v", 6, 64).alias("b")).head().getLong(0)
    assert(nullBucket == 0L)
  }

  test("topk is SQL-callable via GraftExtensions") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import ext.implicits._
      Seq((1L, 5.0), (1L, 9.0), (1L, 7.0)).toDF("g", "v").createOrReplaceTempView("v_topk")
      val r = ext.sql("SELECT g, topk(v, 2) AS t, topk(v, 2, false) AS b FROM v_topk GROUP BY g")
        .head()
      assert(r.getSeq[Double](1) == Seq(9.0, 7.0))
      assert(r.getSeq[Double](2) == Seq(5.0, 7.0))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
