package graft

import org.scalacheck.Gen
import graft.core.Deployment
import graft.sources.SqlScript

/** Property-based contracts (SURVEY §5.2 item 2), via scalacheck generators
  * sampled in-suite (no scalatestplus bridge needed offline). Spark-bound
  * fixpoint properties live in NormalizeSpec with adversarial nested cases.
  */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int = 200, seedBase: Long = 0L): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seedBase + i.toLong)))

  test("C2 deployment: never runs when both flags off; env-unset runs iff any flag on") {
    val envs = Gen.option(Gen.oneOf("prod", "dev", "staging", "", "PROD"))
    samples(envs).foreach { env =>
      assert(!Deployment.shouldRun(env, prod = false, dev = false))
    }
    for (p <- Seq(true, false); d <- Seq(true, false))
      assert(Deployment.shouldRun(None, p, d) == (p || d))
  }

  test("C2 deployment: prod-only and dev-only are mirror images over all envs") {
    samples(Gen.oneOf("prod", "dev")).foreach { env =>
      assert(Deployment.shouldRun(Some(env), prod = true, dev = false) == (env == "prod"))
      assert(Deployment.shouldRun(Some(env), prod = false, dev = true) == (env == "dev"))
    }
  }

  test("F9 render: brace-free templates pass through unchanged") {
    samples(Gen.listOf(Gen.alphaNumStr).map(_.mkString(" "))).foreach { t =>
      assert(SqlScript.render(t, Map.empty) == t)
    }
  }

  test("F9 render: substitution is exhaustive — no placeholder survives") {
    val names = Gen.nonEmptyListOf(Gen.identifier.suchThat(_.nonEmpty)).map(_.distinct)
    samples(names, 100).foreach { ns =>
      val template = ns.map(n => s"{$n}").mkString(" + ")
      val rendered = SqlScript.render(template, ns.map(n => n -> s"v_$n").toMap)
      assert(!rendered.contains("{"))
      ns.foreach(n => assert(rendered.contains(s"v_$n")))
    }
  }

  test("keyset offset: json round-trip is identity over arbitrary unicode values") {
    import graft.sources.KeysetOffset
    val values = Gen.option(Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('"', '\\', '\n', '\t', '{', '}', ':', ','),
      Gen.choose(' ', '퟿'))).map(_.mkString))
    samples(values, 300).foreach { v =>
      val off = KeysetOffset(v)
      assert(KeysetOffset.fromJson(off.json()) == off, s"value: $v")
    }
  }

  test("U1-ish: merge PK-string parsing tolerates arbitrary whitespace") {
    samples(Gen.nonEmptyListOf(Gen.identifier.suchThat(_.nonEmpty)), 100).foreach { cols =>
      val joined = cols.mkString(" , ")
      assert(graft.operators.Upsert.parsePkColumns(joined) == cols)
    }
  }

  test("text kernels ≡ builtin twins on arbitrary unicode-ish text") {
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, TextAnalysis}
    import spark.implicits._
    // words over several scripts + whitespace variants + punctuation
    val word = Gen.oneOf(
      Gen.alphaNumStr.suchThat(_.nonEmpty),
      Gen.oneOf("the", "und", "la", "de", "的", "è", "ñandú", "Straße", "!?;", "a.b,c"),
      Gen.listOfN(3, Gen.oneOf('一', '人', '大', 'Ж', 'ü', 'É')).map(_.mkString))
    val ws = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val text = for {
      n <- Gen.choose(0, 30)
      words <- Gen.listOfN(n, word)
      seps <- Gen.listOfN(math.max(n - 1, 0), ws)
      lead <- Gen.oneOf("", " ", "\t")
    } yield lead + words.zipAll(seps, "", "").map { case (w, s) => w + s }.mkString
    val texts = samples(text, 300)
    val df = texts.toDF("text")
    val rows = df.select(
      Dedup.shingles($"text").alias("sh_n"), Dedup.shinglesBuiltin($"text").alias("sh_b"),
      Dedup.simhashTokenHashes($"text").alias("ht_n"),
      Dedup.simhashTokenHashesBuiltin($"text").alias("ht_b"),
      TextAnalysis.tokenCountWhitespace($"text").alias("ws_n"),
      TextAnalysis.tokenCountWhitespaceBuiltin($"text").alias("ws_b"),
      TextAnalysis.punctRatio($"text").alias("pr_n"),
      TextAnalysis.punctRatioBuiltin($"text").alias("pr_b"),
      TextAnalysis.meanWordLength($"text").alias("mwl_n"),
      TextAnalysis.meanWordLengthBuiltin($"text").alias("mwl_b"),
      TextAnalysis.langId($"text").alias("lg_n"),
      TextAnalysis.langIdBuiltin($"text").alias("lg_b"),
      $"text").collect()
    rows.foreach { r =>
      for (base <- Seq(0, 2, 4, 6, 8, 10)) {
        assert(r.isNullAt(base) == r.isNullAt(base + 1),
          s"null mismatch field $base for text=${r.get(12)}")
        if (!r.isNullAt(base))
          assert(r.get(base) == r.get(base + 1),
            s"field $base for text=${r.get(12)}: ${r.get(base)} != ${r.get(base + 1)}")
      }
    }
  }

  test("GramAnchors ≡ builtin explode+md5(substr) on arbitrary unicode-ish text") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import spark.implicits._
    // mixed-width scripts stress the codepoint→byte offset table (the one
    // place the kernel could diverge from substr's codepoint semantics)
    val piece = Gen.oneOf(
      Gen.alphaNumStr, Gen.oneOf("大家 好", "grüße", "北京 city", "  tab\t",
        "a@b.c 10.0.0.1", "ёж λambda", "🎉🚀 ok 🦄"),
      Gen.listOfN(5, Gen.oneOf('一', 'ü', 'x', ' ', 'Ж')).map(_.mkString))
    val text = for {
      n <- Gen.choose(0, 12)
      ps <- Gen.listOfN(n, piece)
    } yield ps.mkString(" ")
    val docs = samples(text, 150).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for ((k, prefix) <- Seq((5, ""), (5, "0"), (3, "ab"))) {
      val canon = docs.select($"id", Dedup.canonical($"text").alias("__c"))
        .filter(length($"__c") >= k)
      val native = canon
        .select($"id", explode(ColumnBridge.column(
          graft.functions.expressions.GramAnchors(
            ColumnBridge.expression($"__c"), k, prefix))).alias("__a"))
        .select($"id", $"__a.off", lower(hex($"__a.h")))
        .as[(Long, Int, String)].collect().toSet
      val builtin = Dedup.gramAnchorsBuiltin(canon, "id", k, prefix)
        .as[(Long, Int, String)].collect().toSet
      assert(native == builtin, s"k=$k prefix='$prefix'")
    }
  }

  test("sampling: rate monotonicity (lower rate selects a subset) and bounds") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1L to 2000L).toDF("id")
    val r10 = graft.operators.Sampling.hashSample(df, Seq(col("id")), 0.1)
      .as[Long].collect().toSet
    val r30 = graft.operators.Sampling.hashSample(df, Seq(col("id")), 0.3)
      .as[Long].collect().toSet
    assert(r10.subsetOf(r30))
    // md5 buckets are uniform: 10% ± a generous band
    assert(r10.size > 100 && r10.size < 300, s"10% sample picked ${r10.size}/2000")
    assert(graft.operators.Sampling.hashSample(df, Seq(col("id")), 0.0).count() == 0)
    assert(graft.operators.Sampling.hashSample(df, Seq(col("id")), 1.0).count() == 2000)
  }

  test("topk ≡ sort-and-take-k for arbitrary grouped data with nulls and NaN") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = for {
      g <- Gen.choose(1L, 6L)
      v <- Gen.frequency(
        (8, Gen.choose(-100.0, 100.0).map(Option(_))),
        (1, Gen.const(Option(Double.NaN))),
        (1, Gen.const(Option.empty[Double])))
    } yield (g, v)
    val data = samples(gen, 400)
    val df = data.toDF("g", "v").repartition(7)
    val got = df.groupBy($"g")
      .agg(graft.functions.Functions.topK($"v", 3).alias("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    // expected: per group, non-null values sorted by Spark's ordering
    // (NaN greatest), descending, take 3
    val expect = data.groupBy(_._1).map { case (g, rows) =>
      g -> rows.flatMap(_._2)
        .sorted(Ordering.fromLessThan[Double](java.lang.Double.compare(_, _) > 0))
        .take(3).toSeq
    }
    got.foreach { case (g, vs) =>
      // compare via java compare to make NaN == NaN
      val e = expect(g)
      assert(vs.size == e.size &&
        vs.zip(e).forall { case (a, b) => java.lang.Double.compare(a, b) == 0 },
        s"group $g: got $vs want $e")
    }
    assert(got.keySet == expect.keySet)
  }

  test("scd2: intervals tile each key's timeline (no overlap, no gap, one current)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = for {
      k <- Gen.choose(1L, 5L)
      ts <- Gen.choose(0L, 50L)
      attr <- Gen.oneOf("A", "B", "C")
    } yield (k, attr, new java.sql.Timestamp(ts * 3600000L))
    val rowsIn = samples(gen, 120).distinct.zipWithIndex
      .map { case ((k, a, ts), i) => (k, a, ts, i.toLong) }
    val df = rowsIn.toDF("k", "attr", "ts", "id")
    val out = graft.operators.Scd2
      .fromChangeLog(df, Seq("k"), "ts", Seq("attr"), Seq("id"))
      .select(col("k"), col("valid_from"), col("valid_to"), col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), Option(r.getTimestamp(2)), r.getBoolean(3)))
      .groupBy(_._1)
    out.foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2.getTime, r._3.map(_.getTime).getOrElse(Long.MaxValue)))
      sorted.init.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._3.nonEmpty, "only the last interval may be open")
        assert(a._3.get.getTime <= b._2.getTime, "intervals must not overlap")
      }
      assert(sorted.count(_._4) == 1 && sorted.last._4, "exactly one current row, the last")
      assert(sorted.last._3.isEmpty, "current row must be open-ended")
    }
  }

  test("chunk invariants: full coverage, exact overlap, bounded windows, reassembly") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    import spark.implicits._
    val cases = for {
      n <- Gen.choose(0, 120)
      chunkTokens <- Gen.choose(2, 20)
      overlap <- Gen.choose(0, chunkTokens - 1)
    } yield (n, chunkTokens, overlap)
    samples(cases, 60).foreach { case (n, chunkTokens, overlap) =>
      val text = (1 to n).map(i => s"w$i").mkString(" ")
      val out = TextAnalysis.chunk(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", chunkTokens, overlap)
        .orderBy("chunk_id")
        .as[(Long, Long, Long, String)].collect()
      val stride = chunkTokens - overlap
      if (n == 0) assert(out.isEmpty, s"empty doc must produce no chunks ($chunkTokens/$overlap)")
      else {
        val ctx = s"n=$n chunk=$chunkTokens overlap=$overlap"
        assert(out.map(_._2).toSeq == out.indices.map(_.toLong), s"dense chunk ids: $ctx")
        // every window is non-empty, at most chunkTokens, and only the last may be short
        assert(out.forall(c => c._3 >= 1 && c._3 <= chunkTokens), ctx)
        assert(out.dropRight(1).forall(_._3 == chunkTokens), s"only last chunk short: $ctx")
        // window i starts at token i*stride — consecutive chunks overlap exactly
        out.foreach { c =>
          val start = (c._2 * stride).toInt
          val want = (start + 1 to math.min(start + chunkTokens, n)).map(i => s"w$i")
          assert(c._4 == want.mkString(" "), s"window ${c._2}: $ctx")
        }
        // reassembly: stripping each window's first `overlap` tokens (except
        // chunk 0) reconstructs the document exactly — nothing lost or doubled
        val rebuilt = out.zipWithIndex.flatMap { case (c, i) =>
          val toks = c._4.split(" ").toSeq
          if (i == 0) toks else toks.drop(overlap)
        }
        assert(rebuilt.toSeq == (1 to n).map(i => s"w$i"), s"reassembly: $ctx")
      }
    }
  }

  test("PQ invariants: codes in range, ADC self-score is the per-subspace minimum sum") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import spark.implicits._
    val vecGen = for {
      dim <- Gen.oneOf(4, 6, 8, 16) // 6 forces the m=2 layout below
      v <- Gen.listOfN(dim, Gen.choose(-1.0f, 1.0f))
    } yield v.toArray
    samples(Gen.listOfN(12, vecGen), 8).zipWithIndex.foreach { case (vecs0, seed) =>
      // one dim per corpus (PQ requires uniform dims); m divides dim
      val dim = vecs0.head.length
      val vecs = vecs0.filter(_.length == dim)
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      val m = if (dim % 4 == 0) 4 else 2
      val cb = Similarity.pqCodebook(df, m, k = math.min(vecs.length, 7))
      val enc = ColumnBridge.column(
        graft.functions.expressions.PqEncode(ColumnBridge.expression($"embedding"), cb))
      val tab = ColumnBridge.column(
        graft.functions.expressions.PqDistTable(ColumnBridge.expression($"embedding"), cb))
      val score = ColumnBridge.column(graft.functions.expressions.PqAdcScore(
        ColumnBridge.expression($"__tab"), ColumnBridge.expression($"__codes")))
      val rows = df.select($"vec_id", enc.alias("__codes"), tab.alias("__tab"))
        .withColumn("self_score", score)
        .as[(Long, Seq[Byte], Seq[Double], Double)].collect()
      val k = cb(0).length
      rows.foreach { case (id, codes, table, self) =>
        assert(codes.length == m && codes.forall(j => j >= 0 && j < k), s"seed=$seed id=$id")
        assert(table.length == m * k && table.forall(_ >= 0.0), s"seed=$seed id=$id")
        // a vector's own codes pick each subspace's minimal table entry, so
        // its self ADC score is the global minimum over any code assignment
        val minSum = (0 until m).map(s => table.slice(s * k, (s + 1) * k).min).sum
        assert(math.abs(self - minSum) < 1e-12, s"seed=$seed id=$id: $self != $minSum")
      }
    }
  }

  test("toMixture: realized proportions hit the target within bucket granularity; binding stratum keeps all rows") {
    import graft.operators.Sampling
    import spark.implicits._
    import org.apache.spark.sql.functions.when
    // skewed synthetic strata: a=6000, b=3000, c=900 rows; target 50/30/20.
    // binding stratum = c (900/0.2 = 4500 < 6000/0.5, 3000/0.3) → c rate 1,
    // feasible corpus 4500, expect ~2250/1350/900
    val df = spark.range(0, 9900).select($"id",
      when($"id" < 6000, "a").when($"id" < 9000, "b").otherwise("c").alias("st"))
    val out = Sampling.toMixture(df, "st", Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), Seq($"id"))
      .groupBy($"st").count().as[(String, Long)].collect().toMap
    assert(out("c") == 900L, s"binding stratum must sample at rate 1: $out")
    // hash buckets are uniform ±sampling noise; 1e-4 threshold quantization
    // plus binomial noise at n≈2k ⇒ 5% tolerance
    assert(math.abs(out("a") - 2250.0) / 2250.0 < 0.05, s"got $out")
    assert(math.abs(out("b") - 1350.0) / 1350.0 < 0.05, s"got $out")
    // reproducible on any layout: same rows after a repartition
    val again = Sampling.toMixture(df.repartition(13), "st",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), Seq($"id"))
      .select($"id").as[Long].collect().sorted
    val first = Sampling.toMixture(df, "st",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), Seq($"id"))
      .select($"id").as[Long].collect().sorted
    assert(java.util.Arrays.equals(first, again))
  }

  test("toMixture guards: weights sum to 1, in (0,1], weighted stratum must have rows") {
    import graft.operators.Sampling
    import spark.implicits._
    val df = Seq((1L, "en"), (2L, "de")).toDF("id", "st")
    intercept[IllegalArgumentException](
      Sampling.toMixture(df, "st", Map("en" -> 0.5, "de" -> 0.4), Seq($"id")))
    intercept[IllegalArgumentException](
      Sampling.toMixture(df, "st", Map("en" -> 1.5, "de" -> -0.5), Seq($"id")))
    intercept[IllegalArgumentException](
      Sampling.toMixture(df, "st", Map("en" -> 0.5, "fr" -> 0.5), Seq($"id")))
  }

  test("PQ Lloyd refinement: total distortion is monotone non-increasing per pass") {
    import graft.operators.Similarity
    import spark.implicits._
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map(_._2.map(_.toDouble).toArray)
    val df = Tables.load(spark, sfDir, "embeddings")
    val (m, sub) = (8, 8)
    // distortion under codebook cb = Σ_v Σ_s min_j L2²(v_s, cb[s][j]) —
    // computed driver-side in plain Scala so the property is independent
    // of the distributed implementation it checks
    def distortion(cb: Array[Array[Array[Double]]]): Double =
      vecs.map { v =>
        (0 until m).map { s =>
          cb(s).map { c =>
            var d = 0.0
            var t = 0
            while (t < sub) { val diff = v(s * sub + t) - c(t); d += diff * diff; t += 1 }
            d
          }.min
        }.sum
      }.sum
    val byIter = (0 to 3).map(i =>
      distortion(Similarity.pqCodebook(df, m, k = 16, refineIters = i)))
    byIter.sliding(2).foreach { case Seq(prev, next) =>
      // exact Lloyd is monotone; DECIMAL(30,6) mean rounding can nudge a
      // centroid by ≤5e-7 per component, so allow proportional slack
      assert(next <= prev * (1 + 1e-9) + 1e-6, s"distortion increased: $byIter")
    }
    assert(byIter.last < byIter.head, s"refinement never helped: $byIter")
  }

  test("fuzzy blocking: EVERY single-edit pair is a candidate, at every string length") {
    import spark.implicits._
    // random canonical-alphabet strings + one random edit each — the
    // blocking guarantee (prefix/suffix windows for long strings, deletion
    // neighborhood for short ones, window keys across the length boundary)
    // must produce every planted pair regardless of edit position
    val alpha = Gen.choose('a', 'z')
    val strGen = for {
      len <- Gen.choose(1, 24)
      cs <- Gen.listOfN(len, alpha)
    } yield cs.mkString
    val editGen = for {
      s <- strGen
      op <- Gen.choose(0, 2)
      // inserts may land AT the end (pos = len) — the append case perturbs
      // the suffix window most; delete/substitute clamp to an existing char
      pos <- Gen.choose(0, s.length)
      ch <- alpha
    } yield {
      val cp = math.min(pos, s.length - 1)
      val edited = op match {
        case 0 => s.substring(0, pos) + ch + s.substring(pos) // insert
        case 1 if s.length > 1 => s.substring(0, cp) + s.substring(cp + 1) // delete
        case _ => s.substring(0, cp) + ch + s.substring(cp + 1) // substitute
      }
      (s, edited)
    }
    val cases = samples(editGen, 120).zipWithIndex
      .filter { case ((a, b), _) => a != b } // substitution may pick the same char
    val rows = cases.flatMap { case ((a, b), i) =>
      Seq((i.toLong * 2, a, i), (i.toLong * 2 + 1, b, i))
    }.toDF("id", "name", "case_id")
    val pairs = graft.operators.FuzzyMatch.blockedCandidatePairs(
      rows, "id", "name", maxBlockSize = 100000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val missing = cases.filter { case (_, i) =>
      !pairs.contains((i.toLong * 2, i.toLong * 2 + 1))
    }
    assert(missing.isEmpty,
      s"single-edit pairs not blocked together: ${missing.take(5).map(_._1)}")
  }

  test("incremental rollup: random churn converges to the from-scratch aggregation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.IncrementalRollup
    import graft.sources.SnapshotManifest
    val grpGen = Gen.oneOf("a", "b", "c", "d")
    val rowGen = for { g <- grpGen; x <- Gen.choose(-50, 50) } yield (g, x.toDouble)
    (0 until 3).foreach { trial =>
      val root = java.nio.file.Files.createTempDirectory(s"proproll$trial").toString
      val v0rows = samples(rowGen, 40, seedBase = trial * 1000L)
        .zipWithIndex.map { case ((g, x), i) => (i.toLong, g, x) }
      // churn: drop ids ≡ 0 (mod 3), rewrite ids ≡ 1 (group move + value),
      // insert a fresh tail
      val v1rows = v0rows.filter(_._1 % 3 != 0).map {
        case (id, g, x) if id % 3 == 1 => (id, if (g == "a") "b" else "a", x + 7.5)
        case r => r
      } ++ samples(rowGen, 10, seedBase = trial * 1000L + 500L)
        .zipWithIndex.map { case ((g, x), i) => (1000L + i, g, x) }
      val aggs = Seq(count(lit(1)).alias("n"),
        sum($"x".cast("decimal(30,6)")).cast("double").alias("sum_x"),
        min($"x").alias("min_x"))
      val (src, roll) = (s"$root/src", s"$root/roll")
      SnapshotManifest.commit(spark, src, v0rows.toDF("id", "grp", "x"))
      IncrementalRollup.refresh(spark, src, roll, Seq("id"), Seq("grp"), aggs)
      SnapshotManifest.commit(spark, src, v1rows.toDF("id", "grp", "x"))
      IncrementalRollup.refresh(spark, src, roll, Seq("id"), Seq("grp"), aggs)
      val expected = v1rows.toDF("id", "grp", "x")
        .groupBy($"grp").agg(aggs.head, aggs.tail: _*)
        .as[(String, Long, Double, Double)].collect().toSet
      val got = IncrementalRollup.read(spark, roll)
        .as[(String, Long, Double, Double)].collect().toSet
      assert(got == expected, s"trial $trial diverged")
    }
  }

  test("change feed reconstructs the target: old + feed = new, for arbitrary commits") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.sources.SnapshotManifest
    // random PK-unique v0; v1 = random subset deleted, random subset
    // updated, random new keys inserted (committed as a whole-table
    // replace). The feed between them must reconstruct v1 from v0 exactly.
    val genCase = for {
      keys0 <- Gen.listOfN(40, Gen.choose(0L, 60L)).map(_.distinct)
      dels <- Gen.someOf(keys0)
      upds <- Gen.someOf(keys0)
      ins <- Gen.listOfN(8, Gen.choose(100L, 130L)).map(_.distinct)
    } yield (keys0, dels.toSet, upds.toSet -- dels.toSet, ins)
    samples(genCase, n = 5, seedBase = 777L).zipWithIndex.foreach {
      case ((keys0, dels, upds, ins), trial) =>
        val root = java.nio.file.Files.createTempDirectory(s"cdf_prop$trial").toString
        val v0 = keys0.map(k => (k, s"v$k", k * 1.0)).toDF("id", "x", "v")
        val v1rows = keys0.filterNot(dels.contains).map { k =>
          if (upds.contains(k)) (k, s"u$k", k * 2.0) else (k, s"v$k", k * 1.0)
        } ++ ins.map(k => (k, s"i$k", k * 3.0))
        val v1 = v1rows.toDF("id", "x", "v")
        SnapshotManifest.commit(spark, root, v0.repartitionByRange(3, $"id"))
        SnapshotManifest.commit(spark, root, v1.repartitionByRange(3, $"id"))
        val feed = SnapshotManifest.changesBetween(spark, root, 0L, 1L, Seq("id"))
        val removeIds = feed.filter($"_change".isin("delete", "update_preimage"))
          .select($"id").as[Long].collect().toSet
        val addRows = feed.filter($"_change".isin("insert", "update_postimage"))
          .select($"id", $"x", $"v").as[(Long, String, Double)].collect()
        val reconstructed = (v0.as[(Long, String, Double)].collect()
          .filterNot(r => removeIds.contains(r._1)) ++ addRows).toSet
        assert(reconstructed == v1.as[(Long, String, Double)].collect().toSet,
          s"trial $trial: feed does not reconstruct the target")
        // feed classification is exact, not just net-effect-equivalent
        val byChange = feed.groupBy($"_change").count()
          .as[(String, Long)].collect().toMap
        assert(byChange.getOrElse("delete", 0L) == dels.size.toLong)
        assert(byChange.getOrElse("insert", 0L) == ins.size.toLong)
        assert(byChange.getOrElse("update_preimage", 0L) == upds.size.toLong)
        assert(byChange.getOrElse("update_preimage", 0L) ==
          byChange.getOrElse("update_postimage", 0L))
    }
  }

  test("mayMatch soundness fuzz: a pruned file contains no row matching the predicate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.sources.ManifestStats
    // one "file" of random (a: int-with-nulls, s: string-with-nulls) rows;
    // stats collected through the real write-side path
    val genRow = for {
      a <- Gen.frequency(8 -> Gen.choose(-20, 120).map(Option(_)),
        1 -> Gen.const(Option.empty[Int]))
      s <- Gen.frequency(6 -> Gen.alphaLowerStr.map(x => Option(x.take(6))),
        1 -> Gen.const(Option.empty[String]))
    } yield (a, s)
    val genLitA = Gen.choose(-40, 160)
    val genLitS = Gen.oneOf("", "a", "abc", "zz", "m", "qqqq")
    def genLeaf: Gen[org.apache.spark.sql.Column] = Gen.oneOf(
      genLitA.map(v => col("a") === lit(v)),
      genLitA.map(v => col("a") < lit(v)),
      genLitA.map(v => col("a") <= lit(v)),
      genLitA.map(v => col("a") > lit(v)),
      genLitA.map(v => col("a") >= lit(v)),
      Gen.listOfN(3, genLitA).map(vs => col("a").isin(vs: _*)),
      Gen.const(col("a").isNull), Gen.const(col("a").isNotNull),
      genLitS.map(v => col("s") === lit(v)),
      genLitS.map(v => col("s") < lit(v)),
      genLitS.map(v => col("s") > lit(v)),
      genLitS.map(v => col("s").startsWith(v)),
      Gen.const(col("s").isNull), Gen.const(col("s").isNotNull))
    def genPred(depth: Int): Gen[org.apache.spark.sql.Column] =
      if (depth <= 0) genLeaf
      else Gen.frequency(
        2 -> genLeaf,
        1 -> (for { l <- genPred(depth - 1); r <- genPred(depth - 1) } yield l && r),
        1 -> (for { l <- genPred(depth - 1); r <- genPred(depth - 1) } yield l || r))
    (0 until 3).foreach { ds =>
      val rows = samples(genRow, n = 30, seedBase = 900L + ds * 100L)
      val dir = java.nio.file.Files.createTempDirectory(s"maymatch$ds").toString + "/f"
      rows.toDF("a", "s").coalesce(1).write.parquet(dir)
      val read = spark.read.parquet(dir)
      val stats = ManifestStats.collect(read, Seq("a", "s"))
      assert(stats.size == 1)
      val fileStats = stats.values.head
      var pruned = 0
      samples(genPred(2), n = 120, seedBase = 7000L + ds).foreach { p =>
        val resolved = ManifestStats.resolvePredicate(spark, read.schema, p)
        if (!ManifestStats.mayMatch(resolved, fileStats)) {
          pruned += 1
          // soundness: the pruned file must contain NO matching row
          if (pruned <= 15) // bound the Spark-job cost; prunes are uniform
            assert(read.filter(p).isEmpty,
              s"UNSOUND prune: $resolved dropped a file with matches")
        }
      }
      assert(pruned >= 3, s"vacuous fuzz on dataset $ds: no predicate pruned")
    }
  }

  test("mergeWhere ≡ whole-table merge for arbitrary staged batches (prune soundness)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.sources.SnapshotManifest
    import graft.operators.Upsert
    // key pools: inside the target range, outside it (pure inserts), and
    // null (never-matching inserts); caps exercise the IN path AND the
    // min/max fallback; statsCols = Nil exercises "stats-less files always
    // rewrite"
    val genCase = for {
      nT <- Gen.choose(1, 50)
      tKeys0 <- Gen.listOfN(nT, Gen.choose(0L, 80L))
      nS <- Gen.choose(0, 20)
      sKeys0 <- Gen.listOfN(nS, Gen.frequency(
        5 -> Gen.choose(0L, 80L).map(Option(_)),
        2 -> Gen.choose(200L, 220L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long])))
      cap <- Gen.oneOf(1, 3, 100000)
      withStats <- Gen.oneOf(true, false)
    } yield (tKeys0.distinct, sKeys0.distinct, cap, withStats)
    samples(genCase, n = 8, seedBase = 4242L).zipWithIndex.foreach {
      case ((tKeys, sKeys, cap, withStats), trial) =>
        val root = java.nio.file.Files.createTempDirectory(s"mw_prop$trial").toString
        val target = tKeys.map(k => (Option(k), s"t$k", k * 1.0)).toDF("id", "x", "v")
        val staged = sKeys.map(k => (k, s"s${k.getOrElse(-1L)}", 7.0)).toDF("id", "x", "v")
        SnapshotManifest.commit(spark, root,
          target.repartitionByRange(3, $"id"),
          if (withStats) Seq("id") else Nil)
        Upsert.mergeWhere(spark, root, staged, Seq("id"),
          if (withStats) Seq("id") else Nil, maxKeySetSize = cap)
        val expected = Upsert.merge(target, staged, Seq("id"))
          .as[(Option[Long], String, Double)].collect()
          .sortBy(r => (r._1.getOrElse(Long.MinValue), r._2))
        val got = SnapshotManifest.read(spark, root)
          .as[(Option[Long], String, Double)].collect()
          .sortBy(r => (r._1.getOrElse(Long.MinValue), r._2))
        assert(got.toSeq == expected.toSeq,
          s"trial $trial (cap=$cap stats=$withStats) diverged")
    }
  }
}
