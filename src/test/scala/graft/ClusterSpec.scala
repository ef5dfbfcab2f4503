package graft

import graft.operators.Dedup

/** Connected-components clustering over near-dup pairs: transitivity,
  * multi-round convergence (path graphs), min-id labeling.
  */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("two components, min-id labels") {
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long path converges past a single propagation round") {
    // path 1-2-3-...-9: label 1 must travel 8 hops
    val pairs = (1L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs).as[(Long, Long)].collect()
    assert(out.length == 9)
    assert(out.forall(_._2 == 1L))
  }

  test("clustersConverged reports truncation when maxRounds is too small") {
    val pairs = (1L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (_, convergedShort) =
      Dedup.clustersConverged(pairs, maxRounds = 2, smallGraphMaxEdges = 0L)
    assert(!convergedShort)
    val (full, convergedFull) = Dedup.clustersConverged(pairs)
    assert(convergedFull)
    assert(full.as[(Long, Long)].collect().forall(_._2 == 1L))
  }

  test("small-graph fast path and distributed fixpoint agree") {
    // mix of a path, a clique, an isolated pair; string ids too
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val fast = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    val dist = Dedup.clusters(pairs, smallGraphMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast == dist)
    val sPairs = Seq(("b", "a"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b")
    val sFast = Dedup.clusters(sPairs).as[(String, String)].collect().toMap
    val sDist = Dedup.clusters(sPairs, smallGraphMaxEdges = 0L)
      .as[(String, String)].collect().toMap
    assert(sFast == sDist)
    assert(sFast == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("clusterRepresentatives: argmax score wins, ties to min id, singletons self-map") {
    import org.apache.spark.sql.functions.col
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val records = Seq(
      (1L, 5.0), (2L, 9.0), (3L, 7.0), // cluster {1,2,3}: 2 has top score
      (10L, 4.0), (11L, 4.0),          // cluster {10,11}: tie → min id 10
      (99L, 1.0)                        // singleton
    ).toDF("id", "score")
    val reps = Dedup.clusterRepresentatives(records, pairs, "id", "score")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(reps(1L) == ((1L, 2L)) && reps(2L) == ((1L, 2L)) && reps(3L) == ((1L, 2L)))
    assert(reps(10L) == ((10L, 10L)) && reps(11L) == ((10L, 10L)))
    assert(reps(99L) == ((99L, 99L)))
    val kept = Dedup.keepBestPerCluster(records, pairs, "id", "score")
      .select(col("id")).as[Long].collect().toSet
    assert(kept == Set(2L, 10L, 99L))
  }

  test("clusterRepresentatives: long scores past 2^53 elect exactly (no double collapse)") {
    import org.apache.spark.sql.functions.col
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    // adjacent longs that collapse to the SAME double, with the strictly
    // HIGHER score on the LARGER id: a double-collapsing implementation
    // would fall to the min-id tiebreak and elect id 1 — exact comparison
    // must elect id 2
    val records = Seq((1L, 1L << 53), (2L, (1L << 53) + 1L)).toDF("id", "score")
    val reps = Dedup.clusterRepresentatives(records, pairs, "id", "score")
      .select(col("id"), col("representative")).as[(Long, Long)].collect().toMap
    assert(reps(1L) == 2L && reps(2L) == 2L)
  }

  test("clusterRepresentatives: NaN scores lose like nulls; float/double exactness") {
    import org.apache.spark.sql.functions.col
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val records = Seq((1L, Double.NaN), (2L, 5.0)).toDF("id", "score")
    val reps = Dedup.clusterRepresentatives(records, pairs, "id", "score")
      .select(col("id"), col("representative")).as[(Long, Long)].collect().toMap
    assert(reps(1L) == 2L && reps(2L) == 2L, "NaN must not be elected best")
  }

  test("clusterRepresentatives: a NULL score loses to every real score (SQL aggregate convention)") {
    import org.apache.spark.sql.functions.col
    val pairs = Seq((1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val records = Seq(
      (1L, Option.empty[Double]), (2L, Option(9.0)), // scored copy must win
      (5L, Option.empty[Double]), (6L, Option.empty[Double]) // all-null → min id
    ).toDF("id", "score")
    val reps = Dedup.clusterRepresentatives(records, pairs, "id", "score")
      .select(col("id"), col("representative")).as[(Long, Long)].collect().toMap
    assert(reps(1L) == 2L && reps(2L) == 2L)
    assert(reps(5L) == 5L && reps(6L) == 5L)
  }

  test("NULL-id records pass through keep-best as anonymous singletons") {
    import org.apache.spark.sql.functions.col
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val records = Seq(
      (Option(1L), 5.0), (Option(2L), 9.0),  // cluster: 2 wins
      (Option.empty[Long], 3.0),             // null id: must survive
      (Option.empty[Long], 1.0)              // ... each one independently
    ).toDF("id", "score")
    val reps = Dedup.clusterRepresentatives(records, pairs, "id", "score")
    assert(reps.count() == 4L, "null-id rows must not vanish")
    assert(reps.filter(col("id").isNull).count() == 2L)
    assert(reps.filter(col("id").isNull)
      .filter(col("cluster_id").isNotNull || col("representative").isNotNull)
      .count() == 0L)
    val kept = Dedup.keepBestPerCluster(records, pairs, "id", "score")
    assert(kept.count() == 3L) // representative 2 + both null-id singletons
    assert(kept.filter(col("id").isNull).count() == 2L)
    assert(kept.filter(col("id") === 2L).count() == 1L)
  }

  test("isolated pair stays its own cluster; ids appear exactly once") {
    val pairs = Seq((5L, 6L), (6L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs).as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((5L, 5L), (6L, 5L)))
  }
}
