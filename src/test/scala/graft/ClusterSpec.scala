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
    val (_, convergedShort) = Dedup.clustersConverged(pairs, maxRounds = 2)
    assert(!convergedShort)
    val (full, convergedFull) = Dedup.clustersConverged(pairs)
    assert(convergedFull)
    assert(full.as[(Long, Long)].collect().forall(_._2 == 1L))
  }

  test("isolated pair stays its own cluster; ids appear exactly once") {
    val pairs = Seq((5L, 6L), (6L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs).as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((5L, 5L), (6L, 5L)))
  }
}
