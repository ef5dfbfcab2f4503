package graft

import org.apache.spark.sql.functions._

/** Evidence for the SCALE.md co-location claim: bucketing both join sides by
  * the join key removes the shuffle entirely (the fix for the one large
  * shuffle in the star join / MERGE at 100 TB).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key tables join without an Exchange") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey")

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    // a previous JVM's in-memory catalog is gone but its warehouse dirs
    // survive; clear them so CTAS doesn't refuse the location
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(dir)
      }
    }
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    // both scans feed the sort-merge join directly: no shuffle on either side
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free co-located join, got:\n$plan")
    // and the result is still correct
    assert(joined.count() ==
      li.join(o, col("l_orderkey") === col("o_orderkey")).count())
  }

  test("MERGE against a PK-bucketed target shuffles only the staged side") {
    import graft.operators.Upsert
    val target = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"),
        lit("2024-01-01 00:00:00").alias(Upsert.InsertTs),
        lit("2024-01-01 00:00:00").alias(Upsert.UpdateTs))
    spark.sql("DROP TABLE IF EXISTS merge_target_bucketed")
    val dir = new java.io.File("spark-warehouse/merge_target_bucketed")
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
    Upsert.bucketTarget(target, "merge_target_bucketed", Seq("o_orderkey"), 8)

    val staged = target.limit(50)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn(Upsert.UpdateTs, lit("2024-06-01 00:00:00"))
    val merged = Upsert.mergeBucketedTarget(
      spark, "merge_target_bucketed", staged, Seq("o_orderkey"))
    val plan = merged.queryExecution.executedPlan.toString

    // exactly ONE shuffle — the staged delta moving into the target's bucket
    // partitioning; the target (the 100-TB side) feeds the join in place
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 Exchange (staged side only), got $exchanges:\n$plan")
    assert(plan.contains("Bucketed: true"), s"target scan not bucketed:\n$plan")

    // semantics identical to the plain-path merge
    val plain = Upsert.merge(target, staged, Seq("o_orderkey"))
    assert(merged.exceptAll(plain).isEmpty && plain.exceptAll(merged).isEmpty)
  }
}
