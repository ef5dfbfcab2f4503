package graft

import org.apache.spark.sql.functions._
import graft.operators.Upsert

/** SURVEY §2.9 — MERGE semantics (`utils.py:237-296`). */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "t1", "2024-01-01", "2024-01-01", 10.0),
    (2L, "t2", "2024-01-02", "2024-01-02", 20.0)
  ).toDF("pk", "payload", Upsert.InsertTs, Upsert.UpdateTs, "amount")

  private def staged = Seq(
    (2L, "s2", "2024-02-01", "2024-02-01", 99.0), // matched
    (3L, "s3", "2024-02-01", "2024-02-01", 30.0)  // new
  ).toDF("pk", "payload", Upsert.InsertTs, Upsert.UpdateTs, "amount")

  test("J4 matched rows: staged values except PK and INSERT_TIMESTAMP (utils.py:270-280)") {
    val out = Upsert.merge(target, staged, Seq("pk")).orderBy("pk").collect()
    assert(out.length == 3)
    val row2 = out(1)
    assert(row2.getAs[String]("payload") == "s2")
    assert(row2.getAs[String](Upsert.InsertTs) == "2024-01-02") // target wins
    assert(row2.getAs[String](Upsert.UpdateTs) == "2024-02-01") // staged wins
    assert(row2.getAs[Double]("amount") == 99.0)
  }

  test("J4 schema drift: target column absent from staged keeps its value on match") {
    val driftedStaged = staged.drop("amount") // batch page lost a column
    val out = Upsert.merge(target, driftedStaged, Seq("pk")).orderBy("pk").collect()
    assert(out(1).getAs[String]("payload") == "s2")   // present column: staged wins
    assert(out(1).getAs[Double]("amount") == 20.0)    // absent column: target KEPT
    assert(out(2).isNullAt(out(2).fieldIndex("amount"))) // inserted row: null is correct
  }

  test("J4 unmatched target rows pass through; staged-only rows inserted whole (utils.py:283-290)") {
    val out = Upsert.merge(target, staged, Seq("pk")).orderBy("pk").collect()
    assert(out(0).getAs[String]("payload") == "t1")
    assert(out(2).getAs[String]("payload") == "s3")
    assert(out(2).getAs[String](Upsert.InsertTs) == "2024-02-01") // staged insert_ts kept on insert
  }

  test("J4 merge is idempotent: merge(merge(t,s),s) == merge(t,s)") {
    val once = Upsert.merge(target, staged, Seq("pk"))
    val twice = Upsert.merge(once, staged, Seq("pk"))
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("J4 composite PK + comma-string parsing (utils.py:264-269)") {
    assert(Upsert.parsePkColumns(" a , b,c ") == Seq("a", "b", "c"))
    val t2 = target.withColumn("pk2", lit("x"))
    val s2 = staged.withColumn("pk2", lit("x"))
    val out = Upsert.merge(t2, s2, "pk, pk2").orderBy("pk").collect()
    assert(out.length == 3 && out(1).getAs[String]("payload") == "s2")
  }

  test("J4 null PKs never match (Exasol `=` MERGE parity)") {
    val t = Seq((Option.empty[Long], "tn"), (Some(1L), "t1"))
      .toDF("pk", "payload")
    val s = Seq((Option.empty[Long], "sn"), (Some(1L), "s1"))
      .toDF("pk", "payload")
    val out = Upsert.merge(t, s, Seq("pk"))
    // null-PK target row passes through, null-PK staged row inserted: 3 rows
    assert(out.count() == 3)
    assert(out.filter(col("payload").isin("tn", "sn")).count() == 2)
  }

  test("§2.9 mergeSql printable twin shape (utils.py:456-493)") {
    val sql = Upsert.mergeSql("sch.tbl", "sch_tmp.tbl", Seq("PK"),
      Seq("PK", Upsert.InsertTs, Upsert.UpdateTs, "V"))
    assert(sql.contains("""MERGE INTO sch.tbl t USING sch_tmp.tbl s ON (t."PK" = s."PK")"""))
    assert(sql.contains("""UPDATE SET t."UPDATE_TIMESTAMP" = s."UPDATE_TIMESTAMP", t."V" = s."V""""))
    assert(!sql.contains("""t."INSERT_TIMESTAMP" = s."""))
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT"))
  }

  test("§2.9 mergeAndSwap: durable parquet target updated atomically, audit returned") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("upsert_swap").toString + "/target"
    target
      .withColumn(Upsert.InsertTs, col(Upsert.InsertTs).cast("timestamp"))
      .withColumn(Upsert.UpdateTs, col(Upsert.UpdateTs).cast("timestamp"))
      .write.parquet(dir)
    val stagedTs = staged
      .withColumn(Upsert.InsertTs, col(Upsert.InsertTs).cast("timestamp"))
      .withColumn(Upsert.UpdateTs, current_timestamp()) // "loaded now"
    val audited = Upsert.mergeAndSwap(spark, dir, stagedTs, Seq("pk"))
    val after = spark.read.parquet(dir).orderBy("pk").collect()
    assert(after.length == 3)
    assert(after(1).getAs[String]("payload") == "s2")
    assert(after(2).getAs[String]("payload") == "s3")
    assert(audited == 2L) // the two staged rows carry today's UPDATE_TIMESTAMP
  }

  test("A2 audit counts rows updated today (utils.py:293-295)") {
    val merged = Seq(("2024-01-01")).toDF(Upsert.UpdateTs)
      .withColumn(Upsert.UpdateTs, col(Upsert.UpdateTs).cast("timestamp"))
      .unionByName(Seq(1).toDF("x").select(current_timestamp().alias(Upsert.UpdateTs)))
    assert(Upsert.auditUpdatedToday(merged) == 1L)
  }
}
