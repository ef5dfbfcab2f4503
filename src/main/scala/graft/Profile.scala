package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiler for the hot queries (dev tool). NO persist anywhere —
  * persisted plans are cached by logical-plan identity and silently serve
  * later "independent" measurements (the trap that corrupted the round-1
  * persist-vs-pipelined comparison).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name ($n)")
    }
    import graft.operators.Dedup
    val warmDir = "/root/testdata/sf0.001"
    val t0 = System.nanoTime()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  [warmup all @ sf0.001]")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dups = docs.filter(col("source") === "src0").select(
      (col("doc_id") + 100000L).alias("doc_id"),
      concat(col("text"), lit(" nearduplicate")).alias("text"),
      col("lang"), col("source"), col("n_chars"))
    val c = docs.unionByName(dups)

    for (round <- 1 to 2) {
      time(s"r$round scan only")(c.count())
      time(s"r$round canonical")(
        c.select(Dedup.canonical(col("text")).alias("t")).agg(sum(length(col("t")))).head().getLong(0))
      time(s"r$round shingles")(
        c.select(Dedup.shingles(col("text")).alias("s")).agg(sum(size(col("s")))).head().getLong(0))
      time(s"r$round shingle md5 hash")(
        c.select(transform(Dedup.shingles(col("text")), Dedup.shingleHash(_)).alias("h"))
          .agg(sum(size(col("h")))).head().getLong(0))
      time(s"r$round minhash sig 12")(
        c.select(Dedup.minhashSignature(col("text"), 12).alias("sig"))
          .agg(sum(size(col("sig")))).head().getLong(0))
      time(s"r$round cand pairs")(
        Dedup.lshCandidatePairsFromShingles(
          Dedup.shingleIndex(c, "doc_id", "text"), "doc_id").count())
    }
    spark.stop()
  }
}
