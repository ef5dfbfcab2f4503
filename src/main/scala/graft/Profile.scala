package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the hot queries (dev tool). */
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
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name ($n rows)")
    }
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dups = docs.filter(col("source") === "src0").select(
      (col("doc_id") + 100000L).alias("doc_id"),
      concat(col("text"), lit(" nearduplicate")).alias("text"),
      col("lang"), col("source"), col("n_chars"))
    val corpus = docs.unionByName(dups)
    time("corpus count")(corpus.count())
    time("canonical only")(corpus.select(Dedup.canonical(col("text")).alias("c")).filter(length(col("c")) > 0).count())
    val shIdx = Dedup.shingleIndex(corpus, "doc_id", "text")
    time("shingle index")(shIdx.select(sum(size(col("__sh")))).head().getLong(0))
    val shP = Dedup.shingleIndex(corpus, "doc_id", "text").persist()
    time("shingle persist")(shP.count())
    time("cand pairs")(Dedup.lshCandidatePairsFromShingles(shP, "doc_id").count())
    val cands = Dedup.lshCandidatePairsFromShingles(shP, "doc_id")
    time("jaccard")(Dedup.ngramJaccardFromShingles(cands, shP, "doc_id").filter(col("jaccard") >= 0.7).count())
    time("full nearDuplicates")(Dedup.nearDuplicates(corpus, "doc_id", "text").count())
    time("full nearDuplicates again")(Dedup.nearDuplicates(corpus, "doc_id", "text").count())
    // no-persist variant: both stages recompute the shingle index, fully pipelined
    def noPersist(): Long = {
      val shIdx = Dedup.shingleIndex(corpus, "doc_id", "text")
      val cands = Dedup.lshCandidatePairsFromShingles(shIdx, "doc_id")
      Dedup.ngramJaccardFromShingles(cands, shIdx, "doc_id")
        .filter(col("jaccard") >= 0.7).count()
    }
    time("nearDup NO persist")(noPersist())
    time("nearDup NO persist again")(noPersist())
    spark.stop()
  }
}
