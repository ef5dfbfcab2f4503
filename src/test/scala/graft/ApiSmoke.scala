package graft

import org.apache.spark.sql.functions._

/** Sample consumer driven by the verify workflow: exercises library exports
  * that no Verify query reaches (lshBands, explodeColumnInner) against the
  * real fixtures and prints what it observes. Run with
  * `sbt "Test/runMain graft.ApiSmoke"`.
  */
object ApiSmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("api-smoke", "local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bands = graft.operators.Dedup.lshBands(docs, "doc_id", "text")
    println(s"lshBands rows: ${bands.count()} (expect 500 docs x 4 bands = 2000)")
    bands.orderBy("doc_id", "band_id").show(4, truncate = false)

    val nested = Seq(
      (1L, Seq("a", "b")), (2L, Seq.empty[String]), (3L, null.asInstanceOf[Seq[String]])
    ).toDF("id", "xs")
    println(s"explode_outer rows: ${graft.nested.Normalize.explodeColumn(nested, "xs").count()}")
    println(s"explode inner rows: ${graft.nested.Normalize.explodeColumnInner(nested, "xs").count()}")

    val assets = graft.operators.Multimodal.toAssets(docs, "doc_id", "text", "text/plain")
    val resized = graft.operators.Multimodal.resize(assets, 224, 224)
    println(s"resized assets: ${resized.count()} (expect 500)")
    resized.select("asset_id", "width", "height").show(2)
    val frames = graft.operators.Multimodal.sampleFrames(assets, everyNth = 4)
    println(s"sampled frames: ${frames.count()} from ${assets.count()} assets")
    frames.groupBy().agg(min(col("frame_index")), max(col("frame_index"))).show()

    // round-3 exports without a Verify query of their own
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = graft.operators.Similarity.quantizeInt8(col("embedding"))
    val roundTrip = emb.select(
      graft.operators.Similarity.cosine(
        col("embedding"), graft.operators.Similarity.dequantizeInt8(q)).alias("c"))
      .agg(min(col("c"))).head().getDouble(0)
    println(f"int8 round-trip min cosine vs original: $roundTrip%.6f (expect > 0.999)")

    val top = docs.groupBy(col("lang"))
      .agg(graft.functions.Functions.topKBy(col("n_chars"), col("doc_id"), 3).alias("longest"))
    println(s"topKBy longest-docs-per-lang rows: ${top.count()} (expect 5)")
    top.orderBy("lang").show(5, truncate = false)
    spark.stop()
  }
}
