package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (BASELINE north star).
  *
  * Images/audio/video are opaque `binary` columns plus typed metadata — the
  * lakehouse-standard layout (one row per asset; bytes inline below a size
  * threshold, else a URI to object storage). The Spark-side plumbing here is
  * real and tested: schema, partition sizing, batch-shaped decode surface.
  * The actual codec work (JPEG decode, resampling, frame extraction) is
  * STUBBED with a deterministic fake — media libraries are unavailable in
  * this environment — behind the same `mapPartitions` batch interface a
  * production kernel (JNI/FFM codec or a Python `mapInPandas` worker) plugs
  * into.
  *
  * Scale notes: assets are large and incompressible — the operator never
  * shuffles bytes (decode/feature-extract are narrow maps); metadata-only
  * queries must prune the binary column at the scan (columnar parquet makes
  * that free — verified by ReadSchema in the plan).
  */
object Multimodal {

  val AssetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = true),
    StructField("bytes", BinaryType, nullable = true),
    StructField("byte_len", LongType, nullable = true)
  ))

  /** Wrap a text/binary-bearing frame into the asset layout (used by tests
    * and queries to fabricate binary columns from the `documents` fixture —
    * deterministic, no external data).
    */
  def toAssets(docs: DataFrame, idCol: String, payloadCol: String,
      mediaType: String = "application/octet-stream"): DataFrame =
    docs.select(
      col(idCol).cast("long").alias("asset_id"),
      lit(mediaType).alias("media_type"),
      col(payloadCol).cast("binary").alias("bytes"),
      length(col(payloadCol).cast("binary")).cast("long").alias("byte_len"))

  final case class AssetFeatures(
      asset_id: Long,
      byte_len: Long,
      // STUB decode output: deterministic pseudo-metadata derived from bytes.
      // A real decoder would emit true width/height/duration here.
      width: Int,
      height: Int,
      channels: Int,
      checksum: String)

  /** "Decode" + feature-extract over batches. The per-partition iterator is
    * the production batch shape (amortizes codec init per partition, streams
    * rows without materializing the partition); only the innermost
    * `decodeStub` is fake.
    */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col("asset_id"), col("bytes"), col("byte_len"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { it =>
        // production: initialize the codec ONCE per partition here
        it.map { case (id, bytes, len) =>
          val (w, h, c) = decodeStub(bytes)
          AssetFeatures(id, len, w, h, c, checksumHex(bytes))
        }
      }
      .toDF()
  }

  /** Deterministic fake decode: pretends the payload is an image and derives
    * stable dimensions from its length/content. Replace with a real codec.
    */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    if (bytes == null || bytes.isEmpty) (0, 0, 0)
    else {
      val n = bytes.length
      val w = 16 + (n % 640)
      val h = 16 + ((n / 7) % 480)
      (w, h, 3)
    }
  }

  private def checksumHex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(if (bytes == null) Array.emptyByteArray else bytes)
      .map("%02x".format(_)).mkString
  }

  /** Expression-only metadata profile (no decode): everything a pure
    * column-pruned scan can answer — byte length, emptiness, md5. This is
    * the query-side fast path; hash-comparable across engines.
    */
  def metadataProfile(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"),
      col("media_type"),
      col("byte_len"),
      (col("byte_len").isNull || col("byte_len") === 0).alias("is_empty"),
      md5(col("bytes")).alias("content_md5"))
}
