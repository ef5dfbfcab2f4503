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
      byte_len: Option[Long], // null assets are in-contract (null payloads)
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
      // Option[Long]: a null payload has null byte_len, and a primitive Long
      // encoder would NPE at deserialization before decodeStub's null guard
      // ever ran
      .as[(Long, Array[Byte], Option[Long])]
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

  final case class ResizedAsset(asset_id: Long, width: Int, height: Int, bytes: Array[Byte])

  /** Image resize over batches — the Spark plumbing (narrow map, streaming
    * iterator, codec-init-per-partition) is real; the pixel work is a
    * deterministic stub (length-preserving byte fold) standing in for a real
    * scaler. Target dims are parameters, as a production kernel's would be.
    */
  def resize(assets: DataFrame, width: Int, height: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // production: codec/scaler init once per partition here
        it.map { case (id, bytes) =>
          ResizedAsset(id, width, height, resizeStub(bytes, width, height))
        }
      }
      .toDF()
  }

  /** Frame sampling for video payloads: emit one row per sampled frame
    * (flatMap — row count grows, still a narrow op). Frame bytes are a
    * deterministic slice stub; `everyNth` mirrors a real stride parameter.
    */
  def sampleFrames(assets: DataFrame, everyNth: Int, maxFrames: Int = 16): DataFrame = {
    require(everyNth >= 1, "everyNth must be >= 1")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("bytes")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val frames = frameSampleStub(bytes, everyNth, maxFrames)
        frames.zipWithIndex.map { case (f, i) => (id, i * everyNth, f) }
      }
      .toDF("asset_id", "frame_index", "frame_bytes")
  }

  /** Deterministic stand-ins for the codec kernels (media libraries are not
    * available in this environment — see class doc).
    */
  private def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (bytes == null || bytes.isEmpty) Array.emptyByteArray
    else {
      val out = new Array[Byte](math.min(w * h / 64 + 1, bytes.length))
      var i = 0
      while (i < out.length) { out(i) = bytes(i % bytes.length); i += 1 }
      out
    }
  }

  private def frameSampleStub(bytes: Array[Byte], everyNth: Int, maxFrames: Int): Seq[Array[Byte]] = {
    if (bytes == null || bytes.isEmpty) Seq.empty
    else {
      val frameSize = math.max(bytes.length / 16, 1)
      val nFrames = math.min((bytes.length + frameSize - 1) / frameSize, maxFrames * everyNth)
      (0 until nFrames by everyNth).map { f =>
        bytes.slice(f * frameSize, math.min((f + 1) * frameSize, bytes.length))
      }
    }
  }
}
