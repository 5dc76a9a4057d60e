package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns: image/audio/video as opaque `binary` payloads
 * with typed metadata, plus the decode / feature-extract / resize /
 * frame-sample plumbing an LLM-data pipeline needs. Extension surface
 * (no reference counterpart).
 *
 * The actual codecs (JPEG/PNG/ffmpeg) are NOT available in this
 * offline container, so the decode kernels below are deterministic
 * STUBS — byte-level statistics standing in for pixel decoding, each
 * clearly marked. The Spark-side contract they run inside is real and
 * tested: schema, null-safe batch iteration, per-partition processing,
 * row-count preservation. A production deployment swaps
 * [[decodeBytesStub]] for a JNI/opencv call (Scala) or runs the same
 * schema through `mapInPandas` with PIL/torchvision (PySpark) — batch
 * shape and column contract identical.
 *
 * Scale notes: payload columns are heavy — every operator here keeps
 * them in ONE map stage (mapPartitions/expressions, no shuffle), and
 * projections carry metadata instead of payloads wherever possible so
 * pruned scans never read the blob pages of parquet row groups.
 */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  val MetadataType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_ms", LongType)))

  val BlobSchema: StructType = StructType(Seq(
    StructField("blob_id", LongType, nullable = false),
    StructField("data", BinaryType),
    StructField("meta", MetadataType)))

  /** Wrap a (id, payload) frame into the canonical blob schema with
    * synthesized metadata (stub: dimensions derived from payload size;
    * a real ingest parses container headers here). */
  def asBlobTable(df: DataFrame, idCol: String, payloadCol: String,
                  mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("blob_id"),
      col(payloadCol).cast("binary").as("data"),
      struct(
        lit(mime).as("mime"),
        (pmod(xxhash64(col(payloadCol)), lit(1920)) + 1).cast("int").as("width"),
        (pmod(xxhash64(col(payloadCol), lit(1)), lit(1080)) + 1).cast("int").as("height"),
        (pmod(xxhash64(col(payloadCol), lit(2)), lit(300)) + 1).cast("int").as("n_frames"),
        (length(col(payloadCol)) * 8).cast("long").as("duration_ms")).as("meta"))

  /**
   * STUB decode kernel: 16-bin byte-value histogram, L1-normalized —
   * deterministic stand-in for "decode image and compute features".
   * Real implementation: replace the body with the codec call; the
   * signature (bytes -> fixed-width Float vector) is the contract.
   */
  private[ops] def decodeBytesStub(data: Array[Byte], bins: Int): Array[Float] = {
    val hist = new Array[Float](bins)
    if (data == null || data.isEmpty) return hist
    var i = 0
    while (i < data.length) {
      hist(((data(i) & 0xFF) * bins) / 256) += 1f
      i += 1
    }
    var b = 0
    while (b < bins) { hist(b) /= data.length; b += 1 }
    hist
  }

  /** Decode + feature-extract: one narrow mapPartitions stage, payload
    * never shuffled. Emits (blob_id, features); downstream joins fetch
    * metadata separately so the feature table stays narrow. */
  def extractFeatures(blobs: DataFrame, bins: Int = 16): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("blob_id"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, data) =>
        (id, decodeBytesStub(data, bins))
      })
      .toDF("blob_id", "features")
  }

  /** STUB resize: proportionally rescale the metadata dimensions and
    * subsample the payload (every k-th byte stands in for every k-th
    * pixel row). Contract: output payload is smaller, metadata updated,
    * row count preserved. */
  def resize(blobs: DataFrame, maxWidth: Int): DataFrame = {
    val resizeUdf = udf((data: Array[Byte], width: Int) => {
      if (data == null || width <= maxWidth) data
      else {
        val k = math.max(1, width / maxWidth)
        data.indices.collect { case i if i % k == 0 => data(i) }.toArray
      }
    })
    blobs
      .withColumn("data", resizeUdf(col("data"), col("meta.width")))
      .withColumn("meta", struct(
        col("meta.mime").as("mime"),
        least(col("meta.width"), lit(maxWidth)).as("width"),
        when(col("meta.width") > maxWidth,
          (col("meta.height") * maxWidth / col("meta.width")).cast("int"))
          .otherwise(col("meta.height")).as("height"),
        col("meta.n_frames").as("n_frames"),
        col("meta.duration_ms").as("duration_ms")))
  }

  /** Frame sampling for video payloads: emit every `stride`-th frame
    * index with its byte offset (stub offsets: payload split evenly by
    * n_frames). Explode is bounded by n_frames/stride per row. */
  def sampleFrames(blobs: DataFrame, stride: Int): DataFrame =
    blobs.select(
      col("blob_id"),
      col("meta.n_frames").as("n_frames"),
      explode(sequence(lit(0), col("meta.n_frames") - 1, lit(stride)))
        .as("frame_idx"),
      (length(col("data")) / greatest(col("meta.n_frames"), lit(1))).as("frame_bytes"))
      .withColumn("byte_offset", col("frame_idx") * col("frame_bytes"))
      .drop("frame_bytes")

  /** Metadata-only projection — the narrow frame downstream filters
    * use so parquet never reads payload pages. */
  def metadataOnly(blobs: DataFrame): DataFrame =
    blobs.select(col("blob_id"), col("meta.*"),
      length(col("data")).cast("long").as("payload_bytes"))
}
