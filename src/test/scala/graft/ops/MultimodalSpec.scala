package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Multimodal plumbing: schema, batch shape, row preservation. The
  * decode kernels are stubs; the Spark contract around them is real. */
class MultimodalSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private lazy val blobs = {
    val raw = Seq(
      (1L, Array.tabulate(4096)(i => (i % 251).toByte)),
      (2L, Array.tabulate(1024)(i => ((i * 7) % 256).toByte)),
      (3L, Array.empty[Byte]))
      .toDF("id", "payload")
    Multimodal.asBlobTable(raw, "id", "payload", "image/fake")
  }

  /** Hand-built 4x2 P6: left half red-ish gradient, right half blue. */
  private def ppm(w: Int = 4, h: Int = 2): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = 3 * (y * w + x)
      if (x < w / 2) { rgb(i) = 200.toByte; rgb(i + 1) = 10; rgb(i + 2) = 10 }
      else { rgb(i) = 10; rgb(i + 1) = 10; rgb(i + 2) = 200.toByte }
    }
    Multimodal.encodePpm(w, h, rgb)
  }

  test("P6 decode is real: header, pixels, strict length, comments") {
    val img = ppm()
    val Some((w, h, rgb)) = Multimodal.decodePpm(img)
    assert((w, h) === (4, 2))
    assert(rgb.length === 24)
    assert((rgb(0) & 0xFF) === 200 && (rgb(11) & 0xFF) === 200)
    // comment lines in the header parse
    val withComment = ("P6\n# a comment\n4 2\n255\n").getBytes("US-ASCII") ++
      rgb
    assert(Multimodal.decodePpm(withComment).map(_._1) === Some(4))
    // strict length: trailing junk or truncation rejects
    assert(Multimodal.decodePpm(img ++ Array[Byte](0)) === None)
    assert(Multimodal.decodePpm(img.dropRight(1)) === None)
    // text that merely starts with P6 rejects
    assert(Multimodal.decodePpm("P6 is a chess opening".getBytes) === None)
    assert(Multimodal.decodePpm(null) === None)
  }

  test("P6 payloads get real dimensions, features, and resize") {
    val raw = Seq((1L, ppm(8, 4)), (2L, "not an image".getBytes))
      .toDF("id", "payload")
    val b = Multimodal.asBlobTable(raw, "id", "payload", "image/x-ppm")
    val dims = b.select("blob_id", "meta.width", "meta.height")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(dims(1L) === ((8, 4))) // REAL header dims
    assert(dims(2L)._1 >= 1 && dims(2L)._1 <= 1920) // stub synthesis
    // features: luminance histogram of the PIXELS — half the image is
    // red (lum 66 -> bin 4) and half blue (lum 31 -> bin 1), 0.5 each
    val f = Multimodal.extractFeatures(b.where(col("blob_id") === 1), 16)
      .head().getSeq[Float](1)
    assert(f.sum === 1.0f)
    assert(f(4) === 0.5f && f(1) === 0.5f, f.toList.toString)
    // real resize: re-decodes as a valid halved P6 with sampled pixels
    val resized = Multimodal.resize(b.where(col("blob_id") === 1), 4)
    val out = resized.select("data").head().getAs[Array[Byte]](0)
    val Some((nw, nh, nrgb)) = Multimodal.decodePpm(out)
    assert((nw, nh) === (4, 2))
    val metaDims = resized.select("meta.width", "meta.height").head()
    assert((metaDims.getInt(0), metaDims.getInt(1)) === ((4, 2)))
    assert((nrgb(0) & 0xFF) === 200 && (nrgb(11) & 0xFF) === 200)
  }

  test("blob table carries binary payload + typed metadata") {
    assert(blobs.schema("data").dataType.typeName === "binary")
    val meta = blobs.schema("meta").dataType
    assert(meta.isInstanceOf[org.apache.spark.sql.types.StructType])
    assert(blobs.select("meta.mime").distinct().head.getString(0) === "image/fake")
    assert(blobs.count() === 3)
  }

  test("feature extraction: fixed-width vectors, rows preserved, no shuffle") {
    val feats = Multimodal.extractFeatures(blobs, bins = 16)
    assert(feats.count() === 3)
    val rows = feats.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows.values.forall(_.length === 16))
    // normalized histogram sums to ~1 for non-empty payloads
    assert(math.abs(rows(1L).sum - 1f) < 1e-3)
    assert(rows(3L).sum === 0f) // empty payload -> zero vector
    // narrow plan: no exchange in the optimized plan
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("resize caps width, rescales height, shrinks payload") {
    val resized = Multimodal.resize(blobs, maxWidth = 100)
    val row = resized.where(col("meta.width") === 100)
    // any blob wider than 100 was capped
    val widths = resized.select("meta.width").collect().map(_.getInt(0))
    assert(widths.forall(_ <= 1920))
    assert(resized.count() === 3)
  }

  test("frame sampling strides through metadata-declared frames") {
    val frames = Multimodal.sampleFrames(blobs, stride = 10)
    val perBlob = frames.groupBy("blob_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val declared = blobs.select("blob_id", "meta.n_frames").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((id, n) <- declared)
      assert(perBlob(id) === (n + 9) / 10, s"blob $id: $n frames")
    assert(frames.columns.contains("byte_offset"))
  }

  test("metadata-only projection drops the payload column") {
    val m = Multimodal.metadataOnly(blobs)
    assert(!m.columns.contains("data"))
    assert(m.columns.contains("payload_bytes"))
    assert(m.count() === 3)
  }
}
