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
