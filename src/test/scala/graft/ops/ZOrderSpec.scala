package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Morton interleave bit-exactness, integer quantization parity, and
  * the skipping report's core claim: z-order prunes on BOTH axes,
  * linear only on its sort axis. */
class ZOrderSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("interleaved matches the scalar Morton reference") {
    val pairs = for (x <- 0L to 16L; y <- Seq(0L, 1L, 7L, 200L, 255L))
      yield (x, y)
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.interleaved(col("x"), col("y"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) === mortonRef(x, y, 8), s"($x, $y)")
    }
  }

  test("quantized is exact integer floor division") {
    val rows = (0L to 200L).toDF("v")
      .select(col("v"),
        ZOrder.quantized(col("v"), lit(0L), lit(200L), 8).as("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 200L).foreach { v =>
      assert(rows(v) === v * 255L / 200L, s"v=$v")
    }
    // degenerate span maps everything to 0
    val deg = Seq(5L).toDF("v")
      .select(ZOrder.quantized(col("v"), lit(5L), lit(5L), 8))
      .head().getLong(0)
    assert(deg === 0L)
  }

  test("z-order prunes both axes on a uniform grid; linear only x") {
    // full 64x64 grid, quantized identity (0..255 via 4x scale)
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong * 4, y.toLong * 4)).toDF("x", "y")
    val rep = ZOrder.skippingReport(grid, "x", "y",
      bits = 8, fileBits = 4, probeLoPct = 40, probeHiPct = 45)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (lnF, lnX, lnY, lnN) = rep("linear")
    val (zF, zX, zY, zN) = rep("zorder")
    assert(lnN === 4096L && zN === 4096L)
    assert(lnF === 16L && zF === 16L)
    // linear: the quantized probe [102, 114] straddles one 16-unit
    // stripe boundary (112) - 2 of 16 x-stripes; every stripe spans
    // the full y domain so a y probe reads everything
    assert(lnX === 2L, s"linear x hits: $lnX")
    assert(lnY === 16L, s"linear y hits: $lnY")
    // zorder: 16 files form a 4x4 (x,y) prefix grid - a single-axis
    // probe touches one stripe of 4 in that axis
    assert(zX === 4L, s"zorder x hits: $zX")
    assert(zY === 4L, s"zorder y hits: $zY")
  }

  test("writeClustered round-trips rows and clusters by the curve") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder_")
    val out = tmp.resolve("zo.parquet").toString
    try {
      val df = (for (x <- 0 until 32; y <- 0 until 32)
        yield (x.toLong, y.toLong)).toDF("x", "y")
      ZOrder.writeClustered(df, "x", "y", out, numFiles = 4, bits = 5)
      val back = spark.read.parquet(out)
      assert(back.count() === 1024L)
      assert(back.columns.toSeq.sorted === Seq("x", "y"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
