package graft.ops

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, forAllNoShrink}

/** Randomized coverage of the r15 perceptual-hash kernels — both are
  * hand-rolled integer pooling code whose invariants (replication
  * invariance, codec-losslessness transparency, sign-blind envelope)
  * the dedup modalities ride on, so they get property coverage beyond
  * MultimodalSpec's hand-picked shapes. No SparkSession. */
object MultimodalProps extends Properties("multimodal") {

  private val dims: Gen[(Int, Int)] =
    Gen.zip(Gen.choose(9, 40), Gen.choose(8, 32))

  // grid-ALIGNED dims (w % 9 == 0, h % 8 == 0): bit-exact replication
  // invariance holds exactly there — off alignment the integer cell
  // boundaries of the k-fold image shift edge pixels between cells
  // (the property run that found this is documented at dhash64)
  private val alignedDims: Gen[(Int, Int)] =
    Gen.zip(Gen.choose(1, 4).map(_ * 9), Gen.choose(1, 4).map(_ * 8))

  private def rgbOf(w: Int, h: Int, seed: Long): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
  }

  private def replicate(w: Int, h: Int, rgb: Array[Byte],
                        k: Int): Array[Byte] = {
    val out = new Array[Byte](k * w * k * h * 3)
    var y = 0
    while (y < k * h) {
      var x = 0
      while (x < k * w) {
        val s = 3 * ((y / k) * w + (x / k))
        val d = 3 * (y * k * w + x)
        out(d) = rgb(s); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  // noShrink: the shrinker ignores generator bounds, and the
  // invariance contract is exactly the aligned-dims domain
  property("dhash64: invariant under k-fold pixel replication (aligned dims)") =
    forAllNoShrink(alignedDims, Gen.long, Gen.choose(2, 3)) { case ((w, h), seed, k) =>
      val rgb = rgbOf(w, h, seed)
      Multimodal.dhash64(w, h, rgb) ==
        Multimodal.dhash64(k * w, k * h, replicate(w, h, rgb, k))
    }

  property("dhash64: lossless PNG round-trip preserves the hash") =
    forAll(dims, Gen.long) { case ((w, h), seed) =>
      val rgb = rgbOf(w, h, seed)
      val Some((dw, dh, back)) =
        Multimodal.decodeRaster(Multimodal.encodePng(w, h, rgb))
      Prop(dw == w && dh == h) &&
        Prop(Multimodal.dhash64(dw, dh, back) == Multimodal.dhash64(w, h, rgb))
    }

  private val samples: Gen[Array[Short]] =
    Gen.zip(Gen.choose(65, 400), Gen.long).map { case (n, seed) =>
      val rnd = new scala.util.Random(seed)
      Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
    }

  // window-ALIGNED length (n % 65 == 0): same boundary argument as
  // alignedDims
  private val alignedSamples: Gen[Array[Short]] =
    Gen.zip(Gen.choose(1, 6).map(_ * 65), Gen.long).map { case (n, seed) =>
      val rnd = new scala.util.Random(seed)
      Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
    }

  property("audioHash64: invariant under k-fold sample replication (aligned n)") =
    forAllNoShrink(alignedSamples, Gen.choose(2, 4)) { (s, k) =>
      val up = Array.tabulate[Short](k * s.length)(i => s(i / k))
      Multimodal.audioHash64(s) == Multimodal.audioHash64(up)
    }

  property("audioHash64: sign-blind (the envelope pools |amplitude|)") =
    forAll(samples) { s =>
      // Short.MinValue has no Short negation — flip via Long, clamp
      val flipped = s.map(v =>
        math.max(-32768L, math.min(32767L, -v.toLong)).toShort)
      // clamping perturbs only |MinValue| by 1 — restrict the claim
      // to inputs without MinValue (the generator rarely emits it)
      s.contains(Short.MinValue) ||
        Multimodal.audioHash64(s) == Multimodal.audioHash64(flipped)
    }
}
