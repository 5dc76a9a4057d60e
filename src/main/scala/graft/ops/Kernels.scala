package graft.ops

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String

/**
 * Static Catalyst-typed kernels behind the `graft_shingles` /
 * `graft_minhash` codegen expressions
 * ([[graft.plans.ShinglesExpression]] / [[graft.plans.MinhashExpression]]).
 *
 * These operate directly on `UTF8String` / `ArrayData` so the
 * generated code makes ONE static call per row with no Scala-UDF
 * Option-boxing, no Row encoder round-trip, and no String round-trip
 * for the minhash input (shingle bytes hash straight from the UTF8
 * backing array). Semantics are pinned bit-for-bit to the UDF forms
 * (`Dedup.shingleSet` / `Dedup.signatureOf`) by GraftExtensionsSpec —
 * the md5-base60 + multiply-add family that every DuckDB oracle
 * replays must not fork.
 */
object Kernels {

  /** Word n-gram shingle set of a text value — [[Dedup.shingleSet]]
    * lifted to Catalyst types. Null-safe: null text yields the empty
    * set (the UDF contract). */
  def shinglesUtf8(text: UTF8String, n: Int): ArrayData = {
    val arr =
      if (text == null) Array.empty[String]
      else Dedup.shingleSet(text.toString, n)
    val out = new Array[AnyRef](arr.length)
    var i = 0
    while (i < arr.length) {
      out(i) = UTF8String.fromString(arr(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature of a shingle array — [[Dedup.signatureOf]]
    * lifted to Catalyst types. The md5 base hashes the element's UTF-8
    * bytes directly from the UTF8String (identical bytes to
    * `String.getBytes(UTF_8)` for any well-formed string — all Spark
    * string expressions produce well-formed UTF-8; on ill-formed bytes
    * smuggled in via a binary cast this raw-byte view is canonical,
    * matching what a parquet-reading oracle like DuckDB hashes, where
    * a String round-trip would substitute replacement chars). No
    * String materialization. Null-safe: a null array (or null
    * elements — same skip contract as the UDF) contributes nothing, so
    * the signature degenerates to the all--1L (unsigned max) sentinel
    * the UDF returns. Output is an UnsafeArrayData over a primitive
    * long array — no boxing on the write side either. */
  def minhashUtf8(shingles: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill(k)(-1L) // unsigned max sentinel
    if (shingles != null) {
      val md = java.security.MessageDigest.getInstance("MD5")
      val n = shingles.numElements()
      var i = 0
      while (i < n) {
        if (!shingles.isNullAt(i)) {
          val base = Dedup.md5Base60Bytes(md,
            shingles.getUTF8String(i).getBytes)
          var s = 0
          while (s < k) {
            val h = Dedup.seedHash(base, s)
            if (java.lang.Long.compareUnsigned(h, sig(s)) < 0) sig(s) = h
            s += 1
          }
        }
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }
}
