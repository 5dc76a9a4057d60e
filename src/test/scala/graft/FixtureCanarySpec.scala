package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/**
 * Fixture canary: pins the driver-generated testdata's row counts and
 * (for documents, the table every pinned-VALUES oracle reads) a
 * content digest. The round-8 events regeneration changed a column
 * TYPE and broke three surfaces at driver time with no local signal;
 * and the pinned oracles (q16/q25/q86/q87) are frozen against the
 * sf0.01 documents CONTENT. If the driver regenerates fixtures, this
 * spec fails FIRST and names the real cause — "fixture changed,
 * regenerate the pins (see PinnedOracles)" — instead of letting a
 * pin mismatch masquerade as an operator regression.
 */
class FixtureCanarySpec extends AnyFunSuite with SparkTestSession {

  private val expected = Map(
    // sf -> (docs rows, docs digest, embeddings rows, events rows)
    "sf0.001" -> (500L, "284232896179792907669", 500L, 1000L),
    "sf0.01" -> (500L, "284304104730205278993", 500L, 10000L),
    "sf0.1" -> (5000L, "2854386515680961053428", 2000L, 100000L))

  test("driver fixtures match the shapes the pinned oracles were frozen on") {
    for ((sf, (nDocs, digest, nEmb, nEv)) <- expected) {
      val base = s"/root/testdata/$sf"
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(base))) {
        val docs = spark.read.parquet(s"$base/documents.parquet")
        val row = docs.agg(
          count(lit(1)),
          sum(graft.ops.Profile.rowDigest(Seq(col("doc_id"), col("text"))))
            .cast("string")).head()
        assert(row.getLong(0) === nDocs, s"$sf documents row count")
        assert(row.getString(1) === digest,
          s"$sf documents content digest — the fixture was regenerated; " +
            "re-freeze PinnedOracles (q16/q25/q86/q87) from a fresh " +
            "Verify run before trusting any pin mismatch as a code bug")
        assert(spark.read.parquet(s"$base/embeddings.parquet").count() === nEmb,
          s"$sf embeddings row count")
        assert(spark.read.parquet(s"$base/events.parquet").count() === nEv,
          s"$sf events row count")
      }
    }
  }
}
