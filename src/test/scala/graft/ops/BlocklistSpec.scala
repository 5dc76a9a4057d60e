package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Aho–Corasick semantics: overlapping counts, suffix-chain outputs,
  * case folding. */
class BlocklistSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("classic he/she/his/hers automaton on 'ushers'") {
    val ac = new Blocklist.AhoCorasick(Seq("he", "she", "his", "hers"))
    assert(ac.scan("ushers") === ((3L, 3))) // she, he, hers
    assert(ac.scan("his hers") === ((3L, 3))) // his, he (in hers), hers
    assert(ac.scan("x") === ((0L, 0)))
    assert(ac.scan(null) === ((0L, 0)))
  }

  test("overlapping occurrences all count") {
    val ac = new Blocklist.AhoCorasick(Seq("aa"))
    assert(ac.scan("aaa") === ((2L, 1)))
    val ac2 = new Blocklist.AhoCorasick(Seq("a", "aa"))
    assert(ac2.scan("aaa") === ((5L, 2))) // a x3 + aa x2
  }

  test("matching is case-insensitive on both sides") {
    val ac = new Blocklist.AhoCorasick(Seq("Scan"))
    assert(ac.scan("SCAN scan sCaN") === ((3L, 1)))
  }

  test("more than 64 patterns (multi-word masks)") {
    val pats = (0 until 70).map(i => f"pat$i%02d")
    val ac = new Blocklist.AhoCorasick(pats)
    val text = pats.mkString(" ")
    assert(ac.scan(text) === ((70L, 70)))
    assert(ac.scan("pat69 pat69") === ((2L, 1)))
  }

  test("annotate is map-only with correct columns") {
    val docs = Seq((1L, "a scanner can scan"), (2L, "nothing here"))
      .toDF("doc_id", "text")
    val out = Blocklist.annotate(docs, "doc_id", "text",
      Seq("scan", "can", "an")).orderBy("doc_id").collect()
    // doc1: scan(2: scanner, scan) + can(3: sCANner, CAN, sCAN) +
    //       an(3: scANner, cAN->, ...) — verify via independent count
    def naive(t: String, ps: Seq[String]): (Long, Int) = {
      val lower = t.toLowerCase
      val counts = ps.map { p =>
        (0 to lower.length - p.length)
          .count(i => lower.regionMatches(i, p, 0, p.length))
      }
      (counts.map(_.toLong).sum, counts.count(_ > 0))
    }
    val exp1 = naive("a scanner can scan", Seq("scan", "can", "an"))
    assert((out(0).getLong(1), out(0).getInt(2)) === exp1)
    assert(out(0).getBoolean(3))
    assert((out(1).getLong(1), out(1).getInt(2), out(1).getBoolean(3)) ===
      ((0L, 0, false)))
    val plan = Blocklist.annotate(docs, "doc_id", "text", Seq("x"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1000))
  }

  test("annotate is streaming-safe: streamed result equals batch") {
    val dir = java.nio.file.Files.createTempDirectory("blocklist_stream_")
    val docsDir = dir.resolve("docs").toString
    val docs = Seq((1L, "a scanner can scan"), (2L, "nothing here"),
      (3L, "row row row"))
      .toDF("doc_id", "text")
    docs.write.parquet(docsDir)
    val schema = spark.read.parquet(docsDir).schema
    val stream = spark.readStream.schema(schema).parquet(docsDir)
    val annotated = Blocklist.annotate(stream, "doc_id", "text",
      Seq("scan", "can", "an", "row"))
    assert(annotated.isStreaming) // map-only: no state, no watermark
    val name = "blocklist_stream_out"
    annotated.writeStream.format("memory").queryName(name)
      .outputMode("append") // map-only stream: append, not complete
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    val streamed = spark.table(name).orderBy("doc_id").collect().toSeq
    val batch = Blocklist.annotate(docs, "doc_id", "text",
      Seq("scan", "can", "an", "row")).orderBy("doc_id").collect().toSeq
    assert(streamed === batch)
  }
}
