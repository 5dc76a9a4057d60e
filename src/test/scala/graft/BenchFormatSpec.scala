package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only the last ~2000 characters of the bench
  * process's output; sbt appends a `[success] Total time: ...` trailer
  * (~80 chars) after our line. Round 4's bench line overflowed that
  * window and the driver recorded `parsed: null`. This spec pins the
  * budget: the driver-facing JSON line, built from the REAL registered
  * query names with worst-case timing widths, must stay under 1800
  * characters so the whole line always survives the capture.
  */
class BenchFormatSpec extends AnyFunSuite {

  test("bench stdout line fits the driver's 2000-char tail capture") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    assert(names.nonEmpty)
    // worst case: every query slow (5-digit seconds at ms precision)
    val qs = names.map(n => s""""$n":99999.999""").mkString("{", ",", "}")
    val line = Bench.line(99999.999 * names.size, qs, "{}",
      "/root/testdata/sf0.1")
    assert(line.length < 1800,
      s"bench line is ${line.length} chars for ${names.size} queries; " +
        "it must fit (with sbt trailer) in the 2000-char capture window")
    assert(line.startsWith("""{"metric":"total","value":"""))
  }

  test("fmt keeps ms precision without scientific notation") {
    val qs = """{"q1":0.001}"""
    val line = Bench.line(0.0011234, qs, "{}", "/tmp/x")
    assert(line.contains(""""value":0.001,"""))
  }
}
