package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only the last ~2000 characters of the bench
  * process's output; sbt appends a `[success] Total time: ...` trailer
  * (~80 chars) after our line. Round 4's bench line overflowed that
  * window and the driver recorded `parsed: null`. This spec pins the
  * budget: the driver-facing JSON line, built from the REAL registered
  * query names with every value at `Bench.fmt`'s 5-char width ceiling,
  * must stay under 1900 characters (capture minus trailer) so the
  * whole line always survives the capture.
  */
class BenchFormatSpec extends AnyFunSuite {

  test("bench stdout line fits the driver's 2000-char tail capture") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    assert(names.nonEmpty)
    // the stdout line keys each query by its bare numeric id (the
    // sidecar keeps full names); the ids must stay unique or
    // two queries would collapse into one JSON key
    val keys = names.map(Bench.shortKey)
    assert(keys.distinct.size == names.size,
      s"duplicate bench short keys: ${keys.diff(keys.distinct).distinct}")
    // worst case: every value at fmt's 5-char width ceiling (9.999 s —
    // ms-resolution sub-10s values, the widest realistic rendering),
    // THROUGH the real adaptive renderer: when the battery outgrows
    // the window at full precision, the values degrade a decimal
    // instead of overflowing the capture
    assert(Bench.fmt(9.999).length == 5)
    val qs = Bench.adaptiveQs(names.map(n => (n, 9.999)))
    // include the optional vsb field at its widest so the budget holds
    // on the provenance-carrying sf0.1 line too
    val line = Bench.line(9.999 * names.size, qs, "{}",
      "/root/testdata/sf0.1", 0, Some(9999.9))
    // budget: 2000-char driver capture minus the ~80-char sbt trailer,
    // minus safety margin
    assert(line.length < 1900,
      s"bench line is ${line.length} chars for ${names.size} queries; " +
        "it must fit (with sbt trailer) in the 2000-char capture window")
    assert(line.startsWith("""{"metric":"total","value":"""))
    // while the battery is SMALL the renderer must keep ms precision —
    // degradation is a last resort, not a default
    val small = Bench.adaptiveQs((1 to 50).map(i => (s"q${i}_x", 9.999)))
    assert(small.contains(""":9.999"""),
      "adaptive renderer degraded precision without budget pressure")
  }

  test("fmt keeps ms precision without scientific notation") {
    val qs = """{"q1":0.001}"""
    val line = Bench.line(0.0011234, qs, "{}", "/tmp/x")
    assert(line.contains(""""value":0.001,"""))
  }

  test("line fits the capture window even when EVERY query errors") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // worst case: all queries fail with max-length (120-char) messages
    val errs = Bench.boundedErrs(names.map(n => (n, "x" * 120)))
    val line = Bench.line(0.0, "{}", errs, "/root/testdata/sf0.1",
      names.size)
    assert(line.contains(s""""nerr":${names.size},"""),
      "error count must be a loud top-level field")
    assert(line.length < 1800,
      s"all-failing bench line is ${line.length} chars; must fit the " +
        "2000-char capture window so diagnostics survive truncation")
    assert(errs.contains("\"__dropped\":" + (names.size - 3)))
  }

  test("boundedErrs escapes and truncates messages, keeps small sets whole") {
    val errs = Bench.boundedErrs(Seq(("q1", "a\"b\\c\nd"), ("q2", "ok")))
    assert(errs == """{"1":"a b c d","2":"ok"}""")
    val one = Bench.boundedErrs(Seq(("q1", "y" * 200)))
    assert(one == s"""{"1":"${"y" * 60}"}""")
  }

  test("baselineRows parses BASELINE.md's per-query table") {
    val rows = Bench.baselineRows()
    // the table exists in this repo and covers (nearly) the whole
    // battery; a parse regression would silently drop the vsb
    // provenance field, so pin a floor and a couple of known rows
    assert(rows.size > 100, s"only ${rows.size} baseline rows parsed")
    assert(rows.contains("q57_curate"))
    assert(rows("q1_agg") > 0.0)
    assert(rows.values.forall(v => v > 0.0 && v < 1000.0))
  }

  test("vsb rides the line only when provided") {
    val withV = Bench.line(1.0, "{}", "{}", "/x/sf0.1", 0, Some(0.743))
    assert(withV.contains(""""vsb":0.743,"queries""""))
    val without = Bench.line(1.0, "{}", "{}", "/x/sf0.001")
    assert(!without.contains("vsb"))
  }
}
