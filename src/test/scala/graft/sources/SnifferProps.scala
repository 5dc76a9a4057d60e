package graft.sources

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests over the CSV dialect sniffers' pure kernels
  * (SURVEY §2 S5–S7): generate a dialect (delimiter, header or not,
  * quoted multi-word field or not), render the first two lines the way
  * a writer of that dialect would, and pin sniff(write(dialect)) ==
  * dialect. Fields draw from a delimiter-free alphabet — the
  * reference's count-based sniff is defined for dialects whose field
  * content does not embed candidate delimiters (an embedded delimiter
  * changes per-line counts; that asymmetric case is pinned separately
  * as a non-crashing fallback, matching the reference semantics). */
object SnifferProps extends Properties("sniffers") {

  // all sniffable delimiters: the four candidates plus the ';' fallback
  private val delims = Seq(",", "|", ":", "\t", ";")

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)
  private val numField: Gen[String] = Gen.choose(0, 999999).map(_.toString)
  // a column is rendered as numbers or words on data lines
  private val colIsNumeric: Gen[Boolean] = Gen.oneOf(true, false)

  private case class Dialect(delim: String, types: List[Boolean])
  private val dialect: Gen[Dialect] = for {
    d <- Gen.oneOf(delims)
    n <- Gen.choose(2, 6) // 1-column files have no delimiter to sniff
    ts <- Gen.listOfN(n, colIsNumeric)
  } yield Dialect(d, ts)

  private def dataLine(d: Dialect, seed: Long): String =
    d.types.zipWithIndex.map { case (num, i) =>
      if (num) ((seed * 31 + i) % 100000).toString else s"w${seed}c$i"
    }.mkString(d.delim)

  private def headerLine(d: Dialect): String =
    d.types.indices.map(i => s"col$i").mkString(d.delim)

  property("delimiterOf: round-trips every sniffable dialect") =
    forAll(dialect, Gen.choose(0L, 1000L)) { (d, s) =>
      val lines = Array(dataLine(d, s), dataLine(d, s + 1))
      Prop(FormatIO.delimiterOf(lines) == d.delim) :| s"dialect $d"
    }

  property("delimiterOf: headered render still agrees (same field count)") =
    forAll(dialect, Gen.choose(0L, 1000L)) { (d, s) =>
      FormatIO.delimiterOf(Array(headerLine(d), dataLine(d, s))) == d.delim
    }

  property("headerOf: header over >=1 numeric column detected; " +
    "headerless numeric file is not a false positive") =
    forAll(dialect, Gen.choose(0L, 1000L)) { (d0, s) =>
      // force at least one numeric column — an all-words schema is
      // header-undecidable by the reference rule (documented)
      val d = d0.copy(types = true :: d0.types.tail)
      Prop(FormatIO.headerOf(Array(headerLine(d), dataLine(d, s)), d.delim)) &&
        Prop(!FormatIO.headerOf(Array(dataLine(d, s), dataLine(d, s + 1)), d.delim))
    }

  property("escapeOf: quoted multi-word field on line 2 => that quote; " +
    "unquoted => None") =
    forAll(dialect, Gen.oneOf("\"", "'"), Gen.choose(4, 8), Gen.choose(0L, 1000L)) {
      (d, q, nWords, s) =>
        val multi = (1 to nWords).map(i => s"m${i}x").mkString(" ")
        def render(field: String) =
          (field :: d.types.tail.zipWithIndex.map { case (num, i) =>
            if (num) ((s * 31 + i) % 100000).toString else s"w${s}c$i"
          }).mkString(d.delim)
        val quoted = Array(headerLine(d), render(q + multi + q))
        val bare = Array(headerLine(d), render(multi.replace(" ", "_")))
        Prop(FormatIO.escapeOf(quoted, d.delim) == Some(q)) :| "quoted" &&
          Prop(FormatIO.escapeOf(bare, d.delim).isEmpty) :| "unquoted"
    }

  property("full dialect round-trip: delimiter + header + escape together") =
    forAll(dialect, Gen.oneOf("\"", "'"), Gen.choose(0L, 1000L)) { (d0, q, s) =>
      // the quoted field takes the FIRST column's slot on line 2, so
      // the numeric column the header rule needs must sit in the tail
      val d = d0.copy(types = d0.types.head :: true :: d0.types.drop(2))
      val quotedField = q + "alpha beta gamma delta" + q
      val line2 = (quotedField :: d.types.tail.zipWithIndex.map {
        case (num, i) => if (num) ((s * 31 + i) % 100000).toString
                         else s"w${s}c$i"
      }).mkString(d.delim)
      val lines = Array(headerLine(d), line2)
      val delim = FormatIO.delimiterOf(lines)
      Prop(delim == d.delim) :| "delimiter" &&
        Prop(FormatIO.headerOf(lines, delim)) :| "header" &&
        Prop(FormatIO.escapeOf(lines, delim) == Some(q)) :| "escape"
    }

  property("degenerate inputs fall back, never throw") = {
    val one = Array("only one line")
    Prop(FormatIO.delimiterOf(Array.empty) == ",") &&
      Prop(FormatIO.delimiterOf(one) == ",") &&
      Prop(!FormatIO.headerOf(one, ",")) &&
      Prop(FormatIO.escapeOf(one, ",").isEmpty) &&
      // embedded delimiter in a quoted field breaks count symmetry:
      // the sniff falls back to ';' (reference semantics) rather than
      // guessing — pinned so the fallback is never silently changed
      Prop(FormatIO.delimiterOf(Array(
        "a,b,c", "\"x, y\",b,c")) == ";")
  }
}
