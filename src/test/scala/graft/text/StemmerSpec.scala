package graft.text

import org.scalatest.funsuite.AnyFunSuite

/**
 * Porter-stemmer behavior pins — the 50 word->stem vectors from the
 * reference's StemmerTests
 * (`/root/reference/src/test/scala-2.11/ch/uzh/sentiment/utils/StemmerTests.scala:9-84`),
 * including the reference's deliberate step-1b ordering deviation
 * (feed->fe, agreed->agr). These vectors pin the dictionary-merge
 * semantics of the word-score path, so they must never regress.
 */
class StemmerSpec extends AnyFunSuite {

  private def check(vectors: (String, String)*): Unit =
    for ((word, expected) <- vectors)
      assert(Stemmer.stem(word) === expected, s"stem($word)")

  test("plurals") {
    check(
      "caresses" -> "caress",
      "caress" -> "caress",
      "tonies" -> "toni",
      "pies" -> "pi",
      "dogs" -> "dog")
  }

  test("past participles (reference step-1b order: feed->fe, agreed->agr)") {
    check(
      "feed" -> "fe",
      "agreed" -> "agr",
      "plastered" -> "plaster",
      "bled" -> "bled",
      "motoring" -> "motor",
      "hissing" -> "hiss",
      "fizzed" -> "fizz",
      "failing" -> "fail",
      "filing" -> "file",
      "happy" -> "happi",
      "sky" -> "sky")
  }

  test("suffix changes") {
    check(
      "relational" -> "relat",
      "conditional" -> "condit",
      "rational" -> "ration",
      "valenci" -> "valenc",
      "hesitanci" -> "hesit",
      "digitizer" -> "digit",
      "conformabli" -> "conform",
      "radicalli" -> "radic",
      "differentli" -> "differ",
      "vileli" -> "vile",
      "analogousli" -> "analog",
      "vietnamization" -> "vietnam",
      "predication" -> "predic",
      "operator" -> "oper",
      "hopeful" -> "hope",
      "goodness" -> "good",
      "revival" -> "reviv",
      "allowance" -> "allow",
      "inference" -> "infer",
      "airliner" -> "airlin",
      "gyroscopic" -> "gyroscop",
      "adjustable" -> "adjust",
      "defensible" -> "defens",
      "irritant" -> "irrit",
      "replacement" -> "replac",
      "adjustment" -> "adjust",
      "dependent" -> "depend",
      "adoption" -> "adopt",
      "homologou" -> "homolog",
      "communism" -> "commun",
      "activate" -> "activ",
      "angulariti" -> "angular",
      "homologous" -> "homolog",
      "effective" -> "effect",
      "roll" -> "roll")
  }

  test("stemming a stem is idempotent on the reference vectors") {
    val stems = Seq("caress", "dog", "plaster", "motor", "fail", "file",
      "relat", "oper", "good", "allow", "depend", "adopt", "roll")
    for (s <- stems) assert(Stemmer.stem(s) === s, s"stem($s) not fixed")
  }
}
