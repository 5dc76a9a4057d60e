package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Emoticon pins from the reference's EmojiTests
  * (`/root/reference/src/test/scala-2.11/ch/uzh/sentiment/utils/EmojiTests.scala:9-28`)
  * plus the fixed substitution semantics (plain word, never `Some(x)` —
  * SURVEY.md Q2). */
class EmojiSpec extends AnyFunSuite {

  test("positive emoticons map to happy") {
    assert(Emoji.base(":)") === "happy")
    assert(Emoji.base(":D") === "happy")
    assert(Emoji.base("<3") === "happy")
  }

  test("negative emoticons map to sad") {
    assert(Emoji.base(":(") === "sad")
    assert(Emoji.base(":-(") === "sad")
    assert(Emoji.base(":'(") === "sad")
  }

  test("toWords substitutes the plain word (never Some(...))") {
    val out = Emoji.toWords(Emoji.base)("i am :) today")
    assert(out === "i am happy today")
    assert(!out.contains("Some("))
  }

  test("unknown tokens pass through unchanged") {
    assert(Emoji.toWords(Emoji.base)("no emoticons here") === "no emoticons here")
  }

  test("csv table extends the base map; base wins on conflict") {
    val lines = Iterator(
      "\"GRINNING FACE\";\"😀\";\"x\";\"y\"",
      "\"COLON PAREN\";\":)\";\"x\";\"y\"")
    val table = Emoji.parseCsvLines(lines)
    assert(table("😀") === "GRINNING FACE")
    assert(table(":)") === "happy") // base wins
  }

  test("classpath emojis.csv resource loads 800+ entries") {
    val table = Emoji.fromResource()
    assert(table.size > 800)
    assert(table("✈") === "AIRPLANE")
    assert(table(":)") === "happy")
  }

  test("frozen q83 oracle truth table matches the runtime resource parse") {
    // EmojiOracle was generated from emojis.csv by an INDEPENDENT
    // parser and committed; if the Scala parse and the frozen table
    // ever disagree, one of them regressed. Row ORDER is irrelevant
    // to a SQL VALUES list (compare as sets — python sorts by code
    // point, Scala by UTF-16 code unit), but the pick table's order
    // IS load-bearing (the Spark side indexes it), so compare exact.
    def escSql(s: String) = s.replace("'", "''")
    val runtime = Emoji.fromResourceTable
    val frozen = EmojiOracle.emoValues.split(",\n").toSet
    val expected = runtime.map { case (n, w) =>
      s"('${escSql(n)}', '${escSql(w)}')"
    }.toSet
    assert(frozen === expected)

    val emoticons = Emoji.base.keys.toSeq.sorted
    assert(emoticons.length === EmojiOracle.pickCount)
    val expectedPick = emoticons.zipWithIndex.map { case (e, i) =>
      s"($i, '${escSql(e)}')"
    }.mkString(",\n")
    assert(expectedPick === EmojiOracle.pickValues)
  }
}
