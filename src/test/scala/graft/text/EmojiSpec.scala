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
}
