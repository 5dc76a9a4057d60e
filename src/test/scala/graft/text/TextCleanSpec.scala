package graft.text

import org.scalatest.funsuite.AnyFunSuite

/**
 * Golden input->output pairs for the cleaning chain, covering every
 * regex rule of the reference (`utils/Helper.scala:77-84`) plus
 * emoji/emoticon substitution with the fixed semantics (SURVEY.md Q2).
 */
class TextCleanSpec extends AnyFunSuite {

  test("cleanString: lowercase + quote removal") {
    assert(TextClean.cleanString("Hello \"World\" it's me") === "hello world its me")
  }

  test("cleanString: line breaks and tabs removed") {
    assert(TextClean.cleanString("a\nb\tc\rd") === "abcd")
  }

  test("cleanString: rt prefix, @mentions, hashtags, urls dropped") {
    assert(TextClean.cleanString("RT @user: check #spark http://t.co/xyz now")
      === ": check spark now")
  }

  test("cleanString: whitespace squeezed") {
    assert(TextClean.cleanString("a   b    c") === "a b c")
  }

  test("cleanText substitutes emoticons via the tweet tokenizer") {
    val out = TextClean.cleanText(Emoji.base)("i am :) about it")
    assert(out.contains("happy"))
    assert(!out.contains("Some("))
  }

  test("cleanTextAndStem stems before cleaning (reference order)") {
    // stemming runs on raw text first; "running" -> "run"
    val out = TextClean.cleanTextAndStem(Emoji.base)("running quickly")
    assert(out.startsWith("run"))
  }

  test("stemString maps each space-separated token") {
    assert(TextClean.stemString("dogs caresses") === "dog caress")
  }
}
