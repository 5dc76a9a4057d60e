package graft.text

import java.util.regex.Pattern

/**
 * Tweet-aware tokenizer.
 *
 * Re-implements the tokenization behavior of TweetMotif (O'Connor,
 * Krieger, Ahn 2009-2010, Apache License 2.0), which the reference uses as
 * its first text-normalization stage
 * (`/root/reference/.../utils/TweetTokenizer.scala:83-122`): a set of
 * "protected" span patterns (emoticons, URLs, emails, HTML entities,
 * times, numbers, punctuation runs, abbreviations, hashtags, @mentions,
 * hearts/arrows) are kept as single tokens; the text between protected
 * spans is split on spaces after detaching edge punctuation from words.
 *
 * This runs per-row inside a UDF, so all patterns are compiled once here.
 */
object TweetTokenizer {

  private def or(parts: String*): String = parts.mkString("(", "|", ")")

  // --- protected span vocabulary -------------------------------------
  private val punctChars = """['“".?!,:;]"""
  private val punctSeq = punctChars + "+"
  private val entity = """&(amp|lt|gt|quot);"""

  private val urlStart1 = """(https?://|www\.)"""
  private val commonTlds = """(com|co\.uk|org|net|info|ca|ly|mp|edu|gov)"""
  private val urlStart2 = """[A-Za-z0-9\.-]+?\.""" + commonTlds + """(?=[/ \W])"""
  private val urlBody = """[^ \t\r\n<>]*?"""
  private val urlExtraBeforeEnd = "(" + punctChars + "|" + entity + ")+?"
  private val urlEnd = """(\.\.+|[<>]|\s|$)"""
  private val url =
    """\b(""" + urlStart1 + "|" + urlStart2 + ")" + urlBody +
      "(?=(" + urlExtraBeforeEnd + ")?" + urlEnd + ")"

  private val timeLike = """\d+:\d+"""
  private val numNum = """\d+\.\d+"""
  private val numComma = """(\d+,)+?\d{3}(?=([^,]|$))"""

  private val boundaryNotDot = """($|\s|[“"?!,:;]|""" + entity + ")"
  private val dottedAbbrevA = """([A-Za-z]\.){2,}(?=""" + boundaryNotDot + ")"
  private val dottedAbbrevB = """[^A-Za-z]([A-Za-z]\.){1,}[A-Za-z](?=""" + boundaryNotDot + ")"
  private val titleAbbrev = """\b([Mm]r|[Mm]rs|[Mm]s|[Dd]r|[Ss]r|[Jj]r|[Rr]ep|[Ss]en|[Ss]t)\."""
  private val abbrev = or(dottedAbbrevA, dottedAbbrevB, titleAbbrev)

  private val separators = "(--+|―)"
  private val decorations = "[♫]+"
  private val wordInternal = """[^\s\.,]"""
  private val embeddedApostrophe = wordInternal + "+'" + wordInternal + "+"

  private val eyes = "(?iu)[:=]"
  private val wink = "[;]"
  private val nose = "(|o|O|-|[^a-zA-Z0-9 ])"
  private val happyMouth = """[D\)\]]+"""
  private val sadMouth = """[\(\[]+"""
  private val tongue = "[pP]"
  private val otherMouth = """[doO/\\]+"""
  private val emoticon = or(
    or(eyes, wink) + nose + or(tongue, otherMouth, sadMouth, happyMouth),
    "(?<=( |^))" + or(sadMouth, happyMouth, otherMouth) + nose + or(eyes, wink))

  private def withEntities(pat: String): String =
    pat.replace("<", "(<|&lt;)").replace(">", "(>|&gt;)")
  private val hearts = withEntities("""(<+/?3+)""")
  private val arrows = withEntities("""(<*[-=]*>+|<+[-=]*>*)""")
  private val hashtag = "#[a-zA-Z0-9_]+"
  private val atMention = "@[a-zA-Z0-9_]+"
  private val bound = """(\W|^|$)"""
  private val email =
    "(?<=" + bound + """)[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,4}(?=""" + bound + ")"

  private val protectedPattern: Pattern = Pattern.compile(or(
    hearts, arrows, emoticon, url, email, entity, timeLike, numNum, numComma,
    punctSeq, abbrev, separators, decorations, embeddedApostrophe,
    hashtag, atMention))

  // --- edge punctuation ------------------------------------------------
  private val edgePunct = """['"“”‘’«»{}\(\)\[\]\*]"""
  private val notEdgePunct = "[a-zA-Z0-9]"
  private val offEdge = """(^|$|:|;|\s)"""
  private val edgeLeft = Pattern.compile(offEdge + "(" + edgePunct + "+)(" + notEdgePunct + ")")
  private val edgeRight = Pattern.compile("(" + notEdgePunct + ")(" + edgePunct + "+)" + offEdge)

  private val wsPattern = Pattern.compile("""\s+""")

  private def splitEdgePunctuation(s: String): String = {
    val a = edgeLeft.matcher(s).replaceAll("$1$2 $3")
    edgeRight.matcher(a).replaceAll("$1 $2$3")
  }

  private def squeezeWhitespace(s: String): String =
    wsPattern.matcher(s).replaceAll(" ").trim

  /** Tokenize: protected spans stay whole; the gaps split on single spaces;
    * empty tokens dropped. */
  def tokenize(text: String): List[String] = {
    val s = splitEdgePunctuation(squeezeWhitespace(text))
    val m = protectedPattern.matcher(s)
    val out = List.newBuilder[String]
    var pos = 0
    def emitGap(until: Int): Unit = {
      val gap = s.substring(pos, until).trim
      if (gap.nonEmpty) gap.split(" ").foreach(t => if (t.nonEmpty) out += t)
    }
    while (m.find()) {
      emitGap(m.start())
      val tok = s.substring(m.start(), m.end())
      if (tok.nonEmpty) out += tok
      pos = m.end()
    }
    emitGap(s.length)
    out.result()
  }

  /** Unescape the entities the tokenizer preserved as tokens. */
  def normalizeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")

  def tokenizeToString(text: String): String =
    tokenize(text).map(normalizeEntities).mkString(" ")
}
