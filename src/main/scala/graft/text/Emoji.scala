package graft.text

/**
 * Emoticon/emoji -> word mapping.
 *
 * Capability parity with the reference's `Emoji`
 * (`/root/reference/.../utils/Emoji.scala:9-38`): a base table of ASCII
 * emoticons mapped to "happy"/"sad", optionally extended with a
 * description table (the reference loads an `emojis.csv` resource with
 * `"Description";"Native";...` rows; we accept the same shape via
 * [[withTable]]).
 *
 * Deviations from the reference, per SURVEY.md Q2 (intended semantics):
 *  - the substituted value is the plain word, never `Some(word)`;
 *  - the map is an immutable value handed to a Spark broadcast, not a
 *    `@transient var` mutated inside `DataFrame.foreach` (which loses the
 *    CSV rows in cluster mode).
 */
object Emoji {

  private val happyEmoticons = List(
    ":-)", ":)", ";)", ":o)", ":]", ":3", ":c)", ":>", "=]", "8)", "=)",
    ":}", ":^)", ":-D", ":D", "8-D", "8D", "x-D", "xD", "X-D", "XD", "=-D",
    "=D", "=-3", "=3", ":-))", ":'-)", ":')", ":*", ":^*", ">:P", ":-P",
    ":P", "X-P", "x-p", "xp", "XP", ":-p", ":p", "=p", ":-b", ":b", ">:)",
    ">;)", ">:-)", "<3")

  private val sadEmoticons = List(
    ":L", ":-/", ">:/", ":S", ">:[", ":@", ":-(", ":[", ":-||", "=L", ":<",
    ":-[", ":-<", "=\\", "=/", ">:(", ":(", ">.<", ":'-(", ":'(", ":\\",
    ":-c", ":c", ":{", ">:\\", ";(")

  /** The built-in emoticon table. */
  val base: Map[String, String] =
    (happyEmoticons.map(_ -> "happy") ++ sadEmoticons.map(_ -> "sad")).toMap

  /** Extend the base table with (native, description) pairs, e.g. parsed
    * from an emojis.csv resource. Base emoticons win on conflict (they are
    * inserted last in the reference too). */
  def withTable(native2word: Iterable[(String, String)]): Map[String, String] =
    native2word.toMap ++ base

  /** Split one `;`-separated CSV line honoring double-quoted fields
    * (quotes may contain `;`; `""` escapes a literal quote). */
  private[text] def splitCsvLine(line: String, sep: Char = ';'): Array[String] = {
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur += '"'; i += 1 }
          else inQuotes = false
        } else cur += c
      } else {
        if (c == '"') inQuotes = true
        else if (c == sep) { fields += cur.result(); cur.clear() }
        else cur += c
      }
      i += 1
    }
    fields += cur.result()
    fields.toArray
  }

  /** Parse reference-shaped emoji CSV lines: `"Description";"Native";...`,
    * header already dropped. Driver-side; the result is broadcast. */
  def parseCsvLines(lines: Iterator[String]): Map[String, String] = {
    val pairs = lines.flatMap { line =>
      val parts = splitCsvLine(line)
      if (parts.length >= 2) {
        val desc = parts(0)
        val native = parts(1)
        if (desc.nonEmpty && native.nonEmpty) Some(native -> desc) else None
      } else None
    }
    withTable(pairs.toList)
  }

  /** The full emoji table from the bundled `emojis.csv` resource (same
    * 843-row data as the reference's `src/main/resources/emojis.csv`,
    * loaded at `utils/IO.scala:73-77`), extended with [[base]]. Loaded
    * once per JVM — executors read their own classpath copy, no
    * driver-side broadcast needed. */
  lazy val fromResourceTable: Map[String, String] = {
    val in = getClass.getResourceAsStream("/graft/emojis.csv")
    require(in != null, "classpath resource /graft/emojis.csv missing")
    try parseCsvLines(
      scala.io.Source.fromInputStream(in, "UTF-8").getLines().drop(1))
    finally in.close()
  }

  def fromResource(): Map[String, String] = fromResourceTable

  /** Token-wise substitution: each space-separated token found in `table`
    * is replaced by its word. */
  def toWords(table: Map[String, String])(text: String): String =
    text.split(" ").map(w => table.getOrElse(w, w)).mkString(" ")
}
