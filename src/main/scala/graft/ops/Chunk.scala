package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/**
 * Context-length document chunking — the prep step that turns long
 * documents into training-window-sized pieces: fixed `size`-token
 * chunks advancing by `size - overlap` tokens, so consecutive chunks
 * share `overlap` tokens of context. Chunk boundaries are token-exact
 * and deterministic: starts are 0, step, 2*step, ...; the chunk that
 * reaches the end of the document is the last one (no degenerate tail
 * chunk fully contained in its predecessor).
 *
 * Scale shape: one pass per row (single-pass UDF — the higher-order
 * slice/transform formulation evaluates interpreted per element and
 * profiled ~6x slower on the shingle pipeline, same lesson applies) +
 * posexplode; no shuffle. Downstream packing/batching shuffles on
 * whatever key the trainer needs.
 */
object Chunk {

  /** Array of space-joined chunk texts for one document. */
  private[ops] def chunksOf(tokens: Array[String], size: Int,
                            overlap: Int): Array[String] = {
    val step = size - overlap
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var done = false
    while (!done) {
      val end = math.min(start + size, tokens.length)
      buf += tokens.slice(start, end).mkString(" ")
      if (end >= tokens.length) done = true else start += step
    }
    buf.toArray
  }

  def chunkUdf(size: Int, overlap: Int): UserDefinedFunction = {
    require(size > overlap && overlap >= 0,
      "chunk size must exceed overlap (step must be positive)")
    udf((text: String) => {
      if (text == null) Array.empty[String]
      else {
        val tokens = text.trim.split("\\s+").filter(_.nonEmpty)
        if (tokens.isEmpty) Array.empty[String]
        else chunksOf(tokens, size, overlap)
      }
    })
  }

  /** Explode documents into (id, [carry...], chunk_id, chunk_text,
    * n_chunk_tokens) rows; documents with no tokens produce no chunks.
    * `carryCols` propagate row metadata (source, lang, split) through
    * the explode — at scale this beats re-joining the parent table on
    * id afterwards (a whole extra shuffle of the chunk set). */
  def explodeChunks(df: DataFrame, idCol: String, textCol: String,
                    size: Int, overlap: Int,
                    carryCols: Seq[String] = Nil): DataFrame =
    df.select(col(idCol) +: carryCols.map(col) :+
      posexplode(chunkUdf(size, overlap)(col(textCol)))
        .as(Seq("chunk_id", "chunk_text")): _*)
      .select(
        (col(idCol) +: carryCols.map(col)) ++ Seq(
          col("chunk_id").cast("long").as("chunk_id"),
          col("chunk_text"),
          org.apache.spark.sql.functions.size(split(col("chunk_text"), " "))
            .cast("long").as("n_chunk_tokens")): _*)

  /** md5 bucket of one token — EXACTLY [[Splits.hashBucket]]'s
    * arithmetic (first 8 hex chars of the md5 = first 4 digest bytes,
    * unsigned, mod `buckets`), so any engine replays boundaries with
    * `('0x' || substr(md5(w), 1, 8))::BIGINT % buckets`. */
  private def tokenBucket(md: java.security.MessageDigest, w: String,
                          buckets: Int): Long = {
    val d = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 4) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h % buckets
  }

  /** Content-defined chunks of one document: a chunk boundary falls
    * AFTER every token whose md5 bucket is 0, so the expected chunk
    * length is `buckets` tokens. Boundaries depend only on the token
    * at the break — unlike fixed-size chunking ([[chunksOf]]), an
    * insertion or deletion re-chunks ONLY the chunk it touches; every
    * other chunk hash survives, which is what makes chunk-level dedup
    * between corpus versions work (the LBFS/CDC recipe, word-level).
    * Tokens are the library's canonical normalized form (lowercased,
    * whitespace-split) so chunk hashes are dedup keys. */
  private[ops] def cdcChunksOf(tokens: Array[String],
                               buckets: Int): Array[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var n = 0
    var i = 0
    while (i < tokens.length) {
      if (n > 0) sb.append(' ')
      sb.append(tokens(i))
      n += 1
      if (tokenBucket(md, tokens(i), buckets) == 0L) {
        out += sb.toString
        sb.setLength(0)
        n = 0
      }
      i += 1
    }
    if (n > 0) out += sb.toString
    out.toArray
  }

  def cdcChunkUdf(buckets: Int): UserDefinedFunction = {
    require(buckets > 1, "expected chunk length must exceed one token")
    udf((text: String) => {
      if (text == null) Array.empty[String]
      else {
        val tokens = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
        if (tokens.isEmpty) Array.empty[String]
        else cdcChunksOf(tokens, buckets)
      }
    })
  }

  /** Explode documents into content-defined chunks:
    * (id, [carry...], chunk_id, chunk_text) rows, expected chunk
    * length `buckets` tokens. Same map-only single-pass-UDF +
    * posexplode shape as [[explodeChunks]]. */
  def cdcExplode(df: DataFrame, idCol: String, textCol: String,
                 buckets: Int, carryCols: Seq[String] = Nil): DataFrame =
    df.select(col(idCol) +: carryCols.map(col) :+
      posexplode(cdcChunkUdf(buckets)(col(textCol)))
        .as(Seq("chunk_id", "chunk_text")): _*)
      .select(
        (col(idCol) +: carryCols.map(col)) ++ Seq(
          col("chunk_id").cast("long").as("chunk_id"),
          col("chunk_text")): _*)
}
