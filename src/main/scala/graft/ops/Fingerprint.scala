package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Document fingerprinting via winnowing (Schleimer, Wilkerson & Aiken,
 * SIGMOD 2003 — the MOSS kernel): hash every character k-gram of the
 * normalized text, slide a window of `w` consecutive gram hashes, and
 * keep the minimum hash of each window. The selected set is the
 * document's fingerprint, with the winnowing guarantee: any shared
 * substring of length >= w + k - 1 between two documents yields at
 * least one shared fingerprint, so fingerprint-postings joins find
 * every long-enough overlap without comparing full texts.
 *
 * This is the third sketch family next to [[Dedup]]'s MinHash (set
 * resemblance) and [[SimHash]] (weighted-token Hamming): winnowing is
 * POSITIONAL — it detects contiguous copied passages (plagiarism,
 * boilerplate, quoted spans) that set-based sketches dilute away on
 * long documents.
 *
 * Scale shape: fingerprint selection is entirely MAP-ONLY — one
 * codegen'd kernel call per row ([[Kernels.winnowUtf8]] via
 * [[graft.plans.WinnowExpression]]: grams hashed straight off the
 * byte array, O(n) monotonic-deque window minima), no explode, no
 * shuffle, no UDF; the original higher-order-function chain survives
 * as the spec's parity oracle. Only the (id, fingerprint) postings —
 * O(n_grams / w) per doc, a ~1/w compression of the text — ever reach
 * a shuffle, and only in [[sharedFingerprintPairs]].
 *
 * Hash kernel: the 60-bit md5-prefix parse every cross-engine contract
 * in this library uses (`('0x' || substr(md5(g), 1, 15))::BIGINT`, see
 * [[Profile.rowDigest]]), so a SQL oracle replays fingerprints exactly.
 *
 * Window minima are selected BY VALUE (each window contributes its
 * minimum hash value; the per-document fingerprint set is the distinct
 * union). This keeps the guarantee — the minimum of a window shared by
 * two documents is the same value in both — while staying order-free
 * for the SQL replay (the original paper's rightmost-position rule
 * only changes which POSITION is recorded, not the selected values).
 */
object Fingerprint {

  /** 60-bit md5-prefix hash of each character k-gram of `norm`,
    * 1-based positions; empty array when the text is shorter than k.
    * PARITY ORACLE for the codegen kernel (GraftExtensionsSpec pins
    * [[Kernels.winnowUtf8]] identical to this chain composed with
    * [[winnowArray]]); the hot path goes through the kernel. */
  private[graft] def gramHashArray(norm: Column, k: Int): Column =
    when(length(norm) >= k,
      transform(sequence(lit(1), length(norm) - lit(k - 1)),
        i => conv(substring(md5(norm.substr(i, lit(k)).cast("binary")), 1, 15),
          16, 10).cast("long")))
      .otherwise(array().cast("array<bigint>"))

  /** Distinct window-min fingerprints of a gram-hash array column.
    * Fewer than `w` hashes form one window over all of them (the
    * short-document degenerate case keeps every doc fingerprintable).
    * Parity oracle half — see [[gramHashArray]]. */
  private[graft] def winnowArray(hashes: Column, w: Int): Column =
    when(size(hashes) >= 1,
      array_distinct(transform(
        sequence(lit(1), greatest(size(hashes) - lit(w - 1), lit(1))),
        j => array_min(slice(hashes, j, lit(w))))))
      .otherwise(array().cast("array<bigint>"))

  /** The HOF-expression fingerprint chain, exposed for the parity pin. */
  private[graft] def winnowHof(norm: Column, k: Int, w: Int): Column =
    winnowArray(gramHashArray(norm, k), w)

  /** Codegen'd fingerprint selection — [[Kernels.winnowUtf8]] as one
    * static call per row via [[graft.plans.WinnowExpression]] (no
    * function-registry dependency: the Column is built directly).
    * NULL text degenerates to the empty array, matching the HOF
    * form's `when(...).otherwise(empty)` contract. */
  private def winnowKernel(norm: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    coalesce(ColumnBridge.column(graft.plans.WinnowExpression(
      ColumnBridge.expression(norm), k, w)),
      array().cast("array<bigint>"))
  }

  /** (id, n_grams, n_fingerprints, fp_digest) per document — the
    * fingerprint summary a reproducibility pipeline records per batch.
    * `fp_digest` is the commutative sum of the selected hashes as a
    * decimal STRING (exact in DECIMAL(38,0)/HUGEINT; any float64
    * transport path would lose the low digits — same contract as
    * [[Profile.corpusDigest]]). Documents shorter than k characters
    * digest to "0" with zero grams. */
  def summary(df: DataFrame, idCol: String, textCol: String,
              k: Int = 8, w: Int = 4): DataFrame = {
    requireParams(df, idCol, k, w)
    withFingerprints(df, idCol, textCol, k, w)
      .select(col(idCol), col("__ng").as("n_grams"),
        size(col("__fps")).cast("long").as("n_fingerprints"),
        aggregate(col("__fps"), lit(0).cast("decimal(38,0)"),
          (acc, x) => acc + x).cast("string").as("fp_digest"))
  }

  /** Exploded (id, fp) fingerprint postings — the joinable form. A
    * pair of documents sharing any substring of length >= w + k - 1
    * shares at least one `fp` value (winnowing guarantee), so an
    * equi-join on `fp` is a complete candidate generator for
    * contiguous-overlap detection. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 8, w: Int = 4): DataFrame = {
    requireParams(df, idCol, k, w)
    withFingerprints(df, idCol, textCol, k, w)
      .select(col(idCol), explode(col("__fps")).as("fp"))
  }

  /**
   * Candidate pairs by shared-fingerprint count: the MOSS similarity
   * report. `minShared` is the evidence floor (1 = any shared window).
   *
   * Scale shape: the postings self-join is an equi-join on the
   * fingerprint key — narrow (fp, id) rows, never a cartesian. A
   * fingerprint appearing in d documents fans out d² pair rows, and
   * boilerplate grams make d ~ corpus size, so `maxDf` caps the
   * document frequency per fingerprint BEFORE the join (same
   * prefix-filter rationale, skew-safe groupBy+anti-join shape, and
   * "mandatory at 100×" guidance as [[Dedup.jaccardPairsWithin]]'s
   * cap — a fingerprint shared by half the corpus identifies
   * boilerplate, not a pair).
   */
  def sharedFingerprintPairs(df: DataFrame, idCol: String, textCol: String,
                             k: Int = 8, w: Int = 4, minShared: Int = 1,
                             maxDf: Int = Int.MaxValue): DataFrame = {
    require(minShared > 0, "minShared must be positive")
    val post = fingerprints(df, idCol, textCol, k, w)
    val kept =
      if (maxDf == Int.MaxValue) post
      else {
        val hot = post.groupBy(col("fp")).agg(count(lit(1)).as("__d"))
          .where(col("__d") > maxDf)
          .select(col("fp"))
        post.join(hot, Seq("fp"), "left_anti")
      }
    val a = kept.select(col("fp"), col(idCol).as("id_a"))
    val b = kept.select(col("fp"), col(idCol).as("id_b"))
    a.join(b, Seq("fp"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Shared projection: normalized text -> winnowed fingerprint array
    * through the codegen kernel (one static call per row, O(n) window
    * minima). The gram COUNT is pure length arithmetic — no gram-hash
    * array ever materializes as a column. */
  private def withFingerprints(df: DataFrame, idCol: String, textCol: String,
                               k: Int, w: Int): DataFrame =
    df.select(col(idCol), Dedup.normalized(col(textCol)).as("__norm"))
      .select(col(idCol),
        when(length(col("__norm")) >= k,
          (length(col("__norm")) - lit(k - 1)).cast("long"))
          .otherwise(lit(0L)).as("__ng"),
        winnowKernel(col("__norm"), k, w).as("__fps"))

  private def requireParams(df: DataFrame, idCol: String, k: Int, w: Int): Unit = {
    require(k > 0 && w > 0, "k and w must be positive")
    val clash = df.columns.toSet.intersect(Set("__norm", "__hs", "__ng", "__fps"))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with Fingerprint's reserved names")
  }

  /** Scalar reference model of the winnowing kernel, for tests: same
    * normalization (ASCII-space inputs; Spark `trim` only strips
    * 0x20), same 60-bit md5-prefix gram hash ([[Dedup.md5Base60]]),
    * same window-min-by-value selection as the column expressions.
    * All hashes are in [0, 2^60), so signed `min` equals unsigned. */
  private[graft] def winnowScalar(text: String, k: Int, w: Int): Seq[Long] = {
    require(k > 0 && w > 0, "k and w must be positive")
    if (text == null) return Seq.empty
    val norm = text.toLowerCase.replaceAll("\\s+", " ")
      .replaceAll("^ +| +$", "")
    if (norm.length < k) return Seq.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = Array.tabulate(norm.length - k + 1)(i =>
      Dedup.md5Base60(md, norm.substring(i, i + k)))
    val nw = math.max(hashes.length - w + 1, 1)
    (0 until nw).map(j =>
      hashes.slice(j, math.min(j + w, hashes.length)).min).distinct
  }
}
