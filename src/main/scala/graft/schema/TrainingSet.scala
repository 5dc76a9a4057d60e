package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.FormatIO

/**
 * Multi-source training-set alignment.
 *
 * Intended semantics of the reference's `TrainingSet`
 * (`/root/reference/src/main/scala-2.11/ch/uzh/sentiment/TrainingSet.scala:11-55`),
 * with quirks Q4/Q5 fixed:
 *  - Q4: the reference's `sourceIndexes` computes the join inside a
 *    `Some(...)` whose value is discarded, so multi-source alignment
 *    always returns None; ours returns the joined frame;
 *  - Q5: the reference's candidate builder is a non-exhaustive match
 *    (MatchError when a source lacks a role); ours is total.
 *
 * Alignment rule (as the reference intends): usable when exactly one
 * source carries text, exactly one carries a label (value XOR
 * categorical), and every participating source has a detected index
 * column; sources are inner-joined pairwise on their index columns with
 * null-safe equality (J1, `l.col(li) <=> r.col(ri)`).
 *
 * Scale: the join keys are the detected index columns — unique per
 * sample — so the join is a shuffle-on-key equi-join that AQE can plan
 * (broadcast when one side is small). Detection costs one sampled
 * aggregate per source (see [[Detection.measure]]).
 */
object TrainingSet {

  /** Load the given paths and align them into one training frame. */
  def load(paths: Seq[String], fileType: Option[String], limit: Int,
           spark: SparkSession): Option[DataFrame] = {
    val sources = paths.flatMap(p => FormatIO.loadFile(fileType, p, spark).map(_._1))
    if (sources.isEmpty) None
    else if (sources.size == 1) Some(sources.head)
    else align(sources, limit)
  }

  /** Join multiple detected sources on their index columns (fixed J1). */
  def align(sources: Seq[DataFrame], limit: Int = Detection.defaultSampleSize): Option[DataFrame] = {
    val detected = sources.map { df =>
      val roles = Detection.resolve(df, limit)
      (df, roles)
    }
    val texts = detected.filter(_._2.text.isDefined)
    val values = detected.filter(_._2.value.isDefined)
    val categories = detected.filter(_._2.categorical.isDefined)
    val usable = texts.size == 1 &&
      ((values.isEmpty && categories.size == 1) ||
        (values.size == 1 && categories.isEmpty))
    if (!usable) return None
    val participants = (texts ++ values ++ categories).distinct
    val indexed = participants.flatMap {
      case (df, roles) => roles.index.map(ix => (df, ix))
    }
    if (indexed.size != participants.size) return None
    // Disambiguate before joining: sources routinely share inferred
    // column names (two headerless CSVs both have _c0.._cN); an
    // un-renamed join would make every downstream col() reference
    // throw AMBIGUOUS_REFERENCE. Left frame keeps its names; each
    // right frame's colliding columns get a positional suffix.
    Some(indexed.zipWithIndex.map { case ((df, ix), i) => (df, ix, i) }
      .reduce { (l, r) =>
        val (ldf, lix, _) = l
        val (rdf0, rix0, ri) = r
        val collisions = rdf0.columns.toSet.intersect(ldf.columns.toSet)
        val rdf = collisions.foldLeft(rdf0)((df, c) =>
          df.withColumnRenamed(c, s"${c}__src$ri"))
        val rix = if (collisions.contains(rix0)) s"${rix0}__src$ri" else rix0
        (ldf.join(rdf, ldf.col(lix) <=> rdf.col(rix)), lix, ri)
      }._1)
  }
}
