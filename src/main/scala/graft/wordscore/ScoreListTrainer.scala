package graft.wordscore

import org.apache.spark.ml.feature.CountVectorizer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.schema.Detection

/**
 * Word-score training: build per-category vocabularies and remove
 * cross-category overlap — capability parity with the reference's
 * `CreateScoreList`
 * (`/root/reference/src/main/scala-2.11/ch/uzh/sentiment/CreateScoreList.scala:16-53`).
 *
 * Matches the reference: label detection via Detection, per-category
 * `CountVectorizer(minDF=5, minTF=2)` vocabulary (A5), overlap = words
 * appearing in MORE THAN TWO category vocabularies (kept verbatim —
 * with binary sentiment data the `> 2` test never fires, quirk Q15),
 * overlap removed from every category (J2/U2).
 *
 * Deviations (intended semantics / scale):
 *  - the category filter is a Column predicate (`col === lit`), not the
 *    reference's typed Row lambda (P5) — pushdown-friendly;
 *  - the overlap count runs as a DataFrame hash aggregate over the
 *    (bounded, <= vocabSize x #categories) vocabulary union instead of
 *    `parallelize(...).reduceByKey` (A4).
 */
object ScoreListTrainer {

  /** CountVectorizer's default vocabulary cap (2^18) — the bound the
    * reference inherits implicitly at `CreateScoreList.scala:41`. */
  val DefaultVocabSize: Int = 1 << 18

  /** Hard ceiling on `vocabSize`: the per-category head is collected
    * to the driver, so the bound must stay driver-sized no matter
    * what a caller passes. */
  val MaxVocabSize: Int = 1 << 22

  /** Per-category vocabulary with overlap removed.
    *
    * The driver-side collect is BOUNDED at `vocabSize` words per
    * category: each category's vocabulary is the top-`vocabSize`
    * df>=5 terms ranked by document frequency (ties toward the
    * smaller word — deterministic), fetched via a distributed
    * `TakeOrderedAndProject` per category, so an UNcapped df>=5
    * vocabulary (which grows with corpus size) can never flood the
    * driver at 100x data. Rank-order deviation from
    * `CountVectorizer(vocabSize)` (which ranks by total TERM count):
    * df is the statistic the minDF selection already aggregates, so
    * ranking by it keeps the vocabulary pass a single one-shuffle
    * aggregate (a tf-ranked variant needed a second per-row counting
    * pass and measured 3x slower at bench scale); the order only
    * matters once the df>=5 vocabulary exceeds `vocabSize`, where
    * either head is a defensible cap. */
  def train(source: DataFrame, textColumn: String,
            limit: Int = Detection.defaultSampleSize,
            vocabSize: Int = DefaultVocabSize): Map[String, Seq[String]] = {
    require(vocabSize > 0 && vocabSize <= MaxVocabSize,
      s"vocabSize $vocabSize outside (0, $MaxVocabSize] — the per-category " +
        "head is collected to the driver and must stay bounded")
    val spark = source.sparkSession
    import spark.implicits._

    val (t, labelColumn) = Detection.detectValueColumn(source, limit) match {
      case Some(v) => (source, v)
      case None =>
        val catCol = Detection.detectCategoricalColumn(source, limit)
          .getOrElse(throw new IllegalArgumentException(
            "no label column detected for score-list training"))
        Detection.convertCategoricalColumn(source, catCol)
    }

    val categories: Seq[String] =
      Detection.extractIntegerCategories(t, labelColumn)
        .map(_.map(_.toString).toSeq)
        .orElse(Detection.extractStringCategories(t, labelColumn)
          .map(_.toSeq))
        .getOrElse(throw new IllegalArgumentException(
          s"no categories extractable from $labelColumn"))

    // Vocabulary selection (A5) in ONE aggregate pass over all
    // categories: a term is in a category's vocabulary iff it appears
    // in >= minDF (5) of that category's documents — exactly
    // CountVectorizer(minDF=5) semantics (minTF only affects the
    // transform counts, not vocabulary selection). The reference runs
    // one CountVectorizer.fit job per category (ACTION per category,
    // `CreateScoreList.scala:39-43`); this is a single shuffle on
    // (category, word) regardless of category count.
    val perCategoryDf = t
      .select(col(labelColumn).cast("string").as("__cat"),
        // per-doc distinct first, so count(*) below = doc frequency
        explode(array_distinct(split(col(textColumn), " "))).as("__w"))
      .where(col("__w") =!= "")
      .groupBy(col("__cat"), col("__w"))
      .agg(count(lit(1)).as("__df"))
      .where(col("__df") >= 5)
      .cache()

    // BOUNDED driver collect: top-vocabSize per category by document
    // frequency, ties toward the smaller word. One
    // TakeOrderedAndProject job per category over the cached
    // aggregate — the same per-category job structure as the
    // reference, each moving <= vocabSize rows to the driver.
    val vocabularies: Map[String, Seq[String]] =
      try {
        categories.map { c =>
          val head = perCategoryDf
            .where(col("__cat") === lit(c))
            .orderBy(desc("__df"), asc("__w"))
            .limit(vocabSize)
            .select(col("__w"))
            .collect().map(_.getString(0)).toSeq
          c -> head
        }.toMap
      } finally perCategoryDf.unpersist()

    // overlap: words present in > 2 category vocabularies (Q15 parity)
    val wordCounts = vocabularies.values.flatten
      .groupBy(identity).view.mapValues(_.size)
    val overlap: Set[String] =
      wordCounts.filter(_._2 > 2).keys.toSet

    vocabularies.map { case (cat, words) =>
      cat -> words.filterNot(overlap.contains)
    }.toMap
  }

  /** The reference-shaped path (one CountVectorizer.fit per category) —
    * kept for parity testing against [[train]]. */
  def trainWithCountVectorizer(source: DataFrame, textColumn: String,
                               labelColumn: String,
                               categories: Seq[String]): Map[String, Seq[String]] = {
    val vocabularies: Seq[(String, Array[String])] = categories.map { category =>
      val categorized = source
        .filter(col(labelColumn).cast("string") === lit(category))
        .withColumn(s"split_$textColumn", split(col(textColumn), " "))
      val vectorized = new CountVectorizer().setMinDF(5).setMinTF(2)
        .setInputCol(s"split_$textColumn").fit(categorized)
      category -> vectorized.vocabulary
    }
    val counts = vocabularies.flatMap(_._2.distinct)
      .groupBy(identity).view.mapValues(_.size)
    val overlap = counts.filter(_._2 > 2).keys.toSet
    vocabularies.map { case (c, ws) =>
      c -> ws.filterNot(overlap.contains).toSeq
    }.toMap
  }
}
