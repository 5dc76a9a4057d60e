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

  /** Per-category vocabulary with overlap removed. */
  def train(source: DataFrame, textColumn: String,
            limit: Int = Detection.defaultSampleSize): Map[String, Seq[String]] = {
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

    val vocabularies: Seq[(String, Array[String])] = categories.map { category =>
      val categorized = t
        .filter(col(labelColumn).cast("string") === lit(category))
        .withColumn(s"split_$textColumn", split(col(textColumn), " "))
      val vectorized = new CountVectorizer().setMinDF(5).setMinTF(2)
        .setInputCol(s"split_$textColumn").fit(categorized)
      category -> vectorized.vocabulary
    }

    // overlap: words present in > 2 category vocabularies (Q15 parity)
    val overlap: Set[String] = vocabularies
      .flatMap { case (_, words) => words.distinct }
      .toDF("word")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .where(col("n") > 2)
      .collect().map(_.getString(0)).toSet

    vocabularies.map { case (cat, words) =>
      cat -> words.filterNot(overlap.contains).toSeq
    }.toMap
  }
}
