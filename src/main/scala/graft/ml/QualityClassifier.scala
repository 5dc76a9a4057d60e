package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{CountVectorizer, IDF, RegexTokenizer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Weak-supervision QUALITY CLASSIFIER — the FineWeb-edu recipe shape
 * on in-repo parts: take a cheap rule bundle's verdict as weak labels
 * ([[graft.ops.GopherRules.qualityFlags]]' `gopher_pass` by default),
 * featurize with the same tf-idf stack the sentiment models use
 * (RegexTokenizer → CountVectorizer → IDF — the pinned M3–M6 shape),
 * fit LogisticRegression on the weak labels, and score every document
 * with a SMOOTH `P(pass)` — the model generalizes past the rules'
 * hard thresholds (a 49-word doc of good prose scores high even
 * though the word-count rule fails it), which is exactly why
 * production pipelines distill rules into a classifier instead of
 * shipping the rules.
 *
 * Extension surface beyond the reference (its ML stack classifies
 * sentiment labels); the fit/apply split matches the rest of the
 * library: [[fit]] once per corpus version (the model is a
 * `PipelineModel` — persist with its own `save`), [[score]] per
 * frame, map-only once the (vocab-bounded) model broadcasts.
 *
 * Determinism: tokenization/vocab/IDF/LBFGS are all deterministic for
 * a fixed input at this library's fixed params (no sampling, no
 * random init — LR starts at zero coefficients); scores round to 4
 * decimals at the output boundary, the repo's cross-engine float
 * contract. Scale: the fit's driver state is the vocab-sized
 * coefficient vector (vocabSize caps it); scoring is one map pass.
 */
object QualityClassifier {

  /** Fit the weak-label quality model: `labelCol` must be a boolean
    * (or 0/1) column already on `docs` — pass GopherRules' output, a
    * hand-labeled sample, or any other weak signal. */
  def fit(docs: DataFrame, textCol: String, labelCol: String,
          vocabSize: Int = 1 << 15, minDF: Double = 5.0,
          maxIter: Int = 50, regParam: Double = 0.01): PipelineModel = {
    require(vocabSize > 0 && maxIter >= 1 && regParam >= 0.0,
      "vocabSize/maxIter must be positive, regParam non-negative")
    val tokenizer = new RegexTokenizer().setGaps(false)
      .setPattern("\\p{L}+").setInputCol(textCol).setOutputCol("__qc_words")
    val vectorizer = new CountVectorizer().setMinTF(1.0).setMinDF(minDF)
      .setVocabSize(vocabSize)
      .setInputCol("__qc_words").setOutputCol("__qc_tf")
    val idf = new IDF().setInputCol("__qc_tf").setOutputCol("__qc_tfidf")
    val lr = new LogisticRegression()
      .setFeaturesCol("__qc_tfidf").setLabelCol("__qc_label")
      .setMaxIter(maxIter).setRegParam(regParam)
    val labeled = docs
      .withColumn("__qc_label", col(labelCol).cast("double"))
      .where(col("__qc_label").isNotNull)
    new Pipeline().setStages(Array(tokenizer, vectorizer, idf, lr))
      .fit(labeled)
  }

  /** Score a frame with the fitted model: appends `p_quality` =
    * P(label 1) at 4 decimals. Map-only (broadcast model), no
    * shuffle; input columns pass through. */
  def score(model: PipelineModel, docs: DataFrame,
            outCol: String = "p_quality"): DataFrame = {
    require(!docs.columns.contains(outCol),
      s"input column $outCol collides with the score output")
    // the MLlib intermediates are part of the guard too: transform
    // fails opaquely on a pre-existing prediction/probability column,
    // so surface it as the same rename-first contract
    val clash = docs.columns.toSet.intersect(Set(
      "__qc_words", "__qc_tf", "__qc_tfidf", "__qc_label",
      "rawPrediction", "probability", "prediction"))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with the model's working names")
    import org.apache.spark.ml.functions.vector_to_array
    model.transform(docs)
      .withColumn(outCol,
        round(element_at(vector_to_array(col("probability")), 2), 4))
      .drop("__qc_words", "__qc_tf", "__qc_tfidf",
        "rawPrediction", "probability", "prediction")
  }
}
