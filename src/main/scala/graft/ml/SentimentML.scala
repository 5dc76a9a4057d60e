package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel, Transformer}
import org.apache.spark.ml.classification.{LogisticRegression, NaiveBayes, RandomForestClassifier}
import org.apache.spark.ml.feature.{CountVectorizer, IDF, RegexTokenizer}
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.tuning.ParamGridBuilder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.schema.Detection

/**
 * MLlib sentiment training/scoring — capability parity with the
 * reference's `MlLibSentimentAnalyser` + `ml/{Regression,Bayes,
 * MaximumEntropy}`
 * (`/root/reference/src/main/scala-2.11/ch/uzh/sentiment/MlLibSentimentAnalyser.scala:17-138`,
 * `ml/Regression.scala:15-58`, `ml/Bayes.scala:15-55`,
 * `ml/MaximumEntropy.scala:15-54`).
 *
 * Hyperparameters, grids, the 70/20/10 seed-0 split, the precision
 * metric (avg(prediction == score)), static-vs-sweep model selection,
 * and the persisted pipeline shape ([features, classifier]) all match
 * the reference. "maxentropy" runs a RandomForest, as in the reference
 * (quirk Q13 — the CLI name is kept for compat).
 *
 * Deliberate efficiency deviation (SURVEY.md §7.4): the reference
 * refits the WHOLE pipeline (tokenize + CountVectorizer + IDF +
 * classifier) at every grid point — 9/6/18 redundant featurization
 * passes. We fit features once, cache the featurized vectors, and fit
 * only the classifier per grid point; the returned PipelineModel still
 * contains [featureModel, classifierModel] so save/load and transform
 * behave exactly like the reference's artifact. Featurization is fit on
 * the full data before the split — the reference's train/test leak (Q9)
 * — unless `fitFeaturesOnTrainOnly` is set.
 */
object SentimentML {

  val ScoreCol = "score"
  val TfIdfCol = "tfidf"

  /** M3-M6: RegexTokenizer -> CountVectorizer -> IDF with the
    * reference's persisted params. */
  def featurePipeline(textColumn: String): Pipeline = {
    val tokenizer = new RegexTokenizer().setGaps(false)
      .setPattern("\\p{L}+").setInputCol(textColumn).setOutputCol("words")
    val vectorizer = new CountVectorizer().setMinTF(1.0).setMinDF(5.0)
      .setVocabSize(math.pow(2, 17).toInt)
      .setInputCol("words").setOutputCol("tf")
    val idf = new IDF().setInputCol("tf").setOutputCol(TfIdfCol)
    new Pipeline().setStages(Array(
      new Pipeline().setStages(Array(tokenizer, vectorizer)), idf))
  }

  case class TrainResult(model: PipelineModel, name: String, precision: Double,
                         labelColumn: String)

  // the 10% test split is produced for split-ratio parity with the
  // reference (seed-0 0.7/0.2/0.1) but not retained: model selection
  // uses the validation split only
  private case class Prepared(labelColumn: String, features: PipelineModel,
                              train: DataFrame, validation: DataFrame)

  private def prepare(training: DataFrame, textColumn: String, limit: Int,
                      fitFeaturesOnTrainOnly: Boolean): Prepared = {
    val (t, labelColumn) = Detection.detectValueColumn(training, limit) match {
      case Some(v) => (training, v)
      case None =>
        val catCol = Detection.detectCategoricalColumn(training, limit)
          .getOrElse(throw new IllegalArgumentException(
            "no value or categorical column detected for training labels"))
        Detection.convertCategoricalColumn(training, catCol)
    }
    val data = t.withColumn(ScoreCol, col(labelColumn).cast("double"))
    val splits = data.randomSplit(Array(0.7, 0.2, 0.1), 0)
    val featFitInput = if (fitFeaturesOnTrainOnly) splits(0) else data
    val features = featurePipeline(textColumn).fit(featFitInput)
    Prepared(labelColumn, features, splits(0), splits(1))
  }

  /** Reference precision metric: avg(prediction == score) (A2).
    * 0.0 on an empty frame (avg returns null) — a tiny input whose
    * seed-0 split leaves the validation set empty must not NPE. */
  def precisionOf(scored: DataFrame): Double = {
    val row = scored
      .select(avg((col("prediction") === col(ScoreCol)).cast("double")))
      .head
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }

  /** Grid sweep on cached featurized vectors; returns the best
    * (classifierModel, precision) and the static model's precision,
    * applying the reference's static-unless-sweep-improves rule. */
  private def sweep(staticClf: org.apache.spark.ml.Estimator[_ <: Transformer],
                    grid: Array[ParamMap],
                    trainVec: DataFrame, valVec: DataFrame): (Transformer, Double) = {
    val staticModel = staticClf.fit(trainVec).asInstanceOf[Transformer]
    val staticPrecision = precisionOf(staticModel.transform(valVec))
    val swept = grid.map { params =>
      val m = staticClf.fit(trainVec, params).asInstanceOf[Transformer]
      (m, precisionOf(m.transform(valVec)))
    }
    val (bestModel, bestPrecision) =
      if (swept.nonEmpty) swept.maxBy(_._2) else (staticModel, staticPrecision)
    if (bestPrecision - staticPrecision > 0) (bestModel, bestPrecision)
    else (staticModel, staticPrecision)
  }

  private def assemble(features: PipelineModel, clf: Transformer,
                       train: DataFrame): PipelineModel =
    new Pipeline().setStages(Array(features, clf)).fit(train)

  /** The reference's STATIC hyperparameters, one builder per family —
    * shared by the gridded sweeps and [[trainStaticAll]] so the
    * static points cannot drift between the two paths. */
  private def staticLr: LogisticRegression =
    new LogisticRegression().setLabelCol(ScoreCol)
      .setFeaturesCol(TfIdfCol).setRegParam(0.02).setMaxIter(100)
      .setElasticNetParam(0.3)

  private def staticNb: NaiveBayes =
    new NaiveBayes().setLabelCol(ScoreCol).setFeaturesCol(TfIdfCol)
      .setSmoothing(1.0).setModelType("multinomial")

  private def staticRf: RandomForestClassifier =
    new RandomForestClassifier().setLabelCol(ScoreCol)
      .setFeaturesCol(TfIdfCol).setImpurity("gini").setMaxDepth(3)
      .setNumTrees(20).setFeatureSubsetStrategy("auto").setSeed(5043)

  /** M7 + M10: LogisticRegression, λ=0.02 α=0.3 static; 3x3 grid. */
  def logistic(p: Prepared): (PipelineModel, Double) = {
    val lr = staticLr
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.0, 0.01, 0.02))
      .addGrid(lr.elasticNetParam, Array(0.0, 0.2, 0.4)).build()
    run(p, lr, grid)
  }

  /** M8: multinomial NaiveBayes, smoothing 1.0 static; 6-point grid. */
  def naiveBayes(p: Prepared): (PipelineModel, Double) = {
    val nb = staticNb
    val grid = new ParamGridBuilder()
      .addGrid(nb.smoothing, Array(0.85, 0.90, 0.95, 1.05, 1.1, 1.15)).build()
    run(p, nb, grid)
  }

  /** M9: RandomForest ("maximum entropy", Q13), gini/depth3/20 trees
    * seed 5043 static; 3x3x2 grid. */
  def randomForest(p: Prepared): (PipelineModel, Double) = {
    val rf = staticRf
    val grid = new ParamGridBuilder()
      .addGrid(rf.maxBins, Array(25, 28, 31))
      .addGrid(rf.maxDepth, Array(4, 6, 8))
      .addGrid(rf.impurity, Array("entropy", "gini")).build()
    run(p, rf, grid)
  }

  /** M11 in bounded-cost form: featurize ONCE (the M10 contract), fit
    * the three STATIC classifiers with no sweeps, and return all
    * three results in declaration order (logistic, naive bayes,
    * maximum entropy) — the driver-benchable slice of the
    * all-classifiers mode (the sweeping form behind `train(_, _,
    * "all")` runs 27+6+18 grid fits and is priced for offline
    * training jobs, not a query battery). Selection rule is the
    * reference's max-by precision with first-wins ties. */
  def trainStaticAll(training: DataFrame, textColumn: String,
                     limit: Int = Detection.defaultSampleSize): Seq[TrainResult] = {
    val p = prepare(training, textColumn, limit,
      fitFeaturesOnTrainOnly = false)
    // featurize ONCE and share the cached vectors across the three
    // family fits (calling run() per family would re-transform and
    // re-cache the corpus three times)
    val trainVec = p.features.transform(p.train)
      .select(col(ScoreCol), col(TfIdfCol)).cache()
    val valVec = p.features.transform(p.validation)
      .select(col(ScoreCol), col(TfIdfCol)).cache()
    try {
      Seq(("logistic regression", staticLr: org.apache.spark.ml.Estimator[_ <: Transformer]),
        ("naive bayes", staticNb),
        ("maximum entropy", staticRf))
        .map { case (name, est) =>
          val (best, pr) = sweep(est, Array.empty, trainVec, valVec)
          TrainResult(assemble(p.features, best, p.train), name, pr, p.labelColumn)
        }
    } finally {
      trainVec.unpersist()
      valVec.unpersist()
    }
  }

  private def run(p: Prepared,
                  clf: org.apache.spark.ml.Estimator[_ <: Transformer],
                  grid: Array[ParamMap]): (PipelineModel, Double) = {
    val trainVec = p.features.transform(p.train)
      .select(col(ScoreCol), col(TfIdfCol)).cache()
    val valVec = p.features.transform(p.validation)
      .select(col(ScoreCol), col(TfIdfCol)).cache()
    try {
      val (best, precision) = sweep(clf, grid, trainVec, valVec)
      (assemble(p.features, best, p.train), precision)
    } finally {
      trainVec.unpersist()
      valVec.unpersist()
    }
  }

  /**
   * M11 entry: train the requested classifier ("logistic",
   * "naivebayes", "maxentropy") or all three (any other value),
   * selecting the best validation precision.
   */
  def train(training: DataFrame, textColumn: String,
            classifier: String = "logistic",
            limit: Int = Detection.defaultSampleSize,
            fitFeaturesOnTrainOnly: Boolean = false): TrainResult = {
    val p = prepare(training, textColumn, limit, fitFeaturesOnTrainOnly)
    val results: Seq[(PipelineModel, Double, String)] = classifier match {
      case "logistic-static" =>
        // static hyperparameters only (no sweep) — the bounded-cost
        // variant used by the registered q25 benchmark query; shares
        // the staticLr builder so the static point cannot drift from
        // the gridded path's
        val (m, pr) = run(p, staticLr, Array.empty)
        Seq((m, pr, "logistic regression"))
      case "logistic" =>
        val (m, pr) = logistic(p); Seq((m, pr, "logistic regression"))
      case "naivebayes" =>
        val (m, pr) = naiveBayes(p); Seq((m, pr, "naive bayes"))
      case "maxentropy" | "randomforest" =>
        val (m, pr) = randomForest(p); Seq((m, pr, "maximum entropy"))
      case _ =>
        val l = logistic(p); val n = naiveBayes(p); val r = randomForest(p)
        Seq((l._1, l._2, "logistic regression"), (n._1, n._2, "naive bayes"),
          (r._1, r._2, "maximum entropy"))
    }
    val best = results.maxBy(_._2)
    TrainResult(best._1, best._3, best._2, p.labelColumn)
  }

  /** M12: persistence. */
  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  def load(path: String): PipelineModel = PipelineModel.load(path)

  /** Score a frame with a trained model, dropping intermediates (P3). */
  def score(model: PipelineModel, df: DataFrame): DataFrame =
    model.transform(df)
      .drop("words", "tf", TfIdfCol, "rawPrediction", "probability")
}
