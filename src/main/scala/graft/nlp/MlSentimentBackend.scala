package graft.nlp

import java.util.regex.Pattern

import org.apache.spark.ml.{PipelineModel, Transformer}
import org.apache.spark.ml.classification.{LogisticRegressionModel, NaiveBayesModel, RandomForestClassificationModel}
import org.apache.spark.ml.feature.{CountVectorizerModel, IDFModel, RegexTokenizer}
import org.apache.spark.ml.linalg.{Vector, Vectors}

/**
 * [[SentimentBackend]] backed by a trained MLlib pipeline (the
 * "our-nlp with a real model" path the reference runs through CoreNLP's
 * RNN, `/root/reference/src/main/scala-2.11/ch/uzh/sentiment/CoreNLPSentimentAnalyzer.scala:44-66`;
 * here the model is one trained by [[graft.ml.SentimentML]]).
 *
 * Scale design: `PipelineModel.transform` launches a Spark job, which
 * is impossible inside a per-row UDF on an executor. Instead the
 * fitted pipeline is unpacked ONCE on the driver into a
 * [[MlSentimentBackend.LocalScorer]] — tokenizer regex, vocabulary
 * hash map, IDF weight array, and the classifier's local
 * `predict(Vector)` — all plain serializable state that ships to
 * executors like any broadcast model and scores a sentence with zero
 * Spark machinery. This is the standard deployment shape for MLlib
 * models in row-level streaming/UDF contexts.
 *
 * Reductions (longest-sentence, length-weighted) come from the
 * [[SentimentBackend]] trait and match the reference semantics.
 */
class MlSentimentBackend private[nlp] (scorer: MlSentimentBackend.LocalScorer)
    extends SentimentBackend {

  override def sentences(text: String): Seq[String] =
    WordScoreBackend.sentences(text)

  override def lemma(token: String): String = graft.text.Stemmer.stem(token)

  /** Model prediction (a label code) clamped to the RNN-style 0..4. */
  override def scoreSentence(sentence: String): Int =
    math.max(0, math.min(4, scorer.predict(sentence).toInt))

  /** Raw model prediction for a sentence (unclamped label code). */
  def predictLabel(sentence: String): Double = scorer.predict(sentence)
}

object MlSentimentBackend {

  /** Driver-side constructor from a fitted [[graft.ml.SentimentML]]
    * pipeline ([features [tokenizer, countVectorizer], idf], classifier). */
  def fromModel(model: PipelineModel): MlSentimentBackend =
    new MlSentimentBackend(localScorer(model))

  /** Convenience: load a persisted model (driver-side; needs a session). */
  def load(path: String): MlSentimentBackend =
    fromModel(graft.ml.SentimentML.load(path))

  /** Serializable no-Spark scorer for a single string. */
  private[nlp] final class LocalScorer(
      pattern: String, gaps: Boolean, lowercase: Boolean, minTokenLength: Int,
      vocabulary: Array[String], minTf: Double, binary: Boolean,
      idf: Array[Double],
      predictFn: Vector => Double) extends Serializable {

    @transient private lazy val compiled = Pattern.compile(pattern)
    @transient private lazy val vocabIndex: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](vocabulary.length * 2)
      var i = 0
      while (i < vocabulary.length) { m.put(vocabulary(i), i); i += 1 }
      m
    }

    /** RegexTokenizer semantics: lowercase, then either split on the
      * pattern (gaps) or extract pattern matches, then drop tokens
      * shorter than minTokenLength. */
    private def tokenize(sentence: String): Array[String] = {
      val s = if (lowercase) sentence.toLowerCase else sentence
      val toks =
        if (gaps) compiled.split(s)
        else {
          val m = compiled.matcher(s)
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          while (m.find()) buf += m.group()
          buf.toArray
        }
      toks.filter(_.length >= minTokenLength)
    }

    /** CountVectorizerModel + IDFModel semantics on one document. */
    private def featurize(tokens: Array[String]): Vector = {
      val counts = new java.util.HashMap[Integer, Double]()
      var i = 0
      while (i < tokens.length) {
        val idx = vocabIndex.get(tokens(i))
        if (idx != null) counts.merge(idx, 1.0, Double.box(_) + Double.box(_))
        i += 1
      }
      val effectiveMinTf = if (minTf >= 1.0) minTf else tokens.length * minTf
      val entries = new java.util.TreeMap[Integer, Double]()
      counts.forEach { (k, v) =>
        if (v >= effectiveMinTf)
          entries.put(k, (if (binary) 1.0 else v) * idf(k))
      }
      val indices = new Array[Int](entries.size)
      val values = new Array[Double](entries.size)
      var j = 0
      entries.forEach { (k, v) => indices(j) = k; values(j) = v; j += 1 }
      Vectors.sparse(vocabulary.length, indices, values)
    }

    def predict(sentence: String): Double =
      if (sentence == null) 0.0
      else predictFn(featurize(tokenize(sentence)))
  }

  /** Flatten nested PipelineModels into their leaf transformers. */
  private def flatten(t: Transformer): Seq[Transformer] = t match {
    case pm: PipelineModel => pm.stages.toSeq.flatMap(flatten)
    case other => Seq(other)
  }

  private[nlp] def localScorer(model: PipelineModel): LocalScorer = {
    val stages = flatten(model)
    val tok = stages.collectFirst { case t: RegexTokenizer => t }
      .getOrElse(throw new IllegalArgumentException(
        "pipeline has no RegexTokenizer stage"))
    val cv = stages.collectFirst { case t: CountVectorizerModel => t }
      .getOrElse(throw new IllegalArgumentException(
        "pipeline has no CountVectorizerModel stage"))
    val idfm = stages.collectFirst { case t: IDFModel => t }
      .getOrElse(throw new IllegalArgumentException(
        "pipeline has no IDFModel stage"))
    // the classifier's predict(Vector) is a local computation on every
    // MLlib classification model — no Spark context involved
    val predictFn: Vector => Double = stages.collectFirst {
      case m: LogisticRegressionModel => (v: Vector) => m.predict(v)
      case m: NaiveBayesModel => (v: Vector) => m.predict(v)
      case m: RandomForestClassificationModel => (v: Vector) => m.predict(v)
    }.getOrElse(throw new IllegalArgumentException(
      "pipeline has no supported classifier stage"))
    new LocalScorer(
      tok.getPattern, tok.getGaps, tok.getToLowercase, tok.getMinTokenLength,
      cv.vocabulary, cv.getMinTF, cv.getBinary,
      idfm.idf.toArray, predictFn)
  }
}
