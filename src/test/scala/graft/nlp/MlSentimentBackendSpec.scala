package graft.nlp

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ml.SentimentML

/** End-to-end model-backed NLP backend: train -> save -> load ->
  * score, with the local per-sentence scorer pinned against the
  * distributed `PipelineModel.transform` on the same sentences. */
class MlSentimentBackendSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // clearly-separable two-class corpus; pool words clear the
  // CountVectorizer minDF=5 bar, per-row `numberN` tokens stay below it
  private lazy val corpus = {
    val neg = Seq("awful", "terrible", "horrible", "bad", "dreadful")
    val pos = Seq("great", "wonderful", "excellent", "good", "superb")
    val rows = (0 until 40).map { i =>
      (0.0, s"${neg(i % 5)} ${neg((i + 1) % 5)} movie number$i")
    } ++ (0 until 40).map { i =>
      (4.0, s"${pos(i % 5)} ${pos((i + 2) % 5)} film number$i")
    }
    rows.toDF("score", "text")
  }

  private lazy val trained = SentimentML.train(corpus, "text", "logistic-static")

  private lazy val loadedBackend = {
    val dir = Files.createTempDirectory("graft-nlp").resolve("model").toString
    SentimentML.save(trained.model, dir)
    MlSentimentBackend.load(dir)
  }

  test("local scorer matches PipelineModel.transform predictions") {
    val sentences = Seq(
      "wonderful excellent film",
      "awful terrible movie",
      "superb good great",
      "dreadful bad horrible",
      "completely out of vocabulary words")
    val distributed = trained.model.transform(sentences.toDF("text"))
      .select("prediction").collect().map(_.getDouble(0)).toSeq
    val local = sentences.map(loadedBackend.predictLabel)
    assert(local === distributed)
  }

  test("scoreSentence returns clamped 0..4 classes from the model") {
    assert(loadedBackend.scoreSentence("wonderful excellent superb") === 4)
    assert(loadedBackend.scoreSentence("awful terrible horrible") === 0)
  }

  test("U5/U6 reductions work over the model backend") {
    val text = "awful terrible horrible bad dreadful movie today. superb."
    // longest sentence is the negative one
    assert(loadedBackend.computeSentiment(text) === 0)
    val weighted = loadedBackend.computeWeightedSentiment(text)
    assert(weighted >= 0 && weighted <= 4)
    assert(loadedBackend.computeWeightedSentiment("") === -1)
  }
}
