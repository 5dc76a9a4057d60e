package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.{Detection, TrainingSet}
import graft.sources.FormatIO
import graft.text.TextClean
import graft.wordscore.{ScoreListTrainer, WordScore}
import graft.ml.SentimentML
import graft.nlp.{MlSentimentBackend, SentimentBackend, SentimentFunctions, WordScoreBackend}

/**
 * CLI entry — the reference's `Sentiment.main` arg surface and
 * lifecycles (`/root/reference/src/main/scala-2.11/ch/uzh/sentiment/Sentiment.scala:16-210`),
 * with a hand-rolled parser of identical grammar (scopt is not
 * resolvable offline; the grammar is small).
 *
 * Flags: --inputs a,b (required) --model p --classifier c --filetype t
 * --column c --output p --method m --limit n --no-stem --train
 * --verbose --very-verbose --help.
 *
 * Lifecycles:
 *  - scoring (default / §3.1): load -> detect/override text column ->
 *    clean -> score by --method: word-score (default) | mlib (load
 *    persisted model) | our-nlp | databricks-nlp (both served by the
 *    pluggable [[graft.nlp.SentimentBackend]]) -> display -> save in
 *    the input's format.
 *  - ML training (§3.2, --train --method mlib): TrainingSet alignment
 *    -> clean -> train classifier(s) -> save model.
 *  - word-score training (§3.3, --train default): per-category score
 *    lists -> one text file per category.
 *
 * Q10 fixed: mlib scoring displays the `prediction` column that the
 * model actually produces (the reference selects a `score` column that
 * does not exist on inference output and crashes).
 */
object SentimentCli {

  val OutputColumn = "filtered"

  case class Config(inputs: Seq[String] = Seq(),
                    model: Option[String] = None,
                    classifier: Option[String] = None,
                    inputFileType: Option[String] = None,
                    output: Option[String] = None,
                    column: Option[String] = None,
                    method: Option[String] = None,
                    limit: Int = 100,
                    train: Boolean = false,
                    stem: Boolean = true,
                    verbose: Boolean = false,
                    veryVerbose: Boolean = false)

  val usage: String =
    """sentiment 0.2 — spark-native sentiment/analytics engine
      |  --inputs <file>,<dir>,...   inputs to analyze (required)
      |  --model <path>              model save/load path
      |  --classifier <c>            logistic | naivebayes | maxentropy (default: all)
      |  --filetype <t>              json | csv | txt | parquet
      |  --column <c>                text column override
      |  --output <path>             output path (format preserved)
      |  --method <m>                word-score (default) | mlib | our-nlp | databricks-nlp
      |  --limit <n>                 detection sample size (display count = n/10)
      |  --no-stem                   skip Porter stemming
      |  --train                     train instead of score
      |  --verbose / --very-verbose  chatty logs
      |  --help                      this text""".stripMargin

  /** scopt-equivalent parse; None = invalid (caller exits non-zero). */
  def parse(args: Seq[String]): Option[Config] = {
    def loop(rest: List[String], c: Config): Option[Config] = rest match {
      case Nil => if (c.inputs.nonEmpty) Some(c) else None
      case "--inputs" :: v :: t => loop(t, c.copy(inputs = v.split(",").toSeq))
      case "--model" :: v :: t => loop(t, c.copy(model = Some(v)))
      case "--classifier" :: v :: t => loop(t, c.copy(classifier = Some(v)))
      case "--filetype" :: v :: t => loop(t, c.copy(inputFileType = Some(v)))
      case "--column" :: v :: t => loop(t, c.copy(column = Some(v)))
      case "--output" :: v :: t => loop(t, c.copy(output = Some(v)))
      case "--method" :: v :: t => loop(t, c.copy(method = Some(v)))
      case "--limit" :: v :: t => v.toIntOption match {
        case Some(n) => loop(t, c.copy(limit = n))
        case None => None
      }
      case "--no-stem" :: t => loop(t, c.copy(stem = false))
      case "--train" :: t => loop(t, c.copy(train = true))
      case "--verbose" :: t => loop(t, c.copy(verbose = true))
      case "--very-verbose" :: t => loop(t, c.copy(veryVerbose = true))
      case "--help" :: _ => None
      case _ => None
    }
    loop(args.toList, Config())
  }

  def main(args: Array[String]): Unit = {
    parse(args.toSeq) match {
      case None =>
        System.err.println(usage)
        sys.exit(-1)
      case Some(config) =>
        val spark = SparkSession.builder()
          .appName("graftSentiment")
          .config("spark.sql.legacy.parquet.nanosAsLong", "true")
          .getOrCreate()
        try run(config, spark)
        finally spark.stop()
    }
  }

  def run(config: Config, spark: SparkSession): Unit = {
    if (config.train) {
      if (config.method.forall(_.equalsIgnoreCase("word-score"))) {
        trainWordScore(config, spark)
      } else {
        trainMl(config, spark)
      }
    } else {
      score(config, spark)
    }
  }

  /** §3.3: word-score training -> one word-list file per category. */
  def trainWordScore(config: Config, spark: SparkSession): Unit = {
    val dest = config.output.getOrElse("wl")
    val valueMaps = config.inputs.flatMap { i =>
      FormatIO.loadFile(config.inputFileType, i, spark).toSeq.flatMap {
        case (df, _) =>
          val column = Detection.detectTextColumn(df, config.limit)
            .getOrElse(throw new IllegalArgumentException(
              s"no text column detected in $i"))
          val cleaned = TextClean.cleanSource(df, column, OutputColumn, stem = true)
          ScoreListTrainer.train(cleaned, OutputColumn, config.limit).toSeq
      }
    }
    valueMaps.distinct.foreach { case (category, words) =>
      FormatIO.saveWordList(words, dest + category, spark)
    }
  }

  /** §3.2: ML training -> persisted PipelineModel. */
  def trainMl(config: Config, spark: SparkSession): Unit = {
    val modelPath = config.model.getOrElse("sentiment.model")
    val classifier = config.classifier.getOrElse("all")
    val tSet = TrainingSet.load(config.inputs, config.inputFileType,
      config.limit, spark)
      .getOrElse(throw new IllegalArgumentException(
        "could not detect training data"))
    val column = Detection.detectTextColumn(tSet, config.limit)
      .getOrElse(throw new IllegalArgumentException("no text column"))
    val training = TextClean.cleanSource(tSet, column, OutputColumn, config.stem)
    val result = SentimentML.train(training, OutputColumn, classifier, config.limit)
    SentimentML.save(result.model, modelPath)
    println(s"saved ${result.name} with precision " +
      s"${math.round(result.precision * 100)}% to $modelPath")
  }

  /** §3.1: scoring each input with the selected method. */
  def score(config: Config, spark: SparkSession): Unit = {
    val method = config.method.map(_.toLowerCase).getOrElse("word-score")
    config.inputs.foreach { name =>
      FormatIO.loadFile(config.inputFileType, name, spark) match {
        case None =>
          System.err.println(s"could not load $name: unknown filetype")
        case Some((data, dtype)) =>
          val column = config.column
            .orElse(Detection.detectTextColumn(data, config.limit))
          column match {
            case None =>
              System.err.println(s"no text column found in $name")
            case Some(textCol) =>
              val cleaned = TextClean.cleanSource(
                data, textCol, OutputColumn, config.stem)
              val (output, scoreCol) = method match {
                case "mlib" =>
                  val model = SentimentML.load(config.model.getOrElse("sentiment.model"))
                  // Q10 fixed: inference output carries `prediction`
                  (model.transform(cleaned), Some("prediction"))
                case "our-nlp" =>
                  (cleaned.withColumn("computed",
                    SentimentFunctions.sentimentUdf(nlpBackend(config))(col(OutputColumn))),
                    Some("computed"))
                case "databricks-nlp" =>
                  (cleaned.withColumn("sentiment",
                    SentimentFunctions.sentimentUdf(nlpBackend(config))(col(OutputColumn))), None)
                case _ =>
                  (WordScore.score(cleaned, OutputColumn, "computed"),
                    Some("computed"))
              }
              process(config, output, textCol, scoreCol, dtype, spark)
          }
      }
    }
  }

  /** our-nlp/databricks-nlp backend selection: a trained MLlib model
    * when --model points at one (the reference's CoreNLP-RNN role,
    * served by [[graft.nlp.MlSentimentBackend]]'s local scorer), else
    * the offline word-score heuristic. */
  private def nlpBackend(config: Config): SentimentBackend =
    config.model match {
      case Some(path) => MlSentimentBackend.load(path)
      case None => WordScoreBackend
    }

  /** W3: random sample for inspection, with the reference's integer-
    * division bug fixed (Q8: `m/count` was Long division = 0). */
  def randomSample(dataset: DataFrame, n: Int): DataFrame = {
    val count = dataset.count()
    if (count == 0) dataset
    else {
      val m = math.min(n.toLong, count)
      dataset.sample(withReplacement = true, m.toDouble / count).limit(n)
    }
  }

  private def process(config: Config, output: DataFrame, textColumn: String,
                      scoreColumn: Option[String], dtype: String,
                      spark: SparkSession): Unit = {
    val data = if (!config.veryVerbose) {
      output.drop(OutputColumn, "words", "tf", "tfidf",
        "rawPrediction", "probability")
    } else output
    val count = math.ceil(config.limit / 10.0).toInt
    val cols = scoreColumn match {
      case Some(s) => data.select(col(textColumn), col(s))
      case None => data.select(col(textColumn))
    }
    cols.take(count).foreach(r => println(r.mkString(" | ")))
    config.output.foreach(out => FormatIO.save(dtype, data, out, overwrite = true))
  }
}
