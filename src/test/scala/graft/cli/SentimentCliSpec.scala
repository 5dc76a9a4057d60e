package graft.cli

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** CLI grammar pins + an end-to-end §3.1 scoring run through the CLI
  * surface (load -> sniff -> detect -> clean -> word-score -> save). */
class SentimentCliSpec extends AnyFunSuite with SparkTestSession {

  test("parse: full flag surface") {
    val c = SentimentCli.parse(Seq(
      "--inputs", "a.csv,b.json", "--model", "m", "--classifier", "logistic",
      "--filetype", "csv", "--column", "text", "--output", "out",
      "--method", "mlib", "--limit", "50", "--no-stem", "--train",
      "--verbose")).get
    assert(c.inputs === Seq("a.csv", "b.json"))
    assert(c.model === Some("m"))
    assert(c.classifier === Some("logistic"))
    assert(c.inputFileType === Some("csv"))
    assert(c.column === Some("text"))
    assert(c.output === Some("out"))
    assert(c.method === Some("mlib"))
    assert(c.limit === 50)
    assert(!c.stem)
    assert(c.train)
    assert(c.verbose)
  }

  test("parse: inputs required, bad flags rejected") {
    assert(SentimentCli.parse(Seq()) === None)
    assert(SentimentCli.parse(Seq("--method", "mlib")) === None)
    assert(SentimentCli.parse(Seq("--inputs", "a", "--bogus")) === None)
    assert(SentimentCli.parse(Seq("--inputs", "a", "--limit", "NaN")) === None)
    assert(SentimentCli.parse(Seq("--help")) === None)
  }

  test("defaults match the reference Config") {
    val c = SentimentCli.parse(Seq("--inputs", "x")).get
    assert(c.limit === 100)
    assert(c.stem)
    assert(!c.train)
    assert(c.method === None)
  }

  test("end-to-end scoring run: csv in -> scored csv out") {
    val out = Files.createTempDirectory("graft-cli").resolve("scored").toString
    val cfg = SentimentCli.parse(Seq(
      "--inputs", resourcePath("/graft/sentiment140.csv"),
      "--filetype", "csv",
      "--output", out,
      "--limit", "20")).get
    SentimentCli.run(cfg, spark)
    val (scored, tag) = graft.sources.FormatIO.load("csv", out, spark).get
    assert(tag === "csv")
    assert(scored.count() === 60)
    assert(scored.columns.contains("computed"))
    // scores are bounded
    val stats = scored.selectExpr("min(computed)", "max(computed)").head()
    assert(stats.getDouble(0) >= -1.0 && stats.getDouble(1) <= 1.0)
  }

  test("end-to-end --train word-score writes per-category word lists") {
    val dest = Files.createTempDirectory("graft-cli-wl").toString + "/wl"
    val cfg = SentimentCli.parse(Seq(
      "--inputs", resourcePath("/graft/sentiment140.csv"),
      "--filetype", "csv",
      "--train",
      "--output", dest)).get
    SentimentCli.run(cfg, spark)
    // sentiment labels 0 and 4 -> word lists at <dest>0 and <dest>4
    for (cat <- Seq("0", "4")) {
      val dir = new java.io.File(dest + cat)
      assert(dir.exists() && dir.isDirectory, s"missing word list dir for $cat")
    }
  }

  test("end-to-end --train mlib trains and persists a loadable model") {
    val modelPath = Files.createTempDirectory("graft-cli-ml").toString + "/model"
    val cfg = SentimentCli.parse(Seq(
      "--inputs", resourcePath("/graft/sentiment140.csv"),
      "--filetype", "csv",
      "--train", "--method", "mlib",
      "--classifier", "logistic-static",
      "--model", modelPath)).get
    SentimentCli.run(cfg, spark)
    val model = graft.ml.SentimentML.load(modelPath)
    // score through the loaded model end-to-end
    val (df, _) = graft.sources.FormatIO.loadFile(
      Some("csv"), resourcePath("/graft/sentiment140.csv"), spark).get
    val cleaned = graft.text.TextClean.cleanSource(
      df, "_c5", "filtered", stem = true)
    val scored = model.transform(cleaned)
    assert(scored.columns.contains("prediction"))
    assert(scored.count() === 60)
  }

  test("end-to-end our-nlp with --model scores via the trained backend") {
    // train + persist a model through the CLI, then score with
    // --method our-nlp --model: the MlSentimentBackend path
    val tmp = Files.createTempDirectory("graft-cli-nlp").toString
    val modelPath = tmp + "/model"
    SentimentCli.run(SentimentCli.parse(Seq(
      "--inputs", resourcePath("/graft/sentiment140.csv"),
      "--filetype", "csv",
      "--train", "--method", "mlib",
      "--classifier", "logistic-static",
      "--model", modelPath)).get, spark)
    val out = tmp + "/scored"
    SentimentCli.run(SentimentCli.parse(Seq(
      "--inputs", resourcePath("/graft/sentiment140.csv"),
      "--filetype", "csv",
      "--method", "our-nlp",
      "--model", modelPath,
      "--output", out)).get, spark)
    val (scored, _) = graft.sources.FormatIO.load("csv", out, spark).get
    assert(scored.count() === 60)
    assert(scored.columns.contains("computed"))
    // model classes land in the clamped 0..4 band (not the lexicon's [-1,1])
    val stats = scored.selectExpr("min(computed)", "max(computed)").head()
    assert(stats.getInt(0) >= 0 && stats.getInt(1) <= 4)
  }

  test("randomSample returns rows (Q8 fixed: non-zero fraction)") {
    import spark.implicits._
    val df = (1 to 100).toDF("n")
    assert(SentimentCli.randomSample(df, 10).count() > 0)
  }
}
