package graft.ml

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Train -> validate -> save -> load -> score round-trip over the
  * Sentiment140-shaped fixture (reference §3.2 lifecycle). */
class MLSpec extends AnyFunSuite with SparkTestSession {

  private lazy val fixture = {
    val (df, _) = graft.sources.FormatIO.loadFile(
      Some("csv"), resourcePath("/graft/sentiment140.csv"), spark).get
    df
  }

  test("static logistic: trains on detected label, precision in [0,1]") {
    val r = SentimentML.train(fixture, "_c5", "logistic-static")
    assert(r.name === "logistic regression")
    assert(r.labelColumn === "_c0")
    assert(r.precision >= 0.0 && r.precision <= 1.0)
  }

  test("grid sweep selects a model at least as good as static") {
    val stat = SentimentML.train(fixture, "_c5", "logistic-static")
    val swept = SentimentML.train(fixture, "_c5", "logistic")
    assert(swept.precision >= stat.precision)
  }

  test("save -> load -> score round-trip keeps predictions") {
    val r = SentimentML.train(fixture, "_c5", "logistic-static")
    val dir = Files.createTempDirectory("graft-ml").resolve("model").toString
    SentimentML.save(r.model, dir)
    val loaded = SentimentML.load(dir)
    val scored = SentimentML.score(loaded, fixture)
    assert(scored.columns.contains("prediction"))
    // intermediates dropped (P3)
    assert(!scored.columns.contains("tfidf"))
    assert(!scored.columns.contains("rawPrediction"))
    assert(scored.count() === fixture.count())
    // same predictions from the persisted model as from the live one
    val live = SentimentML.score(r.model, fixture)
      .select("_c1", "prediction").collect().map(r => r.get(0).toString -> r.getDouble(1)).toMap
    val persisted = scored
      .select("_c1", "prediction").collect().map(r => r.get(0).toString -> r.getDouble(1)).toMap
    assert(live === persisted)
  }

  test("naive bayes trains (multinomial, label codes)") {
    val r = SentimentML.train(fixture, "_c5", "naivebayes")
    assert(r.name === "naive bayes")
    assert(r.precision >= 0.0 && r.precision <= 1.0)
  }

  test("M9: random forest ('maxentropy') trains deterministically, seed 5043") {
    val r1 = SentimentML.train(fixture, "_c5", "maxentropy")
    assert(r1.name === "maximum entropy")
    assert(r1.labelColumn === "_c0")
    assert(r1.precision >= 0.0 && r1.precision <= 1.0)
    // pinned seed + seed-0 split => bit-identical rerun
    val r2 = SentimentML.train(fixture, "_c5", "randomforest")
    assert(r2.precision === r1.precision)
    // the artifact scores like any other pipeline
    val scored = SentimentML.score(r1.model, fixture)
    assert(scored.columns.contains("prediction"))
    assert(scored.count() === fixture.count())
  }

  test("M11: all-classifiers mode returns the max-precision of the three") {
    val all = SentimentML.train(fixture, "_c5", "all")
    val lr = SentimentML.train(fixture, "_c5", "logistic")
    val nb = SentimentML.train(fixture, "_c5", "naivebayes")
    val rf = SentimentML.train(fixture, "_c5", "maxentropy")
    val individual = Seq(
      "logistic regression" -> lr.precision,
      "naive bayes" -> nb.precision,
      "maximum entropy" -> rf.precision)
    val bestPrecision = individual.map(_._2).max
    assert(all.precision === bestPrecision)
    // the reported name is one of the classifiers achieving the max
    val bestNames = individual.collect {
      case (n, p) if p == bestPrecision => n
    }.toSet
    assert(bestNames.contains(all.name), s"${all.name} not in $bestNames")
  }

  test("score-list aggregate path matches CountVectorizer path") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text", "lang")
    val fast = graft.wordscore.ScoreListTrainer.train(docs, "text")
    val cv = graft.wordscore.ScoreListTrainer.trainWithCountVectorizer(
      docs.withColumnRenamed("lang", "label")
        .withColumn("code",
          org.apache.spark.sql.functions.expr(
            "element_at(map('de',0,'en',1,'es',2,'fr',3,'zh',4), label)")),
      "text", "code", Seq("0", "1", "2", "3", "4"))
    assert(fast.keySet === cv.keySet)
    for (k <- fast.keySet)
      assert(fast(k).sorted === cv(k).sorted, s"category $k")
  }

  test("score-list training: per-category vocab minus overlap") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text", "lang")
    val lists = graft.wordscore.ScoreListTrainer.train(docs, "text")
    assert(lists.keySet === Set("0", "1", "2", "3", "4"))
    // overlap rule (>2 categories) fires with 5 categories: the shared
    // synthetic vocabulary is removed, so lists are small
    assert(lists.values.forall(_.size < 40))
  }

  test("score-list driver collect is bounded by vocabSize") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text", "lang")
    // tiny cap: every category's list (pre-overlap top-k by document
    // frequency, then overlap removal) can never exceed the cap
    val capped = graft.wordscore.ScoreListTrainer.train(
      docs, "text", vocabSize = 3)
    assert(capped.keySet === Set("0", "1", "2", "3", "4"))
    assert(capped.values.forall(_.size <= 3), capped.toString)
    // deterministic: df-desc, word-asc tie-break — two runs agree
    val again = graft.wordscore.ScoreListTrainer.train(
      docs, "text", vocabSize = 3)
    assert(capped === again)
    // default cap (2^18, CountVectorizer parity) is a no-op at this
    // scale: identical to a cap comfortably above the df>=5 vocab
    val default = graft.wordscore.ScoreListTrainer.train(docs, "text")
    val wide = graft.wordscore.ScoreListTrainer.train(
      docs, "text", vocabSize = 1 << 20)
    assert(default.view.mapValues(_.sorted).toMap ===
      wide.view.mapValues(_.sorted).toMap)
    // fail fast on an unbounded/invalid cap
    intercept[IllegalArgumentException] {
      graft.wordscore.ScoreListTrainer.train(docs, "text", vocabSize = 0)
    }
  }

  test("word2vec embeddings: deterministic fit at 1 partition, doc vectors feed the ANN family") {
    import org.apache.spark.sql.functions.{col => c}
    import spark.implicits._
    val docs = (1L to 60L).map { i =>
      val topic = if (i % 2 == 0) "spark rdd shuffle executor task"
                  else "cat dog bird fish horse"
      (i, s"$topic item$i common filler words here")
    }.toDF("doc_id", "text")
    val m1 = Embeddings.trainWord2Vec(docs, "text", dim = 8, minCount = 2,
      maxIter = 2, seed = 7L)
    val m2 = Embeddings.trainWord2Vec(docs, "text", dim = 8, minCount = 2,
      maxIter = 2, seed = 7L)
    // numPartitions=1 + seed => bit-identical vectors run-to-run
    val v1 = m1.getVectors.collect().map(r =>
      r.getString(0) -> r.getAs[org.apache.spark.ml.linalg.Vector](1)).toMap
    val v2 = m2.getVectors.collect().map(r =>
      r.getString(0) -> r.getAs[org.apache.spark.ml.linalg.Vector](1)).toMap
    assert(v1 === v2)
    assert(v1.contains("spark") && v1.contains("cat"))
    // doc vectors: Array[Float] column the SimSearch family consumes;
    // a no-vocab doc embeds as the zero vector
    val probe = docs.unionByName(Seq((99L, "zzz qqq")).toDF("doc_id", "text"))
    val dv = Embeddings.docVectors(m1, probe, "doc_id", "text")
    assert(dv.schema("embedding").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType === org.apache.spark.sql.types.FloatType)
    val zero = dv.where(c("doc_id") === 99L)
      .collect().head.getSeq[Float](1)
    assert(zero.forall(_ == 0.0f))
    // consumption loop: trained vectors drive cosineTopK — same-topic
    // docs rank above cross-topic ones for an even-id query
    val top = graft.ops.SimSearch.cosineTopK(
      dv.where(c("doc_id") =!= 99L), "doc_id", "embedding",
      queryId = 2L, k = 5)
      .collect().map(_.getLong(0))
    assert(top.nonEmpty)
    assert(top.count(_ % 2 == 0) >= 4,
      s"expected same-topic neighbors, got ${top.mkString(",")}")
    // synonym probe: k rows, deterministic ordering
    val syn = Embeddings.synonyms(m1, "spark", 3).collect()
    assert(syn.length === 3)
  }

  test("quality classifier: distills a lexical weak label, smooth scores, pass-through, guards") {
    import org.apache.spark.sql.functions.{col => c, lit}
    import spark.implicits._
    // weak label = contains common English function words; junk docs
    // are keyword lists. 40 docs, lexically separable.
    val docs = (1L to 40L).map { i =>
      if (i % 2 == 0)
        (i, s"the quick analysis of the data shows that results have improved with run $i", true)
      else
        (i, s"buy cheap widget$i gadget discount sale promo code deal offer", false)
    }.toDF("doc_id", "text", "label")
    val model = QualityClassifier.fit(docs, "text", "label",
      vocabSize = 1 << 10, minDF = 1.0)
    val scored = QualityClassifier.score(model, docs)
    // input columns pass through, working columns do not leak
    assert(scored.columns.toSeq === Seq("doc_id", "text", "label", "p_quality"))
    val rows = scored.select("doc_id", "label", "p_quality")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2)))
    val posAvg = rows.filter(_._2).map(_._3).sum / rows.count(_._2)
    val negAvg = rows.filterNot(_._2).map(_._3).sum / rows.count(!_._2)
    assert(posAvg > 0.8 && negAvg < 0.2,
      s"no separation: pos=$posAvg neg=$negAvg")
    // scoring a frame WITHOUT the label column works (apply side)
    val unlabeled = QualityClassifier.score(model, docs.drop("label"))
    assert(unlabeled.columns.contains("p_quality"))
    // null labels are excluded from the fit, not nulled into class 0
    val withNull = Seq((99L, "the the the", Option.empty[Boolean]))
      .toDF("doc_id", "text", "label").unionByName(docs)
    QualityClassifier.fit(withNull, "text", "label",
      vocabSize = 1 << 10, minDF = 1.0) // must not throw
    // guards
    intercept[IllegalArgumentException] {
      QualityClassifier.score(model, docs.withColumn("p_quality", lit(1)))
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.fit(docs, "text", "label", vocabSize = 0)
    }
  }

  test("word2vec parallel fit (numPartitions=3): vocab set and topic topology stable, not byte-pinned") {
    import org.apache.spark.sql.functions.{col => c}
    import spark.implicits._
    // same planted-topic fixture as the serial test: two disjoint
    // vocabularies, so topic separation is a property of the DATA that
    // any correct fit must recover — parallelism-independent
    val docs = (1L to 60L).map { i =>
      val topic = if (i % 2 == 0) "spark rdd shuffle executor task"
                  else "cat dog bird fish horse"
      (i, s"$topic item$i common filler words here")
    }.toDF("doc_id", "text").repartition(3)
    val serial = Embeddings.trainWord2Vec(docs, "text", dim = 8,
      minCount = 2, maxIter = 2, seed = 7L)
    val par = Embeddings.trainWord2Vec(docs, "text", dim = 8,
      minCount = 2, maxIter = 2, seed = 7L, numPartitions = 3)
    // STABLE under parallelism: the vocabulary SET (count-derived,
    // exact at any partitioning — the racy part is vector values only)
    val vs = serial.getVectors.select("word")
      .collect().map(_.getString(0)).toSet
    val vp = par.getVectors.select("word")
      .collect().map(_.getString(0)).toSet
    assert(vp === vs)
    // STABLE: neighbor topology of the planted topics — an even-id
    // query's top-4 neighbors stay majority same-topic
    val dv = Embeddings.docVectors(par, docs, "doc_id", "text")
    val top = graft.ops.SimSearch.cosineTopK(dv, "doc_id", "embedding",
      queryId = 2L, k = 4)
      .collect().map(_.getLong(0))
    assert(top.length === 4)
    assert(top.count(_ % 2 == 0) >= 3,
      s"parallel fit lost topic separation: ${top.mkString(",")}")
    // NOT pinned: byte-identity of vectors (Hogwild updates race by
    // design — the scaladoc contract); no assertion either way, the
    // absence is the documentation
  }
}
