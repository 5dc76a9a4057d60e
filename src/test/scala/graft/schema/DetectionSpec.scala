package graft.schema

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/**
 * Column-role detection over differently-shaped inputs: the documents
 * parquet fixture, the events table, and a Sentiment140-shaped CSV
 * (the reference's primary input shape, FIXTURES.md §1).
 */
class DetectionSpec extends AnyFunSuite with SparkTestSession {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("documents: text column is `text`") {
    assert(Detection.detectTextColumn(docs) === Some("text"))
  }

  test("documents: index column is `doc_id`") {
    assert(Detection.detectIndexColumn(docs) === Some("doc_id"))
  }

  test("documents: single-word string columns are categorical candidates") {
    // lang and source both average 1 word; neither first value numeric;
    // reference tie-break picks the last matching column in schema order
    assert(Detection.detectCategoricalColumn(docs) === Some("source"))
  }

  test("documents: no value column (no double columns)") {
    assert(Detection.detectValueColumn(docs) === None)
  }

  test("events: value column is the single double column") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id", "user_id", "event_type", "value")
    assert(Detection.detectValueColumn(ev) === Some("value"))
    assert(Detection.detectIndexColumn(ev) === Some("event_id"))
  }

  test("sentiment140 csv: sniffed load + all roles resolve") {
    val path = resourcePath("/graft/sentiment140.csv")
    val loaded = graft.sources.FormatIO.loadFile(Some("csv"), path, spark)
    assert(loaded.isDefined)
    val (df, tag) = loaded.get
    assert(tag === "csv")
    assert(df.columns.length === 6)
    val roles = Detection.resolve(df)
    // headerless file: columns are _c0..._c5
    assert(roles.text === Some("_c5"), s"roles=$roles")
    assert(roles.index === Some("_c1"), s"roles=$roles")
    assert(roles.categorical === Some("_c0"), s"roles=$roles")
  }

  test("extractIntegerCategories on the sentiment label") {
    val path = resourcePath("/graft/sentiment140.csv")
    val (df, _) = graft.sources.FormatIO.loadFile(Some("csv"), path, spark).get
    assert(Detection.extractIntegerCategories(df, "_c0").map(_.toSeq)
      === Some(Seq(0L, 4L)))
    // intended D7 guard: integer column is not a string column
    assert(Detection.extractStringCategories(df, "_c0") === None)
  }

  test("convertCategoricalColumn encodes strings deterministically (Q7 fixed)") {
    import spark.implicits._
    val df = Seq(("x", "neg"), ("y", "pos"), ("z", "neg")).toDF("t", "label")
    val (out, name) = Detection.convertCategoricalColumn(df, "label")
    assert(name === "converted_categorical")
    assert(out.columns.contains(name)) // the returned name is the created one
    val codes = out.select("label", name).distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(codes === Map("neg" -> 0, "pos" -> 1))
  }

  test("integer passthrough in convertCategoricalColumn") {
    import spark.implicits._
    val df = Seq((1, "a"), (0, "b")).toDF("label", "t")
    val (out, name) = Detection.convertCategoricalColumn(df, "label")
    assert(name === "label")
    assert(out eq df)
  }
}
