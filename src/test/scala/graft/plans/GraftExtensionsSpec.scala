package graft.plans


import org.scalatest.funsuite.AnyFunSuite

/** Native expression + extension registration: SQL and Column access,
  * codegen parity with the Scala implementations, null handling. */
class GraftExtensionsSpec extends AnyFunSuite with graft.SparkTestSession {

  // All suites share one forked JVM, so getOrCreate may return a
  // session built without withExtensions — retrofit instead (the
  // withExtensions path injects the identical function list).
  GraftExtensions.register(spark)

  test("graft_stem registered and matches Stemmer.stem") {
    val got = spark.sql(
      "SELECT graft_stem('running'), graft_stem('caresses'), graft_stem('feed')")
      .head()
    assert(got.getString(0) === graft.text.Stemmer.stem("running"))
    assert(got.getString(1) === "caress")
    assert(got.getString(2) === "fe") // reference step-1b order
  }

  test("graft_clean registered and matches TextClean.cleanString") {
    val s = "RT @user: check #spark http://t.co/x now"
    val got = spark.sql(s"SELECT graft_clean('$s')").head().getString(0)
    assert(got === graft.text.TextClean.cleanString(s))
  }

  test("graft_simhash matches the UDF path on the fixture corpus") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaExpr = docs.select(col("doc_id"),
      GraftFunctions.graftSimhash(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the UDF form EXPLICITLY (simhashCol itself is expression-backed
    // since round 9, so comparing against it would be a tautology)
    val viaUdf = docs.select(col("doc_id"),
      graft.ops.SimHash.simhashUdf(
        org.apache.spark.sql.functions.split(
          graft.ops.Dedup.normalized(col("text")), " ")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr === viaUdf)
    assert(viaExpr.size === docs.count())
    // and simhashCol (expression-backed + null coalesce) agrees too,
    // including the null contract: null text -> signature 0
    val viaCol = docs.select(col("doc_id"),
      graft.ops.SimHash.simhashCol(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaCol === viaUdf)
    import spark.implicits._
    val nullSig = Seq((1L, null: String)).toDF("id", "t")
      .select(graft.ops.SimHash.simhashCol(col("t"))).head().getLong(0)
    assert(nullSig === 0L)
    // empty text: one "" token, same on both paths
    assert(spark.sql("SELECT graft_simhash('')").head().getLong(0) ===
      graft.ops.SimHash.simhashOfText(""))
  }

  test("null input yields null (nullIntolerant)") {
    assert(spark.sql("SELECT graft_stem(CAST(NULL AS STRING))").head().isNullAt(0))
  }

  test("type check rejects non-string input") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_stem(42)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("string") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("column API via call_function agrees with the UDF-free chain") {
    import spark.implicits._
    val df = Seq("plastered", "motoring", "sky").toDF("w")
    val got = df.select(GraftFunctions.graftStem($"w")).collect().map(_.getString(0))
    assert(got.toSeq === Seq("plaster", "motor", "sky"))
  }

  test("expression executes inside whole-stage codegen") {
    // a file scan prevents the optimizer collapsing everything into a
    // LocalRelation (which would leave no codegen stage to observe)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(GraftFunctions.graftClean(
        org.apache.spark.sql.functions.col("text")).as("c"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan.take(1000)) // codegen stage marker
    assert(plan.contains("graft_clean"), plan.take(1000))
  }
}
