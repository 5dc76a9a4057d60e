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

  test("graft_shingles matches the UDF path bit-for-bit") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (n <- Seq(1, 3, 5)) {
      val viaExpr = docs.select(col("doc_id"),
        graft.ops.Dedup.shingles(col("text"), n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val viaUdf = docs.select(col("doc_id"),
        graft.ops.Dedup.shinglesUdf(col("text"), n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(viaExpr === viaUdf, s"n=$n")
    }
    // null contract preserved by the coalesce wrapper: empty set
    import spark.implicits._
    val nullRow = Seq((1L, null: String)).toDF("id", "t")
      .select(graft.ops.Dedup.shingles(col("t"), 3)).head()
    assert(nullRow.getSeq[String](0) === Seq.empty)
    // SQL surface
    val viaSql = spark.sql(
      "SELECT graft_shingles('a b c d', 3)").head().getSeq[String](0)
    assert(viaSql === Seq("a b c", "b c d"))
  }

  test("graft_minhash matches the UDF path bit-for-bit") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = docs.select(col("doc_id"),
      graft.ops.Dedup.shingles(col("text"), 3).as("sh"))
    val viaExpr = sh.select(col("doc_id"),
      graft.ops.Dedup.minhashSignature(col("sh"), 12).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaUdf = sh.select(col("doc_id"),
      graft.ops.Dedup.minhashSignatureUdf(col("sh"), 12).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaExpr === viaUdf)
    assert(viaExpr.size === docs.count())
    // null contract: null array -> all--1L sentinel (UDF rule)
    import spark.implicits._
    val nullSig = Seq((1L, null: Seq[String])).toDF("id", "sh")
      .select(graft.ops.Dedup.minhashSignature(col("sh"), 4)).head()
      .getSeq[Long](0)
    assert(nullSig === Seq.fill(4)(-1L))
    // empty set degenerates to the same sentinel on both paths
    val emptySig = spark.sql(
      "SELECT graft_minhash(array_remove(array('x'), 'x'), 4)")
      .head().getSeq[Long](0)
    assert(emptySig === Seq.fill(4)(-1L))
    // the size argument is plan-shape: non-literal k is rejected
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_minhash(graft_shingles(text, 3), CAST(doc_id AS INT)) " +
          "FROM parquet.`/root/testdata/sf0.001/documents.parquet`").collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("graft_winnow matches the HOF chain and the scalar reference bit-for-bit") {
    import org.apache.spark.sql.functions.{col, length}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        graft.ops.Dedup.normalized(col("text")).as("__norm"))
    for ((k, w) <- Seq((8, 4), (5, 1), (3, 9))) {
      val viaKernel = docs.select(col("doc_id"),
        GraftFunctions.graftWinnow(col("__norm"), k, w).as("fps"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val viaHof = docs.select(col("doc_id"),
        graft.ops.Fingerprint.winnowHof(col("__norm"), k, w).as("fps"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(viaKernel === viaHof, s"k=$k w=$w") // exact order + values
    }
    // scalar reference (its own normalization) on hand-picked cases,
    // incl. shorter-than-k, shorter-than-w, repeated-min, and
    // multi-byte characters (code-point gram positions, not UTF-16)
    val cases = Seq("the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaa", "short", "ab", "",
      "naïve café — résumé über 字符串 testing")
    for (s <- cases) {
      // normalize on the test side (winnowScalar's own rule, which is
      // idempotent) so both engines hash the identical string — the
      // kernel's contract is "already-normalized input"
      val norm = s.toLowerCase.replaceAll("\\s+", " ")
        .replaceAll("^ +| +$", "")
      val viaSql = spark.sql(
        s"SELECT graft_winnow('${norm.replace("'", "''")}', 8, 4)")
        .head().getSeq[Long](0)
      assert(viaSql === graft.ops.Fingerprint.winnowScalar(norm, 8, 4)
        .toSeq, s"case: $s")
    }
    // the public summary still reports gram counts through the pure
    // length arithmetic — pin it against the HOF array size on data
    val viaSummary = graft.ops.Fingerprint.summary(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text").select("doc_id", "n_grams")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaArr = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.size(
        graft.ops.Fingerprint.gramHashArray(col("__norm"), 8))
        .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSummary === viaArr)
  }

  test("graft_quality: SQL surface, codegen span, and Column-API agreement") {
    import org.apache.spark.sql.functions.col
    // SQL surface (the OpsSpec parity pin covers the Column path)
    val viaSql = spark.sql("SELECT graft_quality('the quick brown fox')")
      .head().getDouble(0)
    assert(viaSql === graft.ops.Kernels.qualityUtf8(
      org.apache.spark.unsafe.types.UTF8String
        .fromString("the quick brown fox")))
    // stays inside whole-stage codegen over a real scan
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(GraftFunctions.graftQuality(col("text")).as("q"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan.take(1000))
    assert(plan.contains("graft_quality"), plan.take(1000))
    // and the public wrapper agrees with the raw function call
    val viaWrapper = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        graft.ops.TextStats.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaFn = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), GraftFunctions.graftQuality(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaWrapper === viaFn)
  }

  test("shingle+minhash chain stays inside whole-stage codegen") {
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(graft.ops.Dedup.minhashSignature(
        graft.ops.Dedup.shingles(col("text"), 3), 12).as("sig"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan.take(1000))
    assert(plan.contains("graft_shingles"), plan.take(1000))
    assert(plan.contains("graft_minhash"), plan.take(1000))
  }

  test("wrong arity or non-literal size fails with a clear message") {
    val wrongArity = intercept[Exception] {
      spark.sql("SELECT graft_shingles('a b c') AS s").collect()
    }
    assert(wrongArity.getMessage.contains("exactly 2 arguments"),
      wrongArity.getMessage.take(300))
    val nonLiteral = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array('a'), length('xx')) AS s").collect()
    }
    assert(nonLiteral.getMessage.contains("literal integer"),
      nonLiteral.getMessage.take(300))
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
