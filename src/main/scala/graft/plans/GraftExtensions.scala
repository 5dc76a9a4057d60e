package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions + session extension registration — the
 * (b)/(c) extension path from the build plan: where a scalar function
 * sits in the hot path, a codegen'd `Expression` beats a Scala UDF
 * (no Option-boxing, no encoder round-trip, stays inside the
 * WholeStageCodegen span, and is usable from SQL text).
 *
 * Registered functions (via [[GraftExtensions]] or
 * `SparkSession.builder.withExtensions(new GraftExtensions)`):
 *  - `graft_stem(str)`  — Porter stem of a single token
 *    (reference semantics incl. the step-1b ordering deviation,
 *    `/root/reference/.../utils/Stemmer.scala` pinned by StemmerSpec);
 *  - `graft_clean(str)` — the tweet cleaning chain
 *    (`/root/reference/.../utils/Helper.scala:77-84`);
 *  - `graft_simhash(str)` — 64-bit SimHash of the normalized text
 *    (extension surface; same semantics as [[graft.ops.SimHash.simhashCol]]).
 *
 * The generated code calls the static Scala implementations directly —
 * one virtual-call-free static invoke per row, null handling inlined
 * by the codegen framework.
 */
case class StemExpression(child: Expression)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      prettyName + " requires a string argument")
  override def prettyName: String = "graft_stem"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.text.Stemmer.stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.text.Stemmer.stem($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): StemExpression =
    copy(child = newChild)
}

case class CleanTextExpression(child: Expression)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      prettyName + " requires a string argument")
  override def prettyName: String = "graft_clean"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.text.TextClean.cleanString(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.text.TextClean.cleanString($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): CleanTextExpression =
    copy(child = newChild)
}

case class SimHashExpression(child: Expression)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      prettyName + " requires a string argument")
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    graft.ops.SimHash.simhashOfText(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.SimHash.simhashOfText($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpression =
    copy(child = newChild)
}

/** Word n-gram shingle set (`graft_shingles(text, n)`): the front
  * stage of every MinHash/Jaccard dedup path
  * ([[graft.ops.Dedup.shingles]] wires through this). `n` is fixed at
  * plan time (a literal in SQL), so the generated code is a single
  * static call into [[graft.ops.Kernels.shinglesUtf8]]. */
case class ShinglesExpression(child: Expression, n: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && n > 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      prettyName + " requires a string argument and a positive literal n")
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    graft.ops.Kernels.shinglesUtf8(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.Kernels.shinglesUtf8($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpression =
    copy(child = newChild)
}

/** MinHash signature (`graft_minhash(shingles, k)`): k unsigned-min
  * multiply-add residues over the 60-bit md5 base of each shingle —
  * [[graft.ops.Dedup.signatureOf]]'s exact family, hashing element
  * bytes straight off the UTF8String backing array via
  * [[graft.ops.Kernels.minhashUtf8]]. */
case class MinhashExpression(child: Expression, k: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) if k > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          prettyName + " requires an array<string> argument and a positive literal k")
    }
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any =
    graft.ops.Kernels.minhashUtf8(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.Kernels.minhashUtf8($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinhashExpression =
    copy(child = newChild)
}

/** Winnowing fingerprint selection (`graft_winnow(norm, k, w)`): the
  * distinct window-min 60-bit-md5 gram hashes of an already-normalized
  * text — [[graft.ops.Fingerprint]]'s kernel as ONE static call per
  * row ([[graft.ops.Kernels.winnowUtf8]]) instead of an interpreted
  * `transform`/`slice`/`array_min` higher-order chain. `k` (gram
  * length) and `w` (window width) are plan-time literals, same rule as
  * `graft_shingles`. */
case class WinnowExpression(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && k > 0 && w > 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      prettyName + " requires a string argument and positive literal k, w")
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(input: Any): Any =
    graft.ops.Kernels.winnowUtf8(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.Kernels.winnowUtf8($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowExpression =
    copy(child = newChild)
}

/** Composite quality score (`graft_quality(text)`): the
  * [[graft.ops.TextStats.qualityScore]] heuristic as one static kernel
  * call per row ([[graft.ops.Kernels.qualityUtf8]] — one pass over the
  * string + one over its lowercase form) instead of four independent
  * interpreted passes (three regex splits with array HOFs and a regex
  * replace). NULL propagates null here; the Column wrapper restores
  * the legacy chain's NULL value. */
case class QualityExpression(child: Expression)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      prettyName + " requires a string argument")
  override def prettyName: String = "graft_quality"

  override protected def nullSafeEval(input: Any): Any =
    graft.ops.Kernels.qualityUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.Kernels.qualityUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): QualityExpression =
    copy(child = newChild)
}

/** Session extension: `.withExtensions(new GraftExtensions)` or config
  * `spark.sql.extensions=graft.plans.GraftExtensions`; for an already-
  * running session use [[GraftExtensions.register]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  type FunctionDescription = (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (new FunctionIdentifier("graft_stem"),
      new ExpressionInfo(classOf[StemExpression].getName, "graft_stem"),
      (children: Seq[Expression]) => StemExpression(children.head)),
    (new FunctionIdentifier("graft_clean"),
      new ExpressionInfo(classOf[CleanTextExpression].getName, "graft_clean"),
      (children: Seq[Expression]) => CleanTextExpression(children.head)),
    (new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashExpression].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHashExpression(children.head)),
    (new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShinglesExpression].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        requireArity(children, 2, "graft_shingles")
        ShinglesExpression(children.head, intLiteral(children(1), "graft_shingles"))
      }),
    (new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashExpression].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        requireArity(children, 2, "graft_minhash")
        MinhashExpression(children.head, intLiteral(children(1), "graft_minhash"))
      }),
    (new FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowExpression].getName, "graft_winnow"),
      (children: Seq[Expression]) => {
        requireArity(children, 3, "graft_winnow")
        WinnowExpression(children.head,
          intLiteral(children(1), "graft_winnow"),
          intLiteral(children(2), "graft_winnow"))
      }),
    (new FunctionIdentifier("graft_quality"),
      new ExpressionInfo(classOf[QualityExpression].getName, "graft_quality"),
      (children: Seq[Expression]) => {
        requireArity(children, 1, "graft_quality")
        QualityExpression(children.head)
      }))

  private def requireArity(children: Seq[Expression], n: Int, fn: String): Unit =
    if (children.length != n) throw new IllegalArgumentException(
      s"$fn requires exactly $n arguments, got ${children.length}")

  /** The size argument is part of the expression's SHAPE (output
    * width / gram length), so SQL callers must pass a literal — a
    * per-row size would make the plan type data-dependent. */
  private def intLiteral(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
      org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn requires a literal integer size argument, got $other")
  }

  /** Retrofit the functions into an existing session (e.g. one created
    * without `withExtensions`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      reg.registerFunction(ident, info, builder)
    }
  }
}

/** Column-API access (requires the extensions to be installed in the
  * session, e.g. `.withExtensions(new GraftExtensions)`). */
object GraftFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.call_function

  def graftStem(c: Column): Column = call_function("graft_stem", c)
  def graftClean(c: Column): Column = call_function("graft_clean", c)
  def graftSimhash(c: Column): Column = call_function("graft_simhash", c)
  def graftShingles(c: Column, n: Int): Column =
    call_function("graft_shingles", c, org.apache.spark.sql.functions.lit(n))
  def graftMinhash(c: Column, k: Int): Column =
    call_function("graft_minhash", c, org.apache.spark.sql.functions.lit(k))
  def graftWinnow(c: Column, k: Int, w: Int): Column =
    call_function("graft_winnow", c, org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(w))
  def graftQuality(c: Column): Column = call_function("graft_quality", c)
}
