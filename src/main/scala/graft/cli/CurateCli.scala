package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Curate, Decontaminate, TextStats}
import graft.sources.FormatIO

/**
 * Config-driven curation CLI — the [[graft.ops.Curate]] pipeline with
 * the same lifecycle shape as [[SentimentCli]] (hand-rolled parser of
 * the same grammar style; extension surface, the reference has no
 * curation CLI): load the corpus through [[FormatIO]] (any supported
 * format, sniffed or forced), run either the BATCH pipeline
 * ([[Curate.standard]] — gates, dedup, decontamination, splits) or the
 * STREAMING tail ([[Curate.streamingTail]] over a file stream,
 * availableNow trigger, durable dedup state with optional
 * auto-compaction), land the curated corpus as parquet, and optionally
 * write the per-stage report (stage, rows, membership digest) as CSV —
 * the monitoring artifact a production run logs.
 *
 * Flags: --input p (required) --output dir (required) --report p
 * --filetype t --id-col c --text-col c --group-col c --min-quality d
 * --max-dup2gram d --near-threshold d --benchmark p --historical p
 * --max-avg-neg-logp d --blob-col c --blob-max-hamming n
 * --semantic-col c --semantic-threshold d
 * --keep-best --stream --compact-every n --help.
 */
object CurateCli {

  case class Config(input: String = "",
                    output: String = "",
                    report: Option[String] = None,
                    fileType: Option[String] = None,
                    idCol: String = "doc_id",
                    textCol: String = "text",
                    groupCol: String = "source",
                    minQuality: Double = 0.3,
                    maxDup2gram: Double = 0.3,
                    nearThreshold: Double = 0.7,
                    benchmark: Option[String] = None,
                    historical: Option[String] = None,
                    maxAvgNegLogp: Option[Double] = None,
                    blobCol: Option[String] = None,
                    blobMaxHamming: Int = 2,
                    semanticCol: Option[String] = None,
                    semanticThreshold: Double = 0.95,
                    keepBest: Boolean = false,
                    stream: Boolean = false,
                    compactEvery: Option[Int] = None,
                    compactMaxBases: Int = 4,
                    compactOutputEvery: Option[Int] = None,
                    maxFilesPerTrigger: Option[Int] = None)

  val usage: String =
    """curate — config-driven corpus curation (graft.ops.Curate)
      |  --input <path>             corpus to curate (required)
      |  --output <dir>             curated parquet sink (required)
      |  --report <path>            per-stage report sink (CSV)
      |  --filetype <t>             json | csv | txt | parquet | orc | wet (else sniffed)
      |  --id-col <c>               document id column (default doc_id)
      |  --text-col <c>             text column (default text)
      |  --group-col <c>            split/leakage group column (default source)
      |  --min-quality <d>          quality gate floor (default 0.3)
      |  --max-dup2gram <d>         repetition gate cap (default 0.3)
      |  --near-threshold <d>       near-dup Jaccard threshold (default 0.7)
      |  --benchmark <path>         eval set to decontaminate against
      |  --historical <path>        already-ingested corpus (novelty gate)
      |  --max-avg-neg-logp <d>     LM gate cap (off unless set)
      |  --blob-col <c>             binary payload column (perceptual
      |                             image/audio dedup stage; batch only)
      |  --blob-max-hamming <n>     perceptual dedup Hamming cap (default 2)
      |  --semantic-col <c>         embedding column (SemDeDup stage)
      |  --semantic-threshold <d>   SemDeDup cosine threshold (default 0.95)
      |  --keep-best                exact dedup keeps the best-quality copy
      |  --stream                   run the STREAMING tail over --input as a
      |                             file stream (parquet, or crawl shards
      |                             with --filetype wet|warc; availableNow)
      |  --compact-every <n>        streaming: fold dedup state every n batches
      |  --compact-max-bases <n>     streaming: state tiers before a major fold (default 4)
      |  --compact-output-every <n>  streaming: fold the output corpus every n batches
      |  --max-files-per-trigger <n> streaming: micro-batch size in files
      |  --help                     this text""".stripMargin

  /** Hand-rolled parse, [[SentimentCli.parse]]'s grammar; None = invalid. */
  def parse(args: Seq[String]): Option[Config] = {
    def num(v: String): Option[Double] = v.toDoubleOption
    def loop(rest: List[String], c: Config): Option[Config] = rest match {
      case Nil => if (c.input.nonEmpty && c.output.nonEmpty) Some(c) else None
      case "--input" :: v :: t => loop(t, c.copy(input = v))
      case "--output" :: v :: t => loop(t, c.copy(output = v))
      case "--report" :: v :: t => loop(t, c.copy(report = Some(v)))
      case "--filetype" :: v :: t => loop(t, c.copy(fileType = Some(v)))
      case "--id-col" :: v :: t => loop(t, c.copy(idCol = v))
      case "--text-col" :: v :: t => loop(t, c.copy(textCol = v))
      case "--group-col" :: v :: t => loop(t, c.copy(groupCol = v))
      case "--min-quality" :: v :: t =>
        num(v).flatMap(d => loop(t, c.copy(minQuality = d)))
      case "--max-dup2gram" :: v :: t =>
        num(v).flatMap(d => loop(t, c.copy(maxDup2gram = d)))
      case "--near-threshold" :: v :: t =>
        num(v).flatMap(d => loop(t, c.copy(nearThreshold = d)))
      case "--benchmark" :: v :: t => loop(t, c.copy(benchmark = Some(v)))
      case "--historical" :: v :: t => loop(t, c.copy(historical = Some(v)))
      case "--max-avg-neg-logp" :: v :: t =>
        num(v).flatMap(d => loop(t, c.copy(maxAvgNegLogp = Some(d))))
      case "--blob-col" :: v :: t => loop(t, c.copy(blobCol = Some(v)))
      case "--blob-max-hamming" :: v :: t => v.toIntOption match {
        case Some(n) if n >= 0 => loop(t, c.copy(blobMaxHamming = n))
        case _ => None
      }
      case "--semantic-col" :: v :: t => loop(t, c.copy(semanticCol = Some(v)))
      case "--semantic-threshold" :: v :: t =>
        num(v).flatMap(d => loop(t, c.copy(semanticThreshold = d)))
      case "--keep-best" :: t => loop(t, c.copy(keepBest = true))
      case "--stream" :: t => loop(t, c.copy(stream = true))
      case "--compact-every" :: v :: t => v.toIntOption match {
        case Some(n) if n >= 1 => loop(t, c.copy(compactEvery = Some(n)))
        case _ => None
      }
      case "--compact-max-bases" :: v :: t => v.toIntOption match {
        case Some(n) if n >= 1 => loop(t, c.copy(compactMaxBases = n))
        case _ => None
      }
      case "--compact-output-every" :: v :: t => v.toIntOption match {
        case Some(n) if n >= 1 =>
          loop(t, c.copy(compactOutputEvery = Some(n)))
        case _ => None
      }
      case "--max-files-per-trigger" :: v :: t => v.toIntOption match {
        case Some(n) if n >= 1 => loop(t, c.copy(maxFilesPerTrigger = Some(n)))
        case _ => None
      }
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
          .appName("graftCurate")
          .config("spark.sql.legacy.parquet.nanosAsLong", "true")
          .getOrCreate()
        try run(config, spark)
        finally spark.stop()
    }
  }

  def run(config: Config, spark: SparkSession): Unit =
    if (config.stream) runStream(config, spark)
    else runBatch(config, spark)

  private def load(config: Config, path: String,
                   spark: SparkSession): DataFrame =
    FormatIO.loadFile(config.fileType, path, spark)
      .map(_._1)
      .getOrElse(throw new IllegalArgumentException(
        s"could not load $path: unknown filetype"))

  /** Batch lifecycle: load -> [[Curate.standard]] -> parquet out +
    * optional CSV report. The benchmark defaults to an EMPTY frame
    * (decontamination passes everything) so the pipeline runs without
    * an eval set on hand; the report row still shows the stage. */
  def runBatch(config: Config, spark: SparkSession): Unit = {
    val docs = load(config, config.input, spark)
    val benchmark = config.benchmark
      .map(p => load(config, p, spark))
      .getOrElse(docs.limit(0))
    val hist = config.historical.map(p => load(config, p, spark))
    val (out, report) = Curate.standard(docs, benchmark,
      idCol = config.idCol, textCol = config.textCol,
      groupCol = config.groupCol,
      minQuality = config.minQuality,
      maxDup2gramFrac = config.maxDup2gram,
      nearDupThreshold = config.nearThreshold,
      historicalCorpus = hist,
      maxAvgNegLogp = config.maxAvgNegLogp,
      blobCol = config.blobCol,
      blobMaxHamming = config.blobMaxHamming,
      semanticVecCol = config.semanticCol,
      semanticThreshold = config.semanticThreshold,
      keepBestByQuality = config.keepBest)
    try out.write.mode("overwrite").parquet(config.output)
    finally out.unpersist()
    config.report.foreach(p => saveReport(report, p, spark))
    report.stages.foreach { case (name, rows) =>
      println(s"$name: $rows rows") }
  }

  /** Streaming lifecycle: the --input directory as a file stream
    * through [[Curate.streamingTail]] (gates + durable incremental
    * dedup), availableNow trigger (drain what's there, then stop —
    * rerunning picks up new files via the checkpoint under
    * `<output>__checkpoint`). `--filetype wet`/`warc` streams CRAWL
    * SHARDS directly (the splittable record split + parse,
    * valid/response rows only — the crawl-drop shape); anything else
    * streams parquet. The gates mirror the batch config; novelty vs
    * --historical and decontamination vs --benchmark use the same
    * artifacts a batch run fits. */
  def runStream(config: Config, spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.{col, lower}
    val hist = config.historical.map(p => load(config, p, spark))
    val grams = config.benchmark.map(p =>
      Decontaminate.fitBenchGrams(load(config, p, spark), config.textCol, 5))
    // the batch-side view of the same input (unigram-ref fit + the
    // parquet schema when streaming parquet)
    def batchInput(): DataFrame = config.fileType match {
      case Some(t) if Set("wet", "warc")(t.toLowerCase) =>
        load(config, config.input, spark)
      case _ => spark.read.parquet(config.input)
    }
    val unigram = config.maxAvgNegLogp.map { cap =>
      val ref = TextStats.fitUnigramRef(
        hist.getOrElse(batchInput()), config.textCol, 4096)
      (ref, cap)
    }
    val stream: DataFrame = config.fileType.map(_.toLowerCase) match {
      case Some("wet") =>
        // --max-files-per-trigger applies to the parquet route; the
        // crawl streams drain with the file source's defaults (the
        // availableNow trigger bounds the run either way)
        graft.sources.Warc.streamWet(spark, config.input)
          .where(col("is_valid")).drop("is_valid")
      case Some("warc") =>
        graft.sources.Warc.streamWarcRecords(spark, config.input)
          .where(col("is_valid") && lower(col("warc_type")) === "response"
            && col("http_status").isNotNull)
          .drop("is_valid")
      case _ =>
        val schema = spark.read.parquet(config.input).schema
        val reader = spark.readStream.schema(schema)
        config.maxFilesPerTrigger
          .fold(reader)(n => reader.option("maxFilesPerTrigger", n.toString))
          .parquet(config.input)
    }
    val q = stream
      .writeStream
      .foreachBatch(Curate.streamingTail(spark, config.output,
        idCol = config.idCol, textCol = config.textCol,
        minQuality = config.minQuality,
        maxDup2gramFrac = config.maxDup2gram,
        historicalCorpus = hist,
        unigramRef = unigram,
        benchGrams = grams,
        threshold = config.nearThreshold,
        compactEvery = config.compactEvery,
        compactMaxBases = config.compactMaxBases,
        compactOutputEvery = config.compactOutputEvery,
        blobCol = config.blobCol,
        blobMaxHamming = config.blobMaxHamming,
        vecCol = config.semanticCol,
        semanticThreshold = config.semanticThreshold))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        config.output.stripSuffix("/") + "__checkpoint")
      .start()
    q.awaitTermination()
  }

  /** The per-stage report as a one-file CSV (stage_idx, stage, n_rows,
    * ids_digest) — small by construction (one row per stage). */
  private def saveReport(report: Curate.Report, path: String,
                         spark: SparkSession): Unit = {
    import spark.implicits._
    val df = report.stats.zipWithIndex
      .map { case (s, i) => (i, s.name, s.rows, s.idsDigest) }
      .toDF("stage_idx", "stage", "n_rows", "ids_digest")
      .coalesce(1)
    FormatIO.save("csv", df, path, overwrite = true)
  }
}
