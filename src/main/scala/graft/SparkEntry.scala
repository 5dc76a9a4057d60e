package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] that is SQL-expressible has a matching DuckDB
  * oracle in [[oracleSql]]; column aliases are kept identical on both
  * sides (the driver compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's default end-to-end flow (SURVEY.md §3.1): load ->
    * clean -> word-score -> project. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val cleaned = graft.text.TextClean.cleanSource(
      docs, "text", "filtered", stem = false)
    graft.wordscore.WordScore.score(cleaned, "filtered", "computed")
      .select("doc_id", "text", "computed")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Queries.q1Agg(_, _)),
    "q2_join_agg" -> (Queries.q2JoinAgg(_, _)),
    "q3_filter_project" -> (Queries.q3FilterProject(_, _)),
    "q4_wordfreq" -> (Queries.q4WordFreq(_, _)),
    "q5_clean_text" -> (Queries.q5CleanText(_, _)),
    "q6_distinct" -> (Queries.q6Distinct(_, _)),
    "q7_avg_wordcount" -> (Queries.q7AvgWordCount(_, _)),
    "q8_dedup_exact" -> (Queries.q8DedupExact(_, _)),
    "q9_events_hourly" -> (Queries.q9EventsHourly(_, _)),
    "q10_topk" -> (Queries.q10TopK(_, _)),
    "q11_text_stats" -> (Queries.q11TextStats(_, _)),
    "q12_nullsafe_join" -> (Queries.q12NullSafeJoin(_, _)),
    "q13_levenshtein" -> (Queries.q13Levenshtein(_, _)),
    "q14_starjoin" -> (Queries.q14StarJoin(_, _)),
    "q15_wordscore_exact" -> (Queries.q15WordScoreExact(_, _)),
    "q16_wordscore_full" -> (Queries.q16WordScoreFull(_, _)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join_agg" ->
      """SELECT c_mktsegment,
        |  round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q3_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q4_wordfreq" ->
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
        |      FROM documents)
        |GROUP BY word
        |HAVING count(*) >= 5
        |ORDER BY n DESC, word""".stripMargin,
    "q5_clean_text" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    lower(text),
        |    '["'']', '', 'g'),
        |    '[\n\r\t]', '', 'g'),
        |    'rt\s+', '', 'g'),
        |    '@\w+', '', 'g'),
        |    '#', '', 'g'),
        |    'http\S+', '', 'g'),
        |    ' +', ' ', 'g'),
        |    '\s+', ' ', 'g') AS cleaned
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q6_distinct" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "q7_avg_wordcount" ->
      """SELECT source,
        |  round(avg(len(string_split(text, ' '))), 4) AS avg_words
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    "q8_dedup_exact" ->
      """SELECT lang, count(*) AS n_docs,
        |  count(DISTINCT lower(text)) AS n_unique
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
    "q9_events_hourly" ->
      """SELECT event_type,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        |  count(*) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY event_type, hour
        |ORDER BY event_type, hour""".stripMargin,
    "q10_topk" ->
      """SELECT o_custkey,
        |  round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY revenue DESC, o_custkey
        |LIMIT 10""".stripMargin,
    "q11_text_stats" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  length(text) AS text_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q12_nullsafe_join" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey IS NOT DISTINCT FROM o_orderkey
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q13_levenshtein" ->
      """SELECT p_partkey, levenshtein(p_brand, p_type) AS dist
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q15_wordscore_exact" -> graft.wordscore.WordScore.exactScoreOracleSql,
    "q14_starjoin" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
  )
}
