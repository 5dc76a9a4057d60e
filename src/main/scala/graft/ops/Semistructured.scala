package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Typed extraction over semi-structured (JSON-string) columns — the
 * ingest step a training pipeline runs before any relational work:
 * event payloads, crawl metadata, and API exports all arrive as JSON
 * text beside the typed columns.
 *
 * Contract: malformed JSON and missing paths yield NULL, never an
 * error — at 100 TB some rows ARE corrupt, and a single bad payload
 * must not kill a scan. Both operators are built on codegen'd
 * builtins (`get_json_object`, `from_json`), no UDFs:
 * [[extractJson]] is a pure map-only projection (pushdown-friendly —
 * untouched JSON columns prune out of the parquet scan), and
 * [[jsonKeyCensus]] is one explode + one hash aggregate whose state
 * is bounded by the number of DISTINCT keys (payload vocabulary, not
 * corpus size).
 */
object Semistructured {

  /** One extracted field: output column name, JsonPath (`$.k` form),
    * and the Spark SQL type to cast the extracted text to. */
  final case class JsonField(name: String, path: String, castTo: String)

  /**
   * Map-only typed projection of JSON paths out of `jsonCol`:
   * `get_json_object` per field, cast to the declared type. A row
   * whose JSON is malformed, or that lacks the path, gets NULL for
   * that field (cast failures under ANSI off also null out) — the
   * ingest-safe contract. No shuffle; whole-stage codegen.
   */
  def extractJson(df: DataFrame, jsonCol: String,
                  fields: Seq[JsonField]): DataFrame = {
    require(fields.nonEmpty, "extractJson needs at least one field")
    require(fields.map(_.name).distinct.size == fields.size,
      "duplicate output names in fields")
    fields.foreach { f =>
      require(!df.columns.contains(f.name),
        s"input already has a column named ${f.name}")
    }
    fields.foldLeft(df) { (acc, f) =>
      acc.withColumn(f.name,
        get_json_object(col(jsonCol), f.path).cast(f.castTo))
    }
  }

  /**
   * Key census over a JSON-object column — the schema-inference pass
   * that tells a pipeline what a semi-structured payload actually
   * carries before anyone writes an [[extractJson]] field list: per
   * key observed in any VALID payload, how many rows carry it, how
   * many of its values are integer-shaped, and how many distinct
   * values it takes. Malformed rows parse to a null map and drop out
   * (explode of null emits nothing), mirroring [[extractJson]]'s
   * null-for-corrupt contract.
   *
   * Scale shape: one generate (explode) + one hash aggregate keyed by
   * payload key — aggregate state is O(distinct keys), and the
   * distinct-value count is Spark's partial-aggregated `count(DISTINCT)`
   * rewrite (expand + two-level agg), not a per-key collect.
   */
  def jsonKeyCensus(df: DataFrame, jsonCol: String): DataFrame =
    df.select(explode(from_json(col(jsonCol),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)))
        .as(Seq("key", "value")))
      .groupBy("key")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("value").rlike("^-?\\d+$"), 1L).otherwise(0L))
          .as("n_int"),
        countDistinct(col("value")).as("n_values"))
}
