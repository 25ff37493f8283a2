package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with a DuckDB-runnable `oracleSql` twin for every
  * SQL-expressible one. Column names/aliases match between the two (the
  * driver sorts columns by name before hashing). Floating aggregates are
  * rounded identically on both sides so cross-engine summation order
  * cannot flip the hash.
  */
object SparkEntry {

  /** Table loader. The `events` table carries a nanosecond-precision
    * parquet timestamp, which Spark 4 only reads as a long
    * (spark.sql.legacy.parquet.nanosAsLong); we convert to TimestampType
    * (microseconds) with integer division — `ns / 1000` as doubles would
    * lose precision above 2^53. DuckDB likewise truncates ns → µs, so the
    * two engines agree on the values. */
  private def T(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f =>
      f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
      .map(_ => df.withColumn("ts", timestamp_micros(expr("ts div 1000"))))
      .getOrElse(df)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A pricing-summary aggregate: scan → filter → groupBy, the shape the
    * whole engine is built around. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A4/A6 — grouped aggregation (sums, avg, count) with partial (map-side)
    // aggregation; single shuffle on the two low-cardinality keys.
    "q1_agg" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("n"))
    }),

    // D1 — exact dedup as DISTINCT projection (dropDuplicates over the
    // projected key set; shuffle on both columns, map-side combine).
    "q2_dedup_distinct" -> ((s, dir) =>
      T(s, dir, "events").select("user_id", "event_type").distinct()),

    // D2 — ordered keep-first dedup: first event per user in (ts, event_id)
    // arrival order. Deterministic, unlike bare dropDuplicates(key).
    "q3_dedup_keepfirst" -> ((s, dir) =>
      Cleaning.dedupKeepFirst(
        T(s, dir, "events").select("user_id", "event_id", "event_type", "ts"),
        Seq("user_id"), Seq(col("ts"), col("event_id")))
        .select("user_id", "event_id", "event_type")),

    // P4 — valid-range clamp to null, row kept. Pure expression: stays in
    // whole-stage codegen, no shuffle.
    "q4_clamp" -> ((s, dir) =>
      T(s, dir, "events").select(col("event_id"),
        Ranges.clampToNull(col("value"), 0.0, 50.0).as("value_clamped"))),

    // A4 — time-bucketed aggregate (resample-to-hour): date_trunc + groupBy.
    "q5_hourly" -> ((s, dir) =>
      T(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(round(avg("value"), 4).as("avg_value"),
          count(lit(1)).as("n"))),

    // Exact text dedup (training-data op): content hash → keep-min doc id.
    "d1_docs_exact_dedup" -> ((s, dir) =>
      T(s, dir, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))),

    // Token counting (training-data op): whitespace tokenizer, codegen'd
    // split — no UDF.
    "d2_token_count" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
         round(avg(l_quantity), 4) AS avg_qty,
         count(*) AS n
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q2_dedup_distinct" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    "q3_dedup_keepfirst" ->
      """SELECT user_id, event_id, event_type FROM events
         QUALIFY row_number() OVER (PARTITION BY user_id
           ORDER BY ts, event_id) = 1""",
    "q4_clamp" ->
      """SELECT event_id,
         CASE WHEN value BETWEEN 0.0 AND 50.0 THEN value END AS value_clamped
         FROM events""",
    "q5_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour,
         round(avg(value), 4) AS avg_value, count(*) AS n
         FROM events GROUP BY 1""",
    "d1_docs_exact_dedup" ->
      """SELECT md5(text) AS h, min(doc_id) AS doc_id,
         count(*) AS n_copies
         FROM documents GROUP BY 1""",
    "d2_token_count" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
         FROM documents""",
  )
}
