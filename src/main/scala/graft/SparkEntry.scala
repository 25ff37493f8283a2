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

    // W1 — trailing 2-day rolling median per key over a time-range frame.
    // Exact median as a window aggregate; frame is (t-2d, t] in µs matching
    // pandas' right-closed offset windows.
    "q6_rolling_median" -> ((s, dir) => {
      val e = T(s, dir, "events")
      e.select(col("user_id"), col("event_id"),
        round(Windows.rollingTrailing(Windows.med, col("value"), col("ts"),
          Seq(col("user_id")), 2 * 86400), 4).as("med_2d"))
    }),

    // W2 — centered 4-day rolling median with min_periods=5.
    "q6c_rolling_centered" -> ((s, dir) => {
      val e = T(s, dir, "events")
      e.select(col("user_id"), col("event_id"),
        round(Windows.rollingCentered(Windows.med, col("value"), col("ts"),
          Seq(col("user_id")), 4 * 86400, minPeriods = 5), 4).as("med_c"))
    }),

    // W6 — lag difference: microseconds since the user's previous event.
    "q7_lag_diff" -> ((s, dir) => {
      val e = T(s, dir, "events")
      e.select(col("user_id"), col("event_id"),
        Windows.lagDiff(unix_micros(col("ts")), Seq(col("user_id")),
          Seq(col("ts"), col("event_id"))).as("dt_us"))
    }),

    // W3 — limited forward-fill: clamp >30 to null, then ffill at most 3
    // consecutive nulls per user in event-time order.
    "q8_ffill_limit" -> ((s, dir) => {
      val base = T(s, dir, "events").select(col("user_id"), col("event_id"),
        col("ts"), Ranges.clampToNull(col("value"), Double.MinValue, 30.0)
          .as("v"))
      Windows.ffillLimited(base, "v", "ts", Seq("user_id"), limit = 3,
        tiebreakCols = Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("v").as("v_filled"))
    }),

    // W5 — linear interpolation over event-time of the nulled-out values;
    // leading nulls stay null, trailing nulls carry the last value.
    "q9_interpolate" -> ((s, dir) => {
      val base = T(s, dir, "events").select(col("user_id"), col("event_id"),
        col("ts"), Ranges.clampToNull(col("value"), Double.MinValue, 30.0)
          .as("v"))
      Windows.interpolateLinear(base, "v", "ts", Seq("user_id"),
        tiebreakCols = Seq("event_id"))
        .select(col("user_id"), col("event_id"),
          round(col("v"), 6).as("v_interp"))
    }),

    // W3 (grid) — hourly aggregate, then a per-key regular grid spanning
    // each key's range so empty buckets surface as null rows.
    "q10_grid" -> ((s, dir) => {
      val h = T(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(round(avg("value"), 4).as("v"))
      Windows.resampleGrid(h, "hour", Seq("event_type"), 3600)
        .select("event_type", "hour", "v")
    }),

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
    "q6_rolling_median" ->
      """SELECT user_id, event_id,
         round(median(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 172799999999 PRECEDING AND CURRENT ROW), 4)
           AS med_2d
         FROM events""",
    "q6c_rolling_centered" ->
      """SELECT user_id, event_id,
         CASE WHEN count(value) OVER w >= 5
              THEN round(median(value) OVER w, 4) END AS med_c
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 172799999999 PRECEDING AND 172800000000 FOLLOWING)""",
    "q7_lag_diff" ->
      """SELECT user_id, event_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS dt_us
         FROM events""",
    "q8_ffill_limit" ->
      """WITH base AS (
           SELECT user_id, event_id, ts,
             CASE WHEN value <= 30.0 THEN value END AS v FROM events),
         runs AS (
           SELECT *,
             count(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
             last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
           FROM base)
         SELECT user_id, event_id,
           CASE WHEN v IS NOT NULL THEN v
                WHEN row_number() OVER (PARTITION BY user_id, run
                  ORDER BY ts, event_id) - 1 <= 3 THEN filled END AS v_filled
         FROM runs""",
    "q9_interpolate" ->
      """WITH base AS (
           SELECT user_id, event_id, epoch_us(ts) AS t,
             CASE WHEN value <= 30.0 THEN value END AS v FROM events),
         ctx AS (
           SELECT *,
             last_value(v IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER wp AS pt,
             first_value(v IGNORE NULLS) OVER wn AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER wn AS nt
           FROM base
           WINDOW wp AS (PARTITION BY user_id ORDER BY t, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wn AS (PARTITION BY user_id ORDER BY t, event_id
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT user_id, event_id,
           round(CASE WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (nv - pv) * (t - pt) / (nt - pt)
             WHEN pv IS NOT NULL THEN pv END, 6) AS v_interp
         FROM ctx""",
    "q10_grid" ->
      """WITH h AS (
           SELECT event_type, date_trunc('hour', ts) AS hour,
             round(avg(value), 4) AS v FROM events GROUP BY 1, 2),
         span AS (SELECT event_type, min(hour) AS t0, max(hour) AS t1
           FROM h GROUP BY 1),
         grid AS (SELECT event_type,
           unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour
           FROM span)
         SELECT g.event_type, g.hour, h.v
         FROM grid g LEFT JOIN h USING (event_type, hour)""",
    "d1_docs_exact_dedup" ->
      """SELECT md5(text) AS h, min(doc_id) AS doc_id,
         count(*) AS n_copies
         FROM documents GROUP BY 1""",
    "d2_token_count" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
         FROM documents""",
  )
}
