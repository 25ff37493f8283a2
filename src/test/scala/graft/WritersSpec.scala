package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._

import graft.sink.Writers

/** S8/S9 — Parquet+sidecar sink and time-sliced scan with partition
  * pruning (the NetCDF replacement's scale property). */
class WritersSpec extends SparkSpec {

  import spark.implicits._

  test("parquetWithAttrs: sidecar, fixed-point encoding, partition pruning") {
    val out = Files.createTempDirectory("l2out").resolve("ds").toString
    val df = (0 until 240).map { i =>
      val ts = new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2021-04-01 00:00:00").getTime
          + i.toLong * 3600000L)
      (ts, i % 12, -0.123456 * (i % 7), i / 24 + 1)
    }.toDF("time", "sensor", "value", "day")
    Writers.parquetWithAttrs(df, out,
      attrs = Map("site" -> "FS1", "units" -> "m"),
      partitionBy = Seq("day"),
      fixedPointCols = Seq("value"))

    // sidecar
    val attrs = Files.readString(java.nio.file.Paths.get(out, "_attrs.json"))
    assert(attrs.contains("\"site\": \"FS1\""))
    // fixed-point: int32, value*1000
    val back = spark.read.parquet(out)
    assert(back.schema("value").dataType.typeName === "integer")
    val v = back.where($"sensor" === 1 && $"day" === 1)
      .select("value").head().getInt(0)
    assert(v === -123) // round(-0.123456*1000)
    // partition pruning: day filter shows up as a PartitionFilter, and
    // only that partition's files are read
    val sliced = back.where($"day" === 3)
    val scan = sliced.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") &&
      scan.matches("(?s).*PartitionFilters: \\[[^\\]]*day[^\\]]*\\].*"),
      s"expected day in PartitionFilters:\n$scan")
    assert(sliced.count() === 24)
  }

  test("attrs with control characters round-trip; NaN encodes as the " +
    "fill value") {
    val out = Files.createTempDirectory("l2esc").resolve("ds").toString
    val df = Seq((1, 0.5), (2, Double.NaN), (3, 0.25))
      .toDF("sensor", "value")
    Writers.parquetWithAttrs(df, out,
      // newline/tab/control char in the VALUE: the reader used to
      // strip the backslash but keep the letter ("line1nline2")
      attrs = Map("comment" -> "line1\nline2\ttabend"),
      fixedPointCols = Seq("value"))
    val (g, _) = Writers.readAttrs(out)
    assert(g("comment") === "line1\nline2\ttabend")
    // NaN is the other missing-value spelling (xarray decodes the
    // fill to NaN): it must encode as -9999, not throw (ANSI) or
    // silently read as a real 0.000 (non-ANSI)
    val back = spark.read.parquet(out)
      .orderBy("sensor").select("value").collect().map(_.getInt(0))
    assert(back.toSeq === Seq(500, -9999, 250))
  }

  test("parquetWithAttrs: per-variable attrs round-trip in the sidecar") {
    val out = Files.createTempDirectory("l2var").resolve("ds").toString
    val df = Seq((1, 0.5, -1.0)).toDF("sensor", "T_10cm", "depth")
    val varAttrs = Map(
      "T_10cm" -> Map("units" -> "degC",
        "standard_name" -> "soil_temperature"),
      "depth" -> Map("units" -> "m", "positive" -> "up"))
    Writers.parquetWithAttrs(df, out,
      attrs = Map("site" -> "FS1", "Conventions" -> "CF-1.8"),
      varAttrs = varAttrs)
    val (global, vars) = Writers.readAttrs(out)
    assert(global === Map("site" -> "FS1", "Conventions" -> "CF-1.8"))
    assert(vars === varAttrs)
    // global-only sidecars (no __variables key) still parse
    val out2 = Files.createTempDirectory("l2var").resolve("ds2").toString
    Writers.parquetWithAttrs(df, out2, attrs = Map("site" -> "FS2"))
    val (g2, v2) = Writers.readAttrs(out2)
    assert(g2 === Map("site" -> "FS2") && v2.isEmpty)
  }

  test("writeWithManifest: partitioned write + per-partition stats sidecar") {
    val out = Files.createTempDirectory("manif").resolve("docs").toString
    val df = Seq(
      (1L, "en", 10L), (2L, "en", 30L), (3L, "fr", 5L), (4L, "de", 7L))
      .toDF("doc_id", "lang", "n_tok")
    Writers.writeWithManifest(df, out, Seq("lang"), Seq("doc_id", "n_tok"))
    // the parquet dir still reads cleanly (sidecar is underscore-hidden)
    val back = spark.read.parquet(out)
    assert(back.count() === 4)
    assert(back.where(col("lang") === "en").count() === 2)
    val lines = Files.readAllLines(
      java.nio.file.Paths.get(out, "_manifest.jsonl"))
    assert(lines.size === 3) // one object per partition value
    val en = lines.asScala.find(_.contains("\"lang\": \"en\"")).get
    assert(en.contains("\"rows\": \"2\"") &&
      en.contains("\"min_doc_id\": \"1\"") &&
      en.contains("\"max_doc_id\": \"2\"") &&
      en.contains("\"min_n_tok\": \"10\"") &&
      en.contains("\"max_n_tok\": \"30\""))
    // NOTE: Spark's hidden-file filter applies to _-prefixed paths
    // even when named explicitly, so the manifest is deliberately
    // driver-read planner metadata (Files/line-parse), not a Spark
    // table — exactly why the parquet scan above coexists with it.
  }
}
