package graft

import java.nio.file.Files
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
}
