package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._

/** The operational wrappers: default reference layout, the -ow
  * overwrite guard, and the L1-CSV → L2 read-back seam (the one part
  * of the CLI path no other spec exercises — Level2 everywhere else
  * consumes the in-memory L1 plan, not the round-tripped CSV). */
class CliSpec extends SparkSpec {

  private def ts(i: Int): String =
    java.time.LocalDateTime.of(2021, 4, 30, 0, 0)
      .plusMinutes(i.toLong * 15).toString.replace('T', ' ')

  private def writeBale(dir: Path, n: Int, rows: Range): Unit = {
    val header = Seq(
      """"TOA5","1","CR800","1","CR800.Std","CPU:t","1","MainTable"""",
      """"TIMESTAMP","RECORD","T107_C","TCDT","Q","DT","EC(1)","EC(2)"""",
      """"TS","RN","Deg C","m","","m","mV","mV"""",
      """"","","Smp","Smp","Smp","Smp","Smp","Smp"""")
    val data = rows.map { i =>
      s""""${ts(i)}",${i + 1},${-4.0 + (i % 3) * 0.1},2.065,170,0.4,0.93,0.95"""
    }
    Files.write(dir.resolve(s"MainTable$n.dat"),
      (header ++ data).mkString("\n").getBytes("UTF-8"))
  }

  private def siteTree(): Path = {
    val root = Files.createTempDirectory("cli")
    val sub = Files.createDirectories(root.resolve("fielddata"))
    writeBale(sub, 1, 0 until 48)
    writeBale(sub, 2, 48 until 96)
    Files.createDirectories(root.resolve("firn_stations/ppconfig"))
    Files.writeString(root.resolve("firn_stations/ppconfig/fs9.toml"),
      """site = 'fs9'
        |tz = 'UTC'
        |[level0_1]
        |udg_key = 'TCDT'
        |[level1_2]
        |remove_columns = ["RECORD", "DT"]
        |udg_height_change = [[2021-04-30, 2.06]]
        |[level0.fielddata]
        |subpath = 'fielddata'
        |bales_start = 1
        |bales_stop = 2
        |""".stripMargin)
    root
  }

  test("l1 + l2 over the default layout; guard refuses, -ow forces") {
    val root = siteTree().toString
    Cli.main(Array("l1", "fs9", "-data_root", root))
    val l1Path = Cli.l1DefaultPath(root, "fs9")
    val l1 = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(l1Path)
    assert(l1.count() === 96)

    // the reference's IOError semantics: existing product + no -ow
    val e = intercept[java.io.IOException] {
      Cli.main(Array("l1", "fs9", "-data_root", root))
    }
    assert(e.getMessage.contains("-ow"))
    // forced overwrite succeeds and leaves the same row count
    Cli.main(Array("l1", "fs9", "-data_root", root, "-ow"))
    assert(spark.read.option("header", "true").csv(l1Path).count() === 96)

    Cli.main(Array("l2", "fs9", "-data_root", root))
    val l2Csv = Cli.l2DefaultPath(root, "fs9")
    val l2 = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(l2Csv)
    assert(l2.count() === 96)
    assert(l2.columns.contains("TCDT(m)") && l2.columns.contains("t_air(C)"))
    // the derived .nc exists and re-reads through the spec reader
    val nc = l2Csv.stripSuffix(".csv") + ".nc"
    assert(Files.exists(java.nio.file.Paths.get(nc)))
    // L2 values survived the CSV round-trip: normalised UDG ≈ 0.005
    val udg = l2.agg(avg(col("TCDT(m)").cast("double"))).head().getDouble(0)
    assert(math.abs(udg - 0.005) < 1e-6)
    // l2 guard trips on the NetCDF too, not just the CSV
    val e2 = intercept[java.io.IOException] {
      Cli.main(Array("l2", "fs9", "-data_root", root))
    }
    assert(e2.getMessage.contains("-ow"))
  }
}
