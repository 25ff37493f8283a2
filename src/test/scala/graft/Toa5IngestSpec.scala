package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._

import graft.ingest.Toa5
import graft.pipeline.Level1

/** S1–S3 + §3.1 pipeline on a GENERATED TOA5 fixture (structure per
  * FIXTURES.md §1; values synthesized here, deterministic). Bales overlap
  * (bale2 re-transmits bale1's last 4 timestamps with different RECORDs)
  * to exercise keep-first dedup, and one column is all-NAN to exercise
  * the null-column drop. */
class Toa5IngestSpec extends SparkSpec {

  private def ts(minOffset: Int): String =
    java.time.LocalDateTime.of(2021, 4, 30, 18, 0)
      .plusMinutes(minOffset.toLong * 15).toString.replace('T', ' ')

  /** rows = (record, tsIndex); value columns derive from the record so
    * provenance of each surviving row is checkable. */
  private def writeBale(dir: Path, n: Int, rows: Seq[(Int, Int)]): Unit = {
    val header = Seq(
      """"TOA5","99999","CR800","99999","CR800.Std.32.03","CPU:test.CR8","1","MainTable"""",
      """"TIMESTAMP","RECORD","BattV_Min","T107_C","TCDT","Q","AllNan"""",
      """"TS","RN","Volts","Deg C","m","unitless","m"""",
      """"","","Min","Smp","Smp","Smp","Smp"""")
    val data = rows.map { case (rec, i) =>
      val tcdt = 2.0 - i * 0.001
      s""""${ts(i)}",$rec,12.5,${-5.0 + i * 0.01},$tcdt,${160 + rec % 10},NAN"""
    }
    Files.write(dir.resolve(s"MainTable$n.dat"),
      (header ++ data).mkString("\n").getBytes("UTF-8"))
  }

  test("a serviced file keeping its bale name still sorts AFTER the " +
    "bales (two-segment order keys)") {
    // serviced/MainTable1.dat shares its basename with bale 1: a
    // basename-keyed order map collided (min-index-wins handed the
    // serviced rows seq 0) and the serviced re-sends would have
    // beaten every later bale in keep-first dedup
    val dir = Files.createTempDirectory("toa5svc")
    Files.createDirectory(dir.resolve("serviced"))
    writeBale(dir, 1, Seq((1, 0)))
    writeBale(dir.resolve("serviced"), 1, Seq((999, 0)))
    val out = Toa5.read(spark, Seq(
      s"$dir/MainTable1.dat", s"$dir/serviced/MainTable1.dat"))
      .select(col("RECORD"), col(Toa5.FileOrderCol))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(1L) === 0 && out(999L) === 1,
      s"the serviced copy must carry its own later seq: $out")
  }

  test("TOA5 ingest + L1 clean: header probe, metadata-row drop, " +
    "NAN->null, all-null column drop, keep-first dedup") {
    val dir = Files.createTempDirectory("toa5")
    // bale1: rows 0..9 (records 1..10); bale2 re-sends 6..9 with NEW
    // records 100..103 (overlap -> keep-first must keep bale1's), then
    // 10..19; bale3: 20..24
    writeBale(dir, 1, (0 to 9).map(i => (i + 1, i)))
    writeBale(dir, 2, (6 to 9).map(i => (i + 94, i)) ++
      (10 to 19).map(i => (i + 91, i)))
    writeBale(dir, 3, (20 to 24).map(i => (i + 81, i)))

    val l1 = Level1.run(spark,
      Seq(Level1.Source(dir.toString, 1, 3))).cache()

    assert(l1.count() === 25) // 25 unique timestamps
    assert(!l1.columns.contains("AllNan"), "all-NAN column must drop")
    val first = l1.orderBy("TIMESTAMP").head()
    val last = l1.orderBy(col("TIMESTAMP").desc).head()
    assert(first.getAs[java.sql.Timestamp]("TIMESTAMP").toString
      .startsWith("2021-04-30 18:00"))
    assert(last.getAs[Long]("RECORD") === 105L)
    // keep-first: ts index 6 appeared in bale1 (record 7) and bale2
    // (record 100) — bale1 wins
    val dup = l1.where(col("TIMESTAMP") === lit(ts(6))).head()
    assert(dup.getAs[Long]("RECORD") === 7L)
    // typed columns
    assert(l1.schema("TCDT").dataType.typeName === "double")
    assert(l1.schema("TIMESTAMP").dataType.typeName === "timestamp")
  }

  test("runObserved reports in/out row counts as job metrics") {
    val dir = Files.createTempDirectory("toa5o")
    writeBale(dir, 1, (0 to 9).map(i => (i + 1, i)))
    writeBale(dir, 2, (5 to 9).map(i => (i + 50, i))) // 5 dup timestamps
    val (df, obsIn, obsOut) = graft.pipeline.Level1.runObserved(spark,
      Seq(graft.pipeline.Level1.Source(dir.toString, 1, 2)))
    df.write.format("noop").mode("overwrite").save()
    assert(obsIn.get("rows_in") === 15L)
    assert(obsOut.get("rows_out") === 10L)
  }

  test("serviced glob appends iff exactly one match, after the bales") {
    val dir = Files.createTempDirectory("toa5s")
    writeBale(dir, 1, (0 to 9).map(i => (i + 1, i)))
    val sv = Files.createDirectory(dir.resolve("serviced"))
    // serviced re-sends ts 8..9 (keep-first: bale wins) + new 10..14
    val svDir = Files.createTempDirectory("toa5sv")
    writeBale(svDir, 9, (8 to 14).map(i => (i + 200, i)))
    Files.move(svDir.resolve("MainTable9.dat"),
      sv.resolve("x_MainTable_sv.dat"))

    val l1 = Level1.run(spark,
      Seq(Level1.Source(dir.toString, 1, 1, serviced = true)))
    assert(l1.count() === 15)
    // ts 8 came from the bale (record 9), not the serviced re-send (208)
    val r8 = l1.where(col("TIMESTAMP") === lit(ts(8))).head()
    assert(r8.getAs[Long]("RECORD") === 9L)

    // two matches -> no append
    Files.writeString(sv.resolve("y_MainTable_2.dat"), "junk")
    val l1b = Level1.run(spark,
      Seq(Level1.Source(dir.toString, 1, 1, serviced = true)))
    assert(l1b.count() === 10)
  }

  test("UDG filter is key-isolated across stations") {
    import graft.ops.Udg
    val rows = (0 until 192).flatMap { i =>
      val t = new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2021-05-01 00:00:00").getTime
          + i * 900000L)
      Seq(("st1", t, if (i == 100) 12.0 else 2.0, 170.0),
        ("st2", t, 5.0, 170.0)) // different level; no spikes
    }
    import spark.implicits._
    val df = rows.toDF("station", "ts", "udg", "q")
    val out = Udg.filter(df, "udg", "q", "ts", keyCols = Seq("station"))
      .cache()
    // st1's spike masked; st2 untouched (no cross-station leakage)
    assert(out.where($"station" === "st2" && $"udg" =!= 5.0).count() === 0)
    assert(out.where($"station" === "st2" && $"udg".isNull).count() === 0)
    val spikeTs = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2021-05-01 00:00:00").getTime
        + 100 * 900000L)
    val sp = out.where($"station" === "st1" && $"ts" === lit(spikeTs)).head()
    assert(sp.isNullAt(sp.fieldIndex("udg")))
  }

  test("file order holds across 100 bales (broadcast order map)") {
    val dir = Files.createTempDirectory("toa5m")
    // every bale re-sends timestamp 0 with a record equal to its bale
    // number — keep-first must pick bale 1's record across all 100
    (1 to 100).foreach(n => writeBale(dir, n, Seq((n, 0), (1000 + n, n))))
    val l1 = Level1.run(spark, Seq(Level1.Source(dir.toString, 1, 100)))
    assert(l1.count() === 101) // ts 0 + unique ts 1..100
    assert(l1.where(col("TIMESTAMP") === lit(ts(0))).head()
      .getAs[Long]("RECORD") === 1L)
    // and the raw read tags files 0..99 in caller order, not glob order
    val raw = Toa5.read(spark, Toa5.balePaths(dir.toString, 1, 100))
    val seqs = raw.select(Toa5.FileOrderCol).distinct().count()
    assert(seqs === 100)
  }

  test("onefile source reads a single named file") {
    val dir = Files.createTempDirectory("toa5one")
    writeBale(dir, 7, (0 to 9).map(i => (i + 1, i)))
    Files.move(dir.resolve("MainTable7.dat"), dir.resolve("single.dat"))
    val l1 = Level1.run(spark,
      Seq(Level1.Source.onefile(dir.toString, "single.dat")))
    assert(l1.count() === 10)
    assert(l1.schema("TIMESTAMP").dataType.typeName === "timestamp")
  }

  test("DTC plain-CSV ingest drops housekeeping and types depths") {
    val dir = Files.createTempDirectory("dtc")
    val csv = Seq(
      "datetime,timezone,Battery (V),Panel Temp (C),0.5 m,1.0 m,2.0 m",
      "2023-06-01 00:00:00,UTC,12.4,21.0,-0.1,-2.5,-5.75",
      "2023-06-01 01:00:00,UTC,12.3,20.5,-0.2,-2.4,bad",
    ).mkString("\n")
    Files.writeString(dir.resolve("beadedcloud_fs1.csv"), csv)
    val df = graft.ingest.Dtc.read(spark,
      dir.resolve("beadedcloud_fs1.csv").toString)
    assert(df.columns.toSeq === Seq("time", "0.5 m", "1.0 m", "2.0 m"))
    assert(df.schema("time").dataType.typeName === "timestamp")
    assert(df.schema("2.0 m").dataType.typeName === "double")
    val rows = df.orderBy("time").collect()
    assert(rows(0).getDouble(3) === -5.75)
    assert(rows(1).isNullAt(3)) // dirty cell nulls, not throws
  }

  test("nrows cap applies per source") {
    val dir = Files.createTempDirectory("toa5b")
    writeBale(dir, 1, (0 to 9).map(i => (i + 1, i)))
    val df = Toa5.read(spark,
      Toa5.balePaths(dir.toString, 1, 1), nrows = Some(5))
    assert(df.count() === 5)
  }
}
