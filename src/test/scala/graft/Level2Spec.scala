package graft

import org.apache.spark.sql.functions._

import graft.ops.Udg
import graft.pipeline.Level2

/** §3.2 end-to-end on a synthetic level-1 frame: clamp → rename → UDG
  * chain → EC calibration → long-form export. */
class Level2Spec extends SparkSpec {

  import spark.implicits._

  private val cfg = Level2.Config(
    tsCol = "TIMESTAMP",
    udgKey = "TCDT",
    qKey = "Q",
    validRanges = Map("T107_C" -> (-50.0, 10.0), "EC" -> (0.5, 1.0)),
    removeColumns = Seq("RECORD", "DT"),
    renameRules = Seq(
      ("""EC\(([0-9]+)\)""", "EC_*(microS)"),
      ("""TCDT""", "TCDT(m)")),
    heightChanges = Seq(Udg.HeightChange(
      java.sql.Timestamp.valueOf("2021-04-30 00:00:00"), Some(2.0))),
    // calibration keys are the RAW EC(n) names and the default raw
    // ecFamilyRegex applies: run() calibrates BEFORE the rename, the
    // reference's order (the cal CSV indexes raw level-1 columns)
    ecCal = Map("EC(1)" -> (550.0, 0.0)))

  private def mkL1() = {
    val rows = (0 until 96).map { i =>
      val ts = new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2021-04-30 00:00:00").getTime
          + i * 900000L)
      // T107_C: one out-of-range 99.0; TCDT ~2.0; EC(1) first value 1.0
      (ts, i.toLong, if (i == 10) 99.0 else -5.0, 2.0, 170.0, 0.3,
        if (i == 0) 1.0 else 0.9, 0.8)
    }
    rows.toDF("TIMESTAMP", "RECORD", "T107_C", "TCDT", "Q", "DT",
      "EC(1)", "EC(2)")
  }

  test("level-2 wide pipeline: clamp, drop, rename, UDG target, EC cal") {
    val l2 = Level2.run(mkL1(), cfg, udgTarget = "TCDT(m)").cache()
    assert(l2.columns.contains("TCDT(m)"))
    assert(l2.columns.contains("EC_1(microS)"))
    assert(!l2.columns.contains("RECORD") && !l2.columns.contains("DT"))
    // out-of-range T107_C clamped to null
    assert(l2.where($"T107_C".isNull).count() === 1)
    // UDG normalised by the explicit 2.0 change: ~0
    val udgAvg = l2.agg(avg($"TCDT(m)")).head().getDouble(0)
    assert(math.abs(udgAvg) < 1e-6)
    // EC(1) first value raw 1.0 -> 550*(1-1.0)+0 = 0
    val ec1 = l2.orderBy("TIMESTAMP").head()
    assert(math.abs(ec1.getAs[Double]("EC_1(microS)")) < 1e-9)
    // EC(2) has no calibration row -> mean coefficients (same here)
    val ec2 = l2.where($"EC_2(microS)".isNotNull).count()
    assert(ec2 > 0)
  }

  test("family long-form export carries install depths") {
    val l2 = Level2.run(mkL1(), cfg, udgTarget = "TCDT(m)")
    val long = Level2.familyLongForm(l2, cfg,
      """EC_[0-9]+\(microS\)""", """EC_([0-9]+)""",
      Map(1 -> -0.16, 2 -> -0.31))
    assert(long.columns.toSet ===
      Set("TIMESTAMP", "sensor", "value", "sensor_id", "install_depth"))
    val d = long.where($"sensor" === "EC_2(microS)")
      .select("install_depth").head().getDouble(0)
    assert(math.abs(d - -0.31) < 1e-9)
    assert(long.count() === 96L * 2)
  }
}
