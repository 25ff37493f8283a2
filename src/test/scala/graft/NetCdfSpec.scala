package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.sink.NetCdf
import graft.sink.NetCdf.{Att, Dim, Dataset => NcDataset, Var => NcVar}

/** Round-trips the pure-Scala NetCDF classic writer through an
  * INDEPENDENTLY implemented reader (this file parses bytes straight
  * off the Unidata classic-format spec — it shares no code with the
  * writer), plus structural golden assertions on the raw bytes. */
class NetCdfSpec extends SparkSpec {

  // --- minimal spec-following reader (independent of the writer) ---
  private case class RVar(name: String, dimIds: Seq[Int],
                          atts: Map[String, Any], ncType: Int,
                          vsize: Int, begin: Int)
  private case class RFile(numrecs: Int, dims: Seq[(String, Int)],
                           atts: Map[String, Any], vars: Seq[RVar],
                           bytes: Array[Byte]) {
    def data(v: RVar): Array[Double] = {
      val n = v.dimIds.map(dims(_)._2.toLong).product.toInt
      val buf = ByteBuffer.wrap(bytes, v.begin, v.vsize)
        .order(ByteOrder.BIG_ENDIAN)
      (0 until n).toArray.map { _ =>
        v.ncType match {
          case NetCdf.NcDouble => buf.getDouble
          case NetCdf.NcFloat => buf.getFloat.toDouble
          case NetCdf.NcInt => buf.getInt.toDouble
          case t => fail(s"unexpected nc_type $t")
        }
      }
    }
  }

  private def readNc(path: String): RFile = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    assert(buf.get() === 'C'.toByte && buf.get() === 'D'.toByte &&
      buf.get() === 'F'.toByte && buf.get() === 1.toByte)
    val numrecs = buf.getInt
    def name(): String = {
      val n = buf.getInt
      val b = new Array[Byte](n); buf.get(b)
      (0 until (4 - n % 4) % 4).foreach(_ => buf.get())
      new String(b, "UTF-8")
    }
    def attList(): Map[String, Any] = {
      val tag = buf.getInt; val n = buf.getInt
      assert(tag === (if (n == 0) 0 else 0x0C))
      (0 until n).map { _ =>
        val nm = name()
        val t = buf.getInt
        val len = buf.getInt
        val v: Any = t match {
          case NetCdf.NcChar =>
            val b = new Array[Byte](len); buf.get(b)
            (0 until (4 - len % 4) % 4).foreach(_ => buf.get())
            new String(b, "UTF-8")
          case NetCdf.NcDouble =>
            assert(len === 1); buf.getDouble
          case NetCdf.NcInt =>
            assert(len === 1); buf.getInt
          case o => fail(s"unexpected attr nc_type $o")
        }
        nm -> v
      }.toMap
    }
    val dimTag = buf.getInt; val nDims = buf.getInt
    assert(dimTag === (if (nDims == 0) 0 else 0x0A))
    val dims = (0 until nDims).map(_ => (name(), buf.getInt))
    val gatts = attList()
    val varTag = buf.getInt; val nVars = buf.getInt
    assert(varTag === (if (nVars == 0) 0 else 0x0B))
    val vars = (0 until nVars).map { _ =>
      val nm = name()
      val rank = buf.getInt
      val dimIds = (0 until rank).map(_ => buf.getInt)
      val atts = attList()
      RVar(nm, dimIds, atts, buf.getInt, buf.getInt, buf.getInt)
    }
    RFile(numrecs, dims, gatts, vars, bytes)
  }

  test("netcdf: level2-shaped dataset round-trips byte-exactly") {
    // the reference's export shape: time coordinate, a (time × sensor)
    // family matrix, a per-sensor install-depth aux coordinate, an
    // int quality series, CF attrs at both levels
    val path = Files.createTempDirectory("nc").toString + "/l2.nc"
    val dtc = Array(1.5, 2.5, -3.25, 4.0, 0.0, -1.0)
    val ds = NcDataset(
      dims = Seq(Dim("time", 3), Dim("dtc1_sensor", 2)),
      atts = Seq(Att("title", "fs level-2"), Att("timezone", "UTC")),
      vars = Seq(
        NcVar("time", Seq(0),
          Seq(Att("units", "seconds since 1970-01-01 00:00:00")),
          NetCdf.NcDouble, Array(0.0, 900.0, 1800.0)),
        NcVar("DTC1", Seq(0, 1),
          Seq(Att("units", "degrees_C"),
            Att("standard_name", "temperature_in_firn")),
          NetCdf.NcDouble, dtc),
        NcVar("dtc1_install_depth", Seq(1), Seq(Att("units", "m")),
          NetCdf.NcFloat, Array(-0.5, -1.5)),
        NcVar("Q", Seq(0), Nil, NetCdf.NcInt, Array(1, 2, 3))))
    NetCdf.write(path, ds)
    val r = readNc(path)
    assert(r.numrecs === 0)
    assert(r.dims === Seq(("time", 3), ("dtc1_sensor", 2)))
    assert(r.atts === Map("title" -> "fs level-2", "timezone" -> "UTC"))
    assert(r.vars.map(_.name) === Seq("time", "DTC1",
      "dtc1_install_depth", "Q"))
    val vDtc = r.vars(1)
    assert(vDtc.dimIds === Seq(0, 1))
    assert(vDtc.atts("standard_name") === "temperature_in_firn")
    assert(r.data(vDtc).toSeq === dtc.toSeq) // doubles: bit-exact
    assert(r.data(r.vars(2)).toSeq === Seq(-0.5, -1.5)) // exact in f32
    assert(r.data(r.vars(3)).toSeq === Seq(1.0, 2.0, 3.0))
    // structural golden facts: first var's data begins exactly where
    // the header ends, offsets are contiguous (+vsize), and the file
    // ends at the last offset + last vsize
    val first = r.vars.head
    assert(r.vars.sliding(2).forall { case Seq(x, y) =>
      y.begin == x.begin + x.vsize })
    assert(r.bytes.length === r.vars.last.begin + r.vars.last.vsize)
    assert(first.vsize === 3 * 8)
    // odd-length names/attrs exercised padding above (e.g. "Q", "m")
  }

  test("netcdf: writeWide exports a wide DataFrame with CF attrs") {
    import spark.implicits._
    val path = Files.createTempDirectory("nc").toString + "/wide.nc"
    val df = Seq(
      (new java.sql.Timestamp(0L), Some(1.25), 10L),
      (new java.sql.Timestamp(900000L), None, 20L),
      (new java.sql.Timestamp(1800000L), Some(-2.5), 30L))
      .toDF("ts", "udg", "rec")
    NetCdf.writeWide(path, df, "ts",
      globalAtts = Seq(Att("site", "fs1")),
      varAtts = Map("udg" -> Seq(Att("units", "m"))))
    val r = readNc(path)
    assert(r.dims === Seq(("ts", 3)))
    assert(r.atts("site") === "fs1")
    val byName = r.vars.map(v => v.name -> v).toMap
    assert(r.data(byName("ts")).toSeq === Seq(0.0, 900.0, 1800.0))
    val udg = r.data(byName("udg"))
    assert(udg(0) === 1.25 && udg(2) === -2.5 && udg(1).isNaN)
    assert(byName("udg").atts("units") === "m")
    assert(r.data(byName("rec")).toSeq === Seq(10.0, 20.0, 30.0))
  }

  test("netcdf: decimal columns export; out-of-range values fail loud") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val dir = Files.createTempDirectory("nc").toString
    // DecimalType is the engine's own S8 fixed-point shape — it must
    // export as a variable, not be silently dropped
    val df = Seq(
      (new java.sql.Timestamp(0L), BigDecimal("1.250")),
      (new java.sql.Timestamp(900000L), BigDecimal("-2.125")))
      .toDF("ts", "dec").withColumn("dec",
        col("dec").cast("decimal(12,3)"))
    NetCdf.writeWide(dir + "/dec.nc", df, "ts")
    val r = readNc(dir + "/dec.nc")
    assert(r.vars.map(_.name) === Seq("ts", "dec"))
    assert(r.data(r.vars(1)).toSeq === Seq(1.25, -2.125))
    // int32 fixed-point overflow: |v*1000| > Int.MaxValue must throw,
    // not wrap into a corrupt decoded value
    val big = Seq((new java.sql.Timestamp(0L), 3.0e6))
      .toDF("ts", "v")
    val e1 = intercept[IllegalArgumentException] {
      NetCdf.writeWide(dir + "/of.nc", big, "ts",
        fixedPointCols = Seq("v"))
    }
    assert(e1.getMessage.contains("int32 fixed-point range"))
    // long beyond 2^53 is not exact in NC_DOUBLE — reject
    val bigLong = Seq((new java.sql.Timestamp(0L), (1L << 53) + 1L))
      .toDF("ts", "n")
    val e2 = intercept[IllegalArgumentException] {
      NetCdf.writeWide(dir + "/lg.nc", bigLong, "ts")
    }
    assert(e2.getMessage.contains("not exact in NC_DOUBLE"))
    // decimal with >15 significant digits would silently lose digits
    // through the double — reject like the long case
    val bigDec = Seq((new java.sql.Timestamp(0L),
      BigDecimal("1234567.1234567891")))
      .toDF("ts", "d").withColumn("d", col("d").cast("decimal(20,10)"))
    val e3 = intercept[IllegalArgumentException] {
      NetCdf.writeWide(dir + "/bd.nc", bigDec, "ts")
    }
    assert(e3.getMessage.contains("not exact in NC_DOUBLE"))
    // string columns are skipped (not representable), never fatal
    val mixed = df.withColumn("label", expr("'x'"))
    NetCdf.writeWide(dir + "/mix.nc", mixed, "ts")
    assert(readNc(dir + "/mix.nc").vars.map(_.name) === Seq("ts", "dec"))
  }

  test("netcdf: fixed-point int32 encoding matches the reference's") {
    // fs_process_l2.py:196-200 — int32, scale_factor=0.001,
    // _FillValue=-9999; a CF reader reconstructs v = int * scale
    import spark.implicits._
    val path = Files.createTempDirectory("nc").toString + "/enc.nc"
    val df = Seq(
      (new java.sql.Timestamp(0L), Some(1.2345)),
      (new java.sql.Timestamp(900000L), None),
      (new java.sql.Timestamp(1800000L), Some(-2.5)))
      .toDF("ts", "udg")
    NetCdf.writeWide(path, df, "ts",
      varAtts = Map("udg" -> Seq(Att("units", "m"))),
      fixedPointCols = Seq("udg"))
    val r = readNc(path)
    val udg = r.vars.map(v => v.name -> v).toMap.apply("udg")
    assert(udg.ncType === NetCdf.NcInt)
    assert(udg.atts("scale_factor") === 0.001)
    assert(udg.atts("_FillValue") === -9999)
    assert(udg.atts("units") === "m")
    // stored as rounded int32; decode = v * scale_factor. 1.2345*1000
    // is EXACTLY 1234.5 in doubles: half-even (the reference's
    // np.around) gives 1234 — math.round's half-up 1235 would diverge
    assert(r.data(udg).toSeq === Seq(1234.0, -9999.0, -2500.0))
    // a real value of exactly -9.999 would encode to the _FillValue
    // sentinel and silently decode as missing — must fail loud
    val collide = Seq((new java.sql.Timestamp(0L), -9.999))
      .toDF("ts", "udg")
    val e = intercept[IllegalArgumentException] {
      NetCdf.writeWide(path + ".c", collide, "ts",
        fixedPointCols = Seq("udg"))
    }
    assert(e.getMessage.contains("_FillValue"))
  }
}
