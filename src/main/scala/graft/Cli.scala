package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Site
import graft.sink.{NetCdf, Writers}

/** Operational CLI wrappers — the engine twin of the reference's
  * `bin/fs_process_l1.py` / `bin/fs_process_l2.py` entry points
  * (site positional arg, `-data_root`, `-metafile`, `-outfile`
  * overrides, and the `-ow` overwrite guard at fs_process_l1.py:41-49:
  * refusing to clobber an existing product unless explicitly forced).
  *
  * {{{
  *   runMain graft.Cli l1 fs1 -data_root /data [-metafile F] [-outfile P] [-ow]
  *   runMain graft.Cli l2 fs1 -data_root /data [-l1file P] [-outfile P] [-ow]
  * }}}
  *
  * Default layout mirrors the reference (fs_pp.py:186-190,
  * fs_process_l2.py:203): metafile at
  * `<root>/firn_stations/ppconfig/<site>.toml`, level-1 CSV at
  * `<root>/firn_stations/level-1/<site>.csv`, level-2 CSV + NetCDF at
  * `<root>/firn_stations/level-2/<site>.{csv,nc}`.
  *
  * Existence checks go through the Hadoop FileSystem resolved from
  * each path, so guards work on any URI the write side accepts, not
  * just the local filesystem.
  */
object Cli {

  private def usage(): Nothing = {
    System.err.println(
      """usage: graft.Cli <l1|l2> <site> [options]
        |  -data_root <dir>   root of the data tree (default: cwd)
        |  -metafile <path>   site TOML (default: <root>/firn_stations/ppconfig/<site>.toml)
        |  -outfile <path>    output override (l1: CSV dir; l2: CSV dir, .nc derived)
        |  -l1file <path>     l2 only: level-1 CSV to read (default: the l1 default path)
        |  -ow                force overwrite of an existing output""".stripMargin)
    sys.exit(2)
  }

  private case class Args(cmd: String, site: String, dataRoot: String,
                          metafile: Option[String], outfile: Option[String],
                          l1file: Option[String], ow: Boolean)

  private def parse(argv: Array[String]): Args = {
    if (argv.length < 2) usage()
    val cmd = argv(0)
    if (cmd != "l1" && cmd != "l2") usage()
    var a = Args(cmd, argv(1), new java.io.File(".").getCanonicalPath,
      None, None, None, ow = false)
    var i = 2
    // value-taking flag as the LAST token (value forgotten) must print
    // usage, not die on an ArrayIndexOutOfBoundsException
    def value(flag: String): String = {
      if (i + 1 >= argv.length) {
        System.err.println(s"missing value for $flag"); usage()
      }
      argv(i + 1)
    }
    while (i < argv.length) {
      argv(i) match {
        case f @ "-data_root" => a = a.copy(dataRoot = value(f)); i += 2
        case f @ "-metafile" => a = a.copy(metafile = Some(value(f))); i += 2
        case f @ "-outfile" => a = a.copy(outfile = Some(value(f))); i += 2
        case f @ "-l1file" => a = a.copy(l1file = Some(value(f))); i += 2
        case "-ow" => a = a.copy(ow = true); i += 1
        case other =>
          System.err.println(s"unknown option: $other"); usage()
      }
    }
    a
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The reference's guard semantics: refuse to touch an existing
    * product unless -ow (fs_process_l1.py:41-49). Checked BEFORE any
    * compute, so a refused run costs nothing. */
  private def guard(spark: SparkSession, path: String, ow: Boolean,
                    what: String): Unit =
    if (!ow && exists(spark, path))
      throw new java.io.IOException(
        s"The $what output $path already exists. To overwrite, specify -ow.")

  def l1DefaultPath(root: String, site: String): String =
    s"$root/firn_stations/level-1/$site.csv"
  def l2DefaultPath(root: String, site: String): String =
    s"$root/firn_stations/level-2/$site.csv"

  private def loadL1(spark: SparkSession, path: String,
                     tsCol: String): DataFrame = {
    // load_level1_dataset (fs_pp.py:168-183): header CSV, parse the
    // index column as timestamps, everything else numeric
    val raw = spark.read.option("header", "true")
      .option("inferSchema", "true")
      // nullValue, NOT nanValue: the TOA5 'NAN' sentinel must read as
      // null (Toa5.read's convention) — as Double.NaN it is non-null,
      // so quality-flag imputation skips it and NaN poisons medians
      .option("nullValue", "NAN").csv(path)
    raw.withColumn(tsCol, col(tsCol).cast("timestamp"))
  }

  def main(argv: Array[String]): Unit = {
    val a = parse(argv)
    val metafile = a.metafile.getOrElse(
      s"${a.dataRoot}/firn_stations/ppconfig/${a.site}.toml")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // reuse a live session if one exists (tests drive main() in-JVM);
    // only stop what this run itself created
    val pre = SparkSession.getDefaultSession
      .orElse(SparkSession.getActiveSession)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val site = Site.fromToml(spark, metafile, a.dataRoot)
      a.cmd match {
        case "l1" =>
          val out = a.outfile.getOrElse(l1DefaultPath(a.dataRoot, a.site))
          guard(spark, out, a.ow, "Level-1")
          Writers.csvSingle(site.level1(), out, sortCols = Seq(site.cfg.tsCol))
          println(s"[cli] level-1 written: $out")
        case "l2" =>
          val outCsv = a.outfile.getOrElse(l2DefaultPath(a.dataRoot, a.site))
          val outNc = outCsv.stripSuffix(".csv") + ".nc"
          guard(spark, outCsv, a.ow, "Level-2")
          guard(spark, outNc, a.ow, "Level-2 NetCDF")
          val l1Path = a.l1file.getOrElse(l1DefaultPath(a.dataRoot, a.site))
          val l2 = site.level2(loadL1(spark, l1Path, site.cfg.tsCol))
          Writers.csvSingle(l2, outCsv, sortCols = Seq(site.cfg.tsCol))
          // export-sized driver-side NetCDF (S8) with the reference's
          // site attribution (fs_process_l2.py:177-192)
          NetCdf.writeWide(outNc, l2, site.cfg.tsCol,
            globalAtts = Seq(
              NetCdf.Att("site", a.site),
              NetCdf.Att("source", "graft level-2 pipeline"),
              NetCdf.Att("timezone", "UTC")))
          println(s"[cli] level-2 written: $outCsv, $outNc")
      }
    } finally if (pre.isEmpty) spark.stop()
  }
}
