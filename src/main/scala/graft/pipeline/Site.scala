package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.Toml
import graft.ops.Udg

/** The reference's library API surface: construct from a site TOML
  * metafile, then run level0→level1→level2
  * (cassandra_fs_pp/__init__.py:1, fs_pp.py:29-65 `_load_config`,
  * README.md "Metadata files") — but holding lazy DataFrames instead of
  * mutable eager state.
  *
  * {{{
  *   val site = Site.fromToml(spark, "/data/ppconfig/fs1.toml", dataRoot)
  *   val l1 = site.level1()            // lazy plan
  *   val l2 = site.level2(l1)          // lazy plan
  * }}}
  */
object Site {

  val RequiredKeys = Seq("site", "level0_1.udg_key")

  /** Default L2 regex rename rules (the reference ships these as
    * cassandra_fs_pp/fs_column_names.csv; same mappings, driver-side). */
  val DefaultRenameRules: Seq[(String, String)] = Seq(
    ("""DTC1\(([0-9]+)\)""", "DTC1_*(C)"),
    ("""DTC2\(([0-9]+)\)""", "DTC2_*(C)"),
    ("""EC\(([0-9]+)\)""", "EC_*(microS)"),
    ("""(TDR[0-9]+)_VWC""", "*_VWC(m3/m3)"),
    ("""(TDR[0-9]+)_T""", "*_T(C)"),
    ("""(TDR[0-9]+)_EC""", "*_EC(dS/m)"),
    ("""(TDR[0-9]+)_Perm""", "*_Perm()"),
    ("""TCDT""", "TCDT(m)"),
    ("""T107_C""", "t_air(C)"))

  /** Default valid physical ranges
    * (cassandra_fs_pp/valid_data_ranges.toml). */
  val DefaultValidRanges: Map[String, (Double, Double)] = Map(
    "T107_C" -> (-50.0, 10.0), "TDR_T" -> (-50.0, 10.0),
    "TDR_VWC" -> (0.0, 1.0), "TDR_Perm" -> (1.0, 81.0),
    "TDR_EC" -> (0.0, 8.0), "EC" -> (0.5, 1.0))

  case class Spec(spark: SparkSession, site: String,
                  sources: Seq[Level1.Source], cfg: Level2.Config,
                  udgTarget: String) {
    def level1(): DataFrame = Level1.run(spark, sources, cfg.tsCol)
    def level2(l1: DataFrame): DataFrame = Level2.run(l1, cfg, udgTarget)
  }

  def fromToml(spark: SparkSession, metafile: String,
               dataRoot: String): Spec = {
    val m = Toml.parseFile(metafile)
    RequiredKeys.foreach(k =>
      require(m.contains(k), s"missing required config key: $k"))

    val sources = Toml.keysUnder(m, "level0")
      .filter(_.endsWith(".subpath")).sorted.map { k =>
        val sec = k.stripSuffix(".subpath")
        val subpath = Toml.str(m, k)
        val serviced = m.getOrElse(s"$sec.serviced", false)
          .asInstanceOf[Boolean]
        val nrows = m.get(s"$sec.nrows").map(_.asInstanceOf[Long].toInt)
        // reference datasets are `type = 'bales' | 'onefile'`
        // (fs_pp.py:126-129); for onefile the subpath names the file
        m.getOrElse(s"$sec.type", "bales") match {
          case "onefile" =>
            val slash = subpath.lastIndexOf('/')
            val (parent, file) =
              if (slash < 0) ("", subpath)
              else (subpath.substring(0, slash + 1),
                subpath.substring(slash + 1))
            Level1.Source.onefile(
              dir = s"$dataRoot/$parent".stripSuffix("/"),
              file = file, nrows = nrows, serviced = serviced)
          case _ =>
            Level1.Source(
              dir = s"$dataRoot/$subpath",
              balesStart = m.getOrElse(s"$sec.bales_start", 1L)
                .asInstanceOf[Long].toInt,
              balesStop = m.getOrElse(s"$sec.bales_stop", 1L)
                .asInstanceOf[Long].toInt,
              nrows = nrows, serviced = serviced)
        }
      }

    val heightChanges = m.get("level1_2.udg_height_change")
      .map(_.asInstanceOf[List[Any]].map { e =>
        val l = e.asInstanceOf[List[Any]]
        Udg.HeightChange(l.head.asInstanceOf[java.sql.Timestamp],
          l.lift(1).map(Toml.dblValue))
      }).getOrElse(Nil)

    val removeCols = m.get("level1_2.remove_columns")
      .map(_.asInstanceOf[List[Any]].map(_.toString)).getOrElse(Nil)

    val udgKey = Toml.str(m, "level0_1.udg_key")
    val cfg = Level2.Config(
      tsCol = Toml.strOpt(m, "level0_1.index_col").getOrElse("TIMESTAMP"),
      udgKey = udgKey,
      qKey = Toml.strOpt(m, "level0_1.q_key").getOrElse("Q"),
      validRanges = DefaultValidRanges,
      removeColumns = removeCols,
      renameRules = DefaultRenameRules,
      heightChanges = heightChanges,
      ecFamilyRegex = """EC_[0-9]+\(microS\)""")
    val udgTarget = graft.ops.Reshape
      .regexRenameMap(Seq(udgKey), DefaultRenameRules)
      .getOrElse(udgKey, udgKey)
    Spec(spark, Toml.str(m, "site"), sources, cfg, udgTarget)
  }
}
