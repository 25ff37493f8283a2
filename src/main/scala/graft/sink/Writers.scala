package graft.sink

import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Paths}

/** Sinks S4/S7/S8: level-1/2 CSV products and the Parquet+sidecar
  * replacement for the reference's NetCDF export.
  *
  * The reference's NetCDF (fs_process_l2.py:177-204) carries: variables
  * dimensioned (time × sensor), an install-depth coordinate, CF attrs
  * (units, standard_name), global site attrs, and int32 fixed-point
  * encoding (scale 0.001, fill −9999). Information parity in Spark land:
  * long-form Parquet (time, sensor, value, install_depth) partitioned for
  * pruning + a JSON attrs sidecar; fixed-point ≙ an int32 column
  * `round(value*1000)` when requested (SURVEY §2.1 S8).
  */
object Writers {

  /** S4 — single continuous CSV (a stated product property of level-1;
    * the coalesce(1) is the point, not an accident — callers at scale
    * should use partitioned parquet instead). */
  def csvSingle(df: DataFrame, path: String,
                sortCols: Seq[String] = Nil): Unit = {
    val sorted = if (sortCols.nonEmpty)
      df.orderBy(sortCols.map(org.apache.spark.sql.functions.col): _*)
    else df
    sorted.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)
  }

  /** S8 — Parquet + JSON attribute sidecar, optionally partitioned by
    * time columns for scan pruning. */
  def parquetWithAttrs(df: DataFrame, path: String,
                       attrs: Map[String, String],
                       partitionBy: Seq[String] = Nil,
                       fixedPointCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions._
    val encoded = fixedPointCols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(col(c).isNull, lit(-9999))
          .otherwise(round(col(c) * 1000).cast("int")))
    }
    val w = encoded.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
    val json = attrs.map { case (k, v) =>
      "\"" + k.replace("\"", "\\\"") + "\": \"" +
        v.replace("\"", "\\\"") + "\""
    }.mkString("{", ", ", "}")
    Files.writeString(Paths.get(path, "_attrs.json"), json)
  }
}
