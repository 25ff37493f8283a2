package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BeadedStream DTC temperature-chain ingest (reference
  * pp_dtcs.py:47-53): a plain headered CSV — unlike TOA5 there are no
  * metadata rows to skip — whose first column is the timestamp index.
  * Housekeeping columns (timezone, battery voltage, panel temperature)
  * drop; every remaining column is a per-depth temperature reading,
  * typed double (column names carry the depth labels).
  *
  * A distributed CSV scan like any other: files split and parallelize;
  * `try_*` casts keep ANSI mode from throwing on dirty cells.
  */
object Dtc {

  /** The reference's housekeeping drop list (pp_dtcs.py:51). */
  val DefaultDrop: Seq[String] = Seq("timezone", "Battery (V)",
    "Panel Temp (C)")

  def read(spark: SparkSession, path: String,
           dropCols: Seq[String] = DefaultDrop,
           timeCol: String = "time"): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    val tsCol = raw.columns.head
    val kept = raw.drop(dropCols: _*)
    kept.select(
      try_to_timestamp(col(s"`$tsCol`")).as(timeCol) +:
        kept.columns.filter(_ != tsCol).toSeq
          .map(c => expr(s"try_cast(`$c` AS double)").as(c)): _*)
  }
}
