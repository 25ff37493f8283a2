package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Toa5
import graft.ops.{Cleaning, Joins}

/** Level-0 → Level-1: ingest raw TOA5 bales, union, clean, dedup.
  *
  * Reference lifecycle §3.1 (fs_pp.py:68-106): per-dataset bale loads →
  * concat → drop all-null columns → full-row dedup → keep-FIRST-per-
  * timestamp dedup. Keep-first is ingest order: file sequence then the
  * logger's RECORD counter — threaded explicitly because Spark row order
  * is undefined (SURVEY §2.4 D2).
  *
  * Plan shape: read → union → one aggregate (null-column probe) → one
  * shuffle (row dedup) → one shuffle (keyed window dedup) → result.
  */
object Level1 {

  /** One level-0 source: a directory of numbered bale files. */
  case class Source(dir: String, balesStart: Int, balesStop: Int,
                    template: String = "MainTable%d.dat",
                    nrows: Option[Int] = None)

  def run(spark: SparkSession, sources: Seq[Source],
          tsCol: String = "TIMESTAMP"): DataFrame = {
    // global file order across sources = source order then bale order
    var offset = 0
    val parts = sources.map { src =>
      val paths = Toa5.balePaths(src.dir, src.balesStart, src.balesStop,
        src.template)
      val df = Toa5.read(spark, paths, tsCol, src.nrows)
        .withColumn(Toa5.FileOrderCol, col(Toa5.FileOrderCol) + offset)
      offset += paths.size
      df
    }
    val unioned = Joins.unionAll(parts)
    val ordered = Seq(col(Toa5.FileOrderCol)) ++
      (if (unioned.columns.contains("RECORD")) Seq(col("RECORD")) else Nil)
    val cleaned = Cleaning.dedupKeepFirst(
      Cleaning.dropDuplicateRows(
        Cleaning.dropAllNullColumns(unioned)),
      Seq(tsCol), ordered)
    cleaned.drop(Toa5.FileOrderCol)
  }
}
