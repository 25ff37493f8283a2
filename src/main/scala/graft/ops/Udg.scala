package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The UDG (sonic-ranger surface height) processing chain:
  * piecewise normalisation for sensor re-mounts (C3) and the
  * quality/outlier filter pipeline (P5 → A2 → W3 → W1 → P6 → J5).
  *
  * Reference semantics: `_normalise_udg` fs_pp.py:452-511 and
  * `_filter_udg` fs_pp.py:514-567.
  */
object Udg {

  /** One sensor-height change event: at `at`, the mount moved. If
    * `change` is given it is subtracted from all data at/after `at`
    * (cumulatively with prior changes); if None the change is
    * auto-computed as (median of `window` before) − (median of `window`
    * after) sign-adjusted: post − pre (fs_pp.py:486-496). */
  case class HeightChange(at: java.sql.Timestamp, change: Option[Double])

  /** C3 — normalise a UDG series for mount changes. Auto changes need two
    * tiny median aggregates per change point (driver scalars, rounded to
    * 2 dp like the reference); the correction itself is a pure chained
    * CASE over cumulative offsets. */
  def normalise(df: DataFrame, udgCol: String, tsCol: String,
                changes: Seq[HeightChange],
                windowDays: Int = 1): DataFrame = {
    val resolved: Seq[(java.sql.Timestamp, Double)] =
      changes.sortBy(_.at.getTime).map { hc =>
        hc.change match {
          case Some(c) => hc.at -> c
          case None =>
            val t = hc.at.getTime
            val pre = new java.sql.Timestamp(t - windowDays * 86400000L)
            val post = new java.sql.Timestamp(t + windowDays * 86400000L)
            val row = df.agg(
              round(median(when(col(tsCol).between(lit(pre), lit(hc.at)),
                col(udgCol))), 2).as("pre"),
              round(median(when(col(tsCol).between(lit(hc.at), lit(post)),
                col(udgCol))), 2).as("post")).head()
            val delta =
              if (row.isNullAt(0) || row.isNullAt(1)) 0.0
              else row.getDouble(1) - row.getDouble(0)
            hc.at -> delta
        }
      }
    df.withColumn(udgCol,
      col(udgCol) - Joins.piecewiseOffset(col(tsCol), resolved))
  }

  /** P5→A2→W3→W1→P6→J5 — the UDG outlier filter:
    *  1. quality mask: keep iff 150 ≤ Q ≤ 210, null Q imputed to 150;
    *  2. infer the modal sampling interval (driver scalar);
    *  3. regularize onto that grid, forward-filling ≤ `ffillLimit` gaps;
    *  4. trailing `medianDays`-day rolling median on the regular grid;
    *  5. drop samples deviating ≥ `tol` from the rolling median;
    *  6. reindex the result back at the original sample times.
    * `keyCol` partitions every step (per-station at scale). */
  def filter(df: DataFrame, udgCol: String, qCol: String, tsCol: String,
             keyCols: Seq[String],
             ffillLimit: Int = 3, medianDays: Double = 2.0,
             tol: Double = 0.5): DataFrame = {
    val masked = df.withColumn(udgCol,
      Ranges.qualityMask(col(udgCol), col(qCol), 150, 210, 150))
    val stepSec = Windows.modalIntervalSec(masked, tsCol, keyCols)
    val grid = Windows.resampleGrid(
      masked.select((keyCols :+ tsCol :+ udgCol).map(col): _*),
      tsCol, keyCols, stepSec)
    val filled = Windows.ffillLimited(grid, udgCol, tsCol, keyCols,
      ffillLimit)
    val med = filled.withColumn("__med",
      Windows.rollingTrailing(Windows.med, col(udgCol), col(tsCol),
        keyCols.map(col), medianDays * 86400))
    val kept = med
      .withColumn(udgCol,
        Ranges.deviationMask(col(udgCol), col("__med"), tol))
      .drop("__med")
    // back at the original sample instants only
    Joins.reindexTo(kept, df.select((keyCols :+ tsCol).map(col): _*),
      keyCols :+ tsCol)
  }
}
