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

  /** C3 — normalise a UDG series for mount changes. ALL auto change
    * points resolve in ONE aggregate pass (two conditional medians per
    * point, driver scalars rounded to 2 dp like the reference) — the
    * per-point sequential form scanned the full series once per
    * change; the correction itself is a pure chained CASE over
    * cumulative offsets. */
  def normalise(df: DataFrame, udgCol: String, tsCol: String,
                changes: Seq[HeightChange],
                windowDays: Int = 1): DataFrame = {
    val sorted = changes.sortBy(_.at.getTime)
    val autos = sorted.zipWithIndex.filter(_._1.change.isEmpty)
    val deltas: Map[Int, Double] =
      if (autos.isEmpty) Map.empty
      else {
        val aggs = autos.flatMap { case (hc, i) =>
          val t = hc.at.getTime
          val pre = new java.sql.Timestamp(t - windowDays * 86400000L)
          val post = new java.sql.Timestamp(t + windowDays * 86400000L)
          Seq(
            round(median(when(col(tsCol).between(lit(pre), lit(hc.at)),
              col(udgCol))), 2).as(s"__pre$i"),
            round(median(when(col(tsCol).between(lit(hc.at), lit(post)),
              col(udgCol))), 2).as(s"__post$i"))
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        autos.map { case (_, i) =>
          val pi = row.fieldIndex(s"__pre$i")
          val qi = row.fieldIndex(s"__post$i")
          i -> (if (row.isNullAt(pi) || row.isNullAt(qi)) 0.0
                else row.getDouble(qi) - row.getDouble(pi))
        }.toMap
      }
    val resolved: Seq[(java.sql.Timestamp, Double)] =
      sorted.zipWithIndex.map { case (hc, i) =>
        hc.at -> hc.change.getOrElse(deltas(i))
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
    * `keyCol` partitions every step (per-station at scale).
    *
    * GRID CONTRACT: the regularization joins at EXACT instants on a
    * min(ts)-anchored modal grid (resampleGrid's documented asfreq
    * semantics), so samples whose timestamps drift off that grid —
    * e.g. the tail of a series after a mid-deployment logger restart
    * at an off-cadence minute — do not land on grid points and drop
    * out of the filtered output. TOA5 loggers emit on their grid, so
    * the reference's data satisfies this; a drifting series should be
    * split at the restart (each segment re-anchors) before
    * filtering. */
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
