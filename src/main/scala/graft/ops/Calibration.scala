package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C1+J4 — linear sensor calibration.
  *
  * Reference semantics: fs_pp.py:570-608 `_calibrate_ec` — EC sensors
  * report mV; calibration is `y = m * x' + c` with an optional input
  * transform `x' = 1 - x`, per-sensor coefficients from a side CSV, and a
  * mean-of-all-sensors fallback when a sensor has no calibration row.
  *
  * Long-form application: readings (key, ts, sensor, value) joined against
  * a broadcast coefficients dim (sensor, m, c) — the idiomatic Spark shape
  * (the reference's per-column loop becomes one join + one expression).
  */
object Calibration {

  /** The calibration expression itself — pure arithmetic, codegen'd. */
  def linear(x: Column, m: Column, c: Column,
             oneMinus: Boolean = false): Column = {
    val xx = if (oneMinus) lit(1.0) - x else x
    m * xx + c
  }

  /** Apply per-sensor linear calibration to a long-form readings table.
    * `coef` has (keyCol, m, c); missing sensors fall back to the mean
    * coefficients (fs_pp.py:589-594). Single broadcast join, no shuffle
    * of the readings side. */
  def applyLinear(readings: DataFrame, coef: DataFrame, keyCol: String,
                  valueCol: String, oneMinus: Boolean = false): DataFrame = {
    val withCoef = Joins.lookupWithFallback(readings, coef, keyCol,
      Seq("m", "c"))
    withCoef
      .withColumn(valueCol,
        linear(col(valueCol), col("m"), col("c"), oneMinus))
      .drop("m", "c")
  }
}
