package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R1–R4 — wide ↔ long reshaping.
  *
  * Reference semantics: fs_process_l2.py:80-95,129-155 reshapes regex-
  * selected wide sensor-family columns (`DTC1(1)..DTC1(12)`) into xarray
  * DataArrays dimensioned (time × sensor) with an install-depth coordinate.
  * The Spark-native layout for per-sensor work is LONG form
  * (time, sensor_id, value) + a broadcast dimension table of sensors.
  *
  * Scale notes: `unpivot` is a Generate (no shuffle); the sensor dim join
  * is a broadcast. Long form is also what makes the per-sensor recurrence
  * (X1) partitionable by sensor at scale.
  */
object Reshape {

  /** R1 — wide sensor-family columns → long (ids…, sensor, value).
    * Uses Spark's native `unpivot` (Generate, zero shuffle). */
  def toLong(df: DataFrame, idCols: Seq[String], familyCols: Seq[String],
             varName: String = "sensor",
             valueName: String = "value"): DataFrame =
    df.unpivot(idCols.map(col).toArray, familyCols.map(col).toArray,
      varName, valueName)

  /** R1 inverse — long → wide pivot: one output column per key in
    * `keys`, cell = `agg` over the rows whose `varCol` equals the key.
    *
    * Two scale choices vs `Dataset.pivot`: the STATIC key list avoids
    * the column-discovery distinct-scan job (a full corpus pass at
    * 100 TB when keys aren't passed), and the lowering is plain
    * conditional aggregation (`agg(when(var = k, value))`) — a
    * codegen'd hash aggregate, where Spark's pivot lowers to the
    * imperative non-codegen `PivotFirst` buffer. Identical semantics
    * for null-ignoring aggregates (sum/avg/min/max/count/first). */
  def toWide(df: DataFrame, idCols: Seq[String], varCol: String,
             keys: Seq[String], valueCol: String,
             agg: Column => Column): DataFrame = {
    val cells = keys.map(k =>
      agg(when(col(varCol) === k, col(valueCol))).as(k))
    df.groupBy(idCols.map(col): _*).agg(cells.head, cells.tail: _*)
  }

  /** C5 — build a rename map by applying regex rules to column names.
    * Each rule is (pattern with one capture group for the sensor id,
    * replacement with `*` standing for the id). Driver-side over the
    * schema only (fs_pp.py:340-388). */
  def regexRenameMap(cols: Seq[String],
                     rules: Seq[(String, String)]): Map[String, String] =
    // ListMap: callers FOLD withColumnRenamed over this map, and a
    // plain HashMap's arbitrary iteration order makes rename chains
    // (A→B while B→C) nondeterministic across runs; insertion order
    // (= schema order) pins it
    scala.collection.immutable.ListMap(cols.flatMap { c =>
      rules.collectFirst {
        case (pat, repl) if c.matches(pat) =>
          val m = java.util.regex.Pattern.compile(pat).matcher(c)
          m.matches()
          // group(1) is NULL when an alternation matched without the
          // group participating — treat like a group-less rule
          // instead of NPE-ing in replace
          val id = if (m.groupCount() >= 1 && m.group(1) != null)
            m.group(1) else ""
          c -> repl.replace("*", id)
      }
    }: _*)

  /** Select the columns of a family by regex (P3), driver-side. */
  def familyCols(df: DataFrame, regex: String): Seq[String] =
    df.columns.filter(_.matches(regex)).toSeq
}
