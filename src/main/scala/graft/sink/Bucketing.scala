package graft.sink

import org.apache.spark.sql.DataFrame

/** Bucketed table layout for co-located joins.
  *
  * At 100 TB the fact⋈fact join (lineitem⋈orders, readings⋈readings)
  * is the dominant shuffle. Writing both sides bucketed (and sorted)
  * by the join key makes the join a zero-shuffle sort-merge: each task
  * reads matching bucket files from both tables. This is the batch
  * materialization counterpart of `repartition()` co-location — paid
  * once at write time, amortized over every subsequent join.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
