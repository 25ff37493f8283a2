package graft

import org.apache.spark.sql.functions._

import graft.sink.Bucketing

/** Co-located join: both sides bucketed+sorted by the join key →
  * sort-merge join with NO shuffle exchange on either side. */
class BucketingSpec extends SparkSpec {

  import spark.implicits._

  test("bucketed tables join without a shuffle") {
    val left = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "s")
    Bucketing.writeBucketed(left, "b_left", Seq("k"), 4)
    Bucketing.writeBucketed(right, "b_right", Seq("k"), 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_left").join(spark.table("b_right"), "k")
      assert(joined.count() === 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }
}
