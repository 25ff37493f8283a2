package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the hierarchical coarse quantizer (r16):
  * times FLAT single-level assignment (O(n·k) scans of one broadcast
  * centroid row) against the TWO-LEVEL path (O(n·(g + k/g)), g = ⌈√k⌉,
  * centroids as a g-row broadcast table) over the same corpus and the
  * same corpus-scaled cell count `k = max(64, n/8)` (t138's sizing).
  * Prints one JSON line: per-path seconds (min of 2 passes) plus the
  * agreement rate of the two assignments — two-level is approximate by
  * design (the true nearest child can live in a non-nearest super), so
  * the number that justifies the switch is cost-vs-agreement, not
  * equality. */
object HierBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .localCheckpoint(true) // measure assignment, not the scan
    val n = e.count()
    val k = math.max(64L, n / 8L)
    val g = graft.ops.Vectors.hierGroups(k)
    val cents = e.where(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("v"))
      .localCheckpoint(true)
    def time2(f: => Long): (Double, Long) = {
      def once = { val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r) }
      val a = once; val b = once
      (math.min(a._1, b._1), b._2)
    }
    val (flatSec, _) = time2(
      graft.ops.Vectors.ivfAssignWithVec(e, cents, "vec_id", "cid", "v")
        .agg(sum(col("cid"))).collect()(0).getLong(0))
    val (hierSec, _) = time2(
      graft.ops.Vectors.ivfAssignWithVecHier(e, cents, g, "vec_id",
        "cid", "v").agg(sum(col("cid"))).collect()(0).getLong(0))
    val flat = graft.ops.Vectors
      .ivfAssignWithVec(e, cents, "vec_id", "cid", "v")
      .select(col("vec_id"), col("cid").as("cf"))
    val hier = graft.ops.Vectors
      .ivfAssignWithVecHier(e, cents, g, "vec_id", "cid", "v")
      .select(col("vec_id"), col("cid").as("ch"))
    val agree = flat.join(hier, Seq("vec_id"))
      .agg(sum(when(col("cf") === col("ch"), 1L).otherwise(0L)),
        count(lit(1))).collect()(0)
    // quantization quality: mean squared distortion of each path's
    // assignment — two-level may pick a DIFFERENT cell of similar
    // tightness, so distortion ratio (≥ 1, 1 = lossless routing) is
    // the quality number, not cell agreement
    def distortion(asg: org.apache.spark.sql.DataFrame,
                   cc: String): Double = asg
      .join(e.select(col("vec_id"), col("v")), Seq("vec_id"))
      .join(cents.select(col("cid").as(cc), col("v").as("__cv")),
        Seq(cc))
      .agg(avg(graft.ops.Vectors.sqDist(col("v"), col("__cv"))))
      .collect()(0).getDouble(0)
    val dFlat = distortion(flat, "cf")
    val dHier = distortion(hier, "ch")
    println(s"""{"n":$n,"k":$k,"g":$g,""" +
      s""""flat_sec":${"%.3f".format(flatSec)},""" +
      s""""hier_sec":${"%.3f".format(hierSec)},""" +
      s""""agree":${agree.getLong(0)},"rows":${agree.getLong(1)},""" +
      s""""flat_msd":${"%.4f".format(dFlat)},""" +
      s""""hier_msd":${"%.4f".format(dHier)},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
