package graft

import org.apache.spark.sql.functions._

import graft.functions.AggregateExpressions

/** VecCovarianceAgg: exactness, mergeability, and the whitening/PCA
  * consumer it exists for. */
class CovarianceSpec extends SparkSpec {

  import spark.implicits._

  test("covariance agg matches the hand-computed matrix across partials") {
    // x = (1,3,5), y = (2,5,11): means (3,6); var_pop x = 8/3,
    // var_pop y = 14, cov(x,y) = 24 − 18 = 6
    val df = Seq(Array(1f, 2f), Array(3f, 5f), Array(5f, 11f))
      .toDF("embedding")
      .repartition(3) // forces merge() of three single-row partials
    val m = df.agg(AggregateExpressions.vecCovariance(col("embedding"), 2))
      .head().getSeq[Double](0)
    assert(math.abs(m(0) - 8.0 / 3.0) < 1e-12) // cov(0,0)
    assert(math.abs(m(1) - 6.0) < 1e-12)       // cov(0,1)
    assert(math.abs(m(2) - 6.0) < 1e-12)       // cov(1,0) — symmetric
    assert(math.abs(m(3) - 14.0) < 1e-12)      // cov(1,1)
  }

  test("empty input evaluates to null, wrong dim throws") {
    val empty = Seq.empty[Array[Float]].toDF("embedding")
    assert(empty.agg(AggregateExpressions.vecCovariance(col("embedding"), 2))
      .head().isNullAt(0))
    val bad = Seq(Array(1f, 2f, 3f)).toDF("embedding")
    val ex = intercept[Exception] {
      bad.agg(AggregateExpressions.vecCovariance(col("embedding"), 2))
        .head()
    }
    assert(ex.getMessage.contains("expected dim"))
  }

  test("power iteration on the matrix finds a dominant direction") {
    // the consumer this aggregate exists for: collect the d×d matrix
    // (driver-sized) and extract the top principal component
    val d = 64
    val m = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .agg(AggregateExpressions.vecCovariance(col("embedding"), d))
      .head().getSeq[Double](0).toArray
    def matvec(v: Array[Double]): Array[Double] =
      Array.tabulate(d)(i =>
        (0 until d).map(j => m(i * d + j) * v(j)).sum)
    var v = Array.fill(d)(1.0 / math.sqrt(d))
    for (_ <- 1 to 100) {
      val w = matvec(v)
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / norm)
    }
    val rayleigh = v.zip(matvec(v)).map { case (a, b) => a * b }.sum
    val maxDiag = (0 until d).map(i => m(i * d + i)).max
    // top eigenvalue dominates every single-dimension variance
    assert(rayleigh >= maxDiag - 1e-9)
    assert(rayleigh > 0.0)
  }
}
