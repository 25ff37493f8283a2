package graft

import org.apache.spark.sql.functions._

/** The miner duplicate-saturation pre-flight (t147) on a
  * replica-saturated corpus — the silent-0-pairs failure mode the
  * r16/r17 scale probes hit: every vector replicated 6×, so each
  * x-side row's entire candidate neighborhood is its own replicas at
  * cos = 1.0, the ratio margin pins to exactly 1000000 (never above
  * t137's strict > threshold), and the miner returns nothing. The
  * pre-flight must fire there, and must NOT fire on the organic
  * testdata corpus the gate runs on. */
class MinerPreflightSpec extends SparkSpec {

  import spark.implicits._

  private val replicaDir = "/tmp/graft_test_preflight_replica"

  private def writeReplicaCorpus(): Unit = {
    // 100 base vectors × 10 replicas (ids 10b..10b+9): 5 evens land
    // on the miner's x side, 5 odds on y, every replica group shares
    // one exact vector — deterministic coords from the BASE id, so
    // replicas are bit-identical and cos(x, y-replica) = 1.0 exactly.
    // 10× matters: the margin's k=4 neighborhood must be FULLY
    // replica-saturated (4 cross-side replicas each) for the ratio to
    // pin at exactly 1 — the r16 scale-probe shape; at 6× (only 3
    // cross-side replicas) the 4th neighbor is an outsider and the
    // miner still fires
    val df = spark.range(1000).select($"id".as("vec_id"),
      ($"id" / 10).cast("long").as("b"))
      .select($"vec_id", array((1 to 64).map(d =>
        ((pmod(hash($"b" * lit(d + 31)), lit(1000)).cast("double") +
          lit(100.0)) / lit(700.0)).cast("float")): _*).as("embedding"))
    df.coalesce(1).write.mode("overwrite")
      .parquet(s"$replicaDir/embeddings.parquet")
  }

  private val parityDir = "/tmp/graft_test_preflight_parity"

  private def writeParityReplicaCorpus(): Unit = {
    // the DataGen-replica shape: vec_id shifts by a fixed EVEN modulus
    // (here 200), so every copy keeps its parity — x-side copies stay
    // on x, y-side on y, and NO candidate pair is ever a near-dup.
    // Saturation still happens: x's best y partner exists as 10
    // equal-cosine copies, so its whole top-4 neighborhood is one
    // repeated value and the margin pins to exactly 1 at an
    // unremarkable similarity level (the degeneracy mechanism).
    val df = spark.range(2000).select(($"id" % 200).as("b"),
      $"id".as("vec_id"))
      .select($"vec_id", array((1 to 64).map(d =>
        ((pmod(hash($"b" * lit(d + 31)), lit(1000)).cast("double") +
          lit(100.0)) / lit(700.0)).cast("float")): _*).as("embedding"))
    df.coalesce(1).write.mode("overwrite")
      .parquet(s"$parityDir/embeddings.parquet")
  }

  test("pre-flight fires exactly where the margin miner mines zero " +
    "(cross-side replicas: the near-dup-band signal)") {
    writeReplicaCorpus()
    val mined = SparkEntry.queries("t137_bitext_margin")(
      spark, replicaDir)
    assert(mined.count() === 0,
      "replica-saturated corpus: the ratio margin is exactly 1 for " +
        "every candidate, so the miner must mine nothing")
    val pf = SparkEntry.queries("t147_miner_preflight")(
      spark, replicaDir).collect()
    assert(pf.length === 1)
    val r = pf.head
    assert(r.getAs[Boolean]("saturated"),
      "every top-1 candidate is an exact replica — the flag must fire")
    assert(r.getAs[Long]("mean_top1_cm") === 1000000L)
    assert(r.getAs[Long]("sat_ppm") === 1000000L)
    assert(r.getAs[Long]("n_x") > 0)
  }

  test("pre-flight fires on parity-preserving replicas where the " +
    "band signal is blind (the degeneracy signal)") {
    writeParityReplicaCorpus()
    val mined = SparkEntry.queries("t137_bitext_margin")(
      spark, parityDir)
    assert(mined.count() === 0,
      "degenerate neighborhoods: margin exactly 1, nothing mined")
    val pf = SparkEntry.queries("t147_miner_preflight")(
      spark, parityDir).collect()
    assert(pf.length === 1)
    val r = pf.head
    assert(r.getAs[Long]("sat_ppm") < 500000L,
      "copies never cross sides — the near-dup band must NOT carry " +
        "this corpus")
    assert(r.getAs[Long]("deg_ppm") >= 500000L,
      "top-4 neighborhoods are one repeated value — degeneracy must")
    assert(r.getAs[Boolean]("saturated"))
  }

  private val bigParityDir = "/tmp/graft_test_preflight_bigparity"

  private def writeBigParityReplicaCorpus(): Unit = {
    // 10,000 vectors (500 base × 20 parity-preserving copies): the
    // x side is 5,000 rows, so the pre-flight's sampling stride is
    // max(1, 5000/2048) = 2 and the hash-stratified slice genuinely
    // engages — the signal must still fire from the ~half of x it
    // measures
    val df = spark.range(10000).select(($"id" % 500).as("b"),
      $"id".as("vec_id"))
      .select($"vec_id", array((1 to 64).map(d =>
        ((pmod(hash($"b" * lit(d + 31)), lit(1000)).cast("double") +
          lit(100.0)) / lit(700.0)).cast("float")): _*).as("embedding"))
    df.coalesce(1).write.mode("overwrite")
      .parquet(s"$bigParityDir/embeddings.parquet")
  }

  test("sampled pre-flight (stride > 1) still fires, from a strict " +
    "subset of the x side") {
    writeBigParityReplicaCorpus()
    val pf = SparkEntry.queries("t147_miner_preflight")(
      spark, bigParityDir).collect()
    assert(pf.length === 1)
    val r = pf.head
    assert(r.getAs[Long]("n_x") < 5000L,
      "stride 2: the hash slice must measure a strict subset of x")
    assert(r.getAs[Long]("n_x") > 1000L,
      "the Knuth high-half hash must not collapse the all-even x " +
        "side into a near-empty (or full) sample")
    assert(r.getAs[Long]("deg_ppm") >= 500000L,
      "every x's top-4 neighborhood is one repeated value — the " +
        "sampled estimate must still carry the degeneracy signal")
    assert(r.getAs[Boolean]("saturated"))
  }

  test("pre-flight stays quiet on the organic gate corpus") {
    val pf = SparkEntry.queries("t147_miner_preflight")(
      spark, "/root/testdata/sf0.001").collect()
    assert(pf.length === 1)
    assert(!pf.head.getAs[Boolean]("saturated"),
      "organic corpus: nearest candidates sit well below the " +
        "near-dup band")
  }
}
