package graft

import org.apache.spark.sql.functions._

/** t131 — the composed release pipeline (ingest → gates → keep-best
  * dedup → span decontam → budget → shuffle → manifest → TFRecord
  * export). The DuckDB oracle gates the VALUES end to end; this spec
  * pins the properties the oracle can't see: the artifact run is
  * idempotent (stale shards from a previous survivor set are cleared,
  * a re-run reproduces the bytes), the integrity columns are clean,
  * and the final plan has the shape the composition promises (the
  * upstream stages are checkpointed — the output plan reads ONE
  * staged artifact RDD and ONE read-back file scan, no re-execution
  * lineage and no broadcast hints). */
class ReleasePipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run() =
    SparkEntry.queries("t131_release_pipeline")(spark, sfDir)

  test("release pipeline: non-empty, integrity columns clean, and a " +
    "re-run in the same JVM reproduces the artifact byte-for-byte") {
    val first = run().collect().sortBy(_.getString(0))
    assert(first.nonEmpty, "release produced zero shards")
    val asMap = first.map(r => r.getString(0) -> r.toSeq).toMap
    // integrity: every record's CRCs verified on read-back, zero
    // quarantined ingest lines
    first.foreach { r =>
      assert(r.getAs[Long]("crc_fail") === 0L, s"crc_fail in $r")
      assert(r.getAs[Long]("quarantined") === 0L, s"quarantine in $r")
      // the manifest and the decoded read-back count tokens off the
      // same redacted lists (token_total filters empty tokens, so ≤)
      assert(r.getAs[Long]("token_total") <= r.getAs[Long]("n_tokens"))
    }
    // idempotence: the second run rewrites the JSONL and clears +
    // rewrites the TFRecord dir — stale shards from the first run
    // must not leak into the read-back
    val second = run().collect().sortBy(_.getString(0))
    assert(second.map(r => r.getString(0) -> r.toSeq).toMap === asMap,
      "re-run drifted from the first artifact")
  }

  test("release pipeline plan: output reads one checkpointed artifact " +
    "and one read-back scan — no stage re-execution, no hints") {
    val df = run()
    val plan = df.queryExecution.optimizedPlan
    val rdds = plan.collect {
      case r: org.apache.spark.sql.execution.ExternalRDD[_] => r
      case r: org.apache.spark.sql.execution.LogicalRDD => r
    }
    assert(rdds.size === 1,
      s"expected exactly 1 checkpointed artifact RDD, got ${rdds.size}")
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.datasources
        .LogicalRelation => s
    }
    assert(scans.size === 1,
      s"expected exactly 1 read-back file scan, got ${scans.size}")
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty,
      s"release output plan must carry no hints, got ${hints.size}")
  }
}
