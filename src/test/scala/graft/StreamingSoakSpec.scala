package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Composed production-cadence soak: the live-ingest chain
  * (blocklist gate → decontamination gate → quality gate → deduped
  * append sink — four stages, the t66/t13/t116/d1 operators'
  * streaming twins) run as ONE streaming query across multiple
  * microbatches, crashed after batch 2 and replayed by a fresh
  * stream that redelivers the same batch (the checkpoint-recovery
  * delivery pattern, as in the noveltyGateStream crash test). The
  * end state of the sink must equal the one-shot BATCH application
  * of the same gates over the unique deliveries — composition bugs
  * (column collisions, a gate reordering rows into the dedup seam,
  * replayed appends duplicating the sink) are what single-stage
  * specs cannot see. */
class StreamingSoakSpec extends SparkSpec {

  import spark.implicits._

  test("4-stage pipeline over 3 microbatches + crash/replay: sink " +
    "end-state equals the batch gates over unique deliveries") {
    implicit val sc = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val sink = java.nio.file.Files
      .createTempDirectory("graft-soak").toString + "/corpus"

    // the standing quality model, loaded as a pipeline would (t115)
    val model = SparkEntry.queries("t115_logreg_distill")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val bias = model.find(_._1 == "__bias").get._2
    val wts = model.filterNot(_._1 == "__bias").toSeq
    val blocked = Seq("evil.example.net")
    val evalGrams = Seq("zq1 zq2 zq3").toDF("g")

    // 45 real docs; every 5th cites a blocked domain, every 7th
    // carries the eval phrase — the gates must fire on real text
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .orderBy("doc_id").limit(45)
      .select(col("doc_id"), col("text"), col("source")).collect()
      .map { r =>
        val id = r.getLong(0)
        val poison =
          (if (id % 5 == 0) " see https://evil.example.net/x" else "") +
          (if (id % 7 == 0) " zq1 zq2 zq3" else "")
        (id, r.getString(1) + poison, r.getString(2))
      }
    val Array(b1, b2, b3head) =
      base.grouped(15).toArray.asInstanceOf[Array[Array[(Long, String,
        String)]]]
    // batch 3 adds cross-batch duplicates (same text, NEW larger ids)
    // and an in-batch duplicate pair — the dedup sink must keep the
    // first-arrived copy in every case
    val dupes = b1.take(2).map { case (id, t, s) => (id + 100000L, t, s) }
    val pair = Array((200001L, "soak pair text unique", "sX"),
      (200002L, "soak pair text unique", "sX"))
    val b3 = b3head ++ dupes ++ pair

    def gate(df: DataFrame): DataFrame = {
      val a = Streaming.blocklistStream(df, "text", blocked)
      val d = Streaming.decontaminateStream(a, "text", evalGrams)
      Streaming.qualityScoreStream(d, "text", wts, bias)
        .where(col("keep"))
        .select("doc_id", "text", "source")
    }

    // ---- streaming run 1: batches 1 and 2, then "crash" ----
    val in1 = MemoryStream[(Long, String, String)]
    val q1 = Streaming.appendDedupedStream(
      gate(in1.toDS().toDF("doc_id", "text", "source")),
      "doc_id", "text", sink).start()
    in1.addData(b1.toSeq: _*); q1.processAllAvailable()
    in1.addData(b2.toSeq: _*); q1.processAllAvailable()
    q1.stop()

    // ---- restart: a fresh stream REDELIVERS batch 2, then batch 3
    val in2 = MemoryStream[(Long, String, String)]
    val q2 = Streaming.appendDedupedStream(
      gate(in2.toDS().toDF("doc_id", "text", "source")),
      "doc_id", "text", sink).start()
    in2.addData(b2.toSeq: _*); q2.processAllAvailable()
    in2.addData(b3.toSeq: _*); q2.processAllAvailable()
    q2.stop()

    // ---- batch parity: same gates, one shot, unique deliveries ----
    val all = (b1 ++ b2 ++ b3).toSeq.toDF("doc_id", "text", "source")
    val expected = gate(all)
      .withColumn("__h", md5(col("text")))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("__h").orderBy("doc_id")))
      .where(col("__rk") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val got = spark.read.parquet(sink)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === expected,
      s"sink end-state diverged from the batch gates:\n" +
        s"only in sink: ${(got -- expected).toSeq.sorted}\n" +
        s"missing:      ${(expected -- got).toSeq.sorted}")
    // the gates actually fired: blocked, contaminated, and duplicate
    // docs are absent; something survived
    assert(got.nonEmpty)
    assert(base.count { case (id, _, _) => id % 5 == 0 } > 0)
    assert(got.forall(id => id % 5 != 0 || id >= 100000L))
    assert(!got.contains(200002L) || !got.contains(200001L))
    // replay idempotence concretely: nothing from batch 2 appears
    // twice in the sink
    val cnts = spark.read.parquet(sink).groupBy("doc_id").count()
      .where(col("count") > 1).count()
    assert(cnts === 0, "replayed batch duplicated sink rows")
  }
}
