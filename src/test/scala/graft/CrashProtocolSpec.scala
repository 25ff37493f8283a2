package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streaming

/** Crash and race protocol tests for the maintenance paths whose
  * failure deletes a corpus: compactSink's temp-swap under an
  * injected rename fault (the real syscall failing mid-protocol, not
  * a hand-built directory state) and the compaction lease that turns
  * the compact-vs-append race into a loud retry. */
class CrashProtocolSpec extends SparkSpec {

  private def faultPath(suffix: String): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.faultfs.impl", classOf[FaultFs].getName)
    val dir = java.nio.file.Files.createTempDirectory("graft_fault")
    s"faultfs:$dir/$suffix"
  }

  test("compactSink: injected rename fault mid-swap, then full recovery") {
    import spark.implicits._
    val sink = faultPath("docs")
    val localSink = new java.io.File(new java.net.URI("file:" +
      new org.apache.hadoop.fs.Path(sink).toUri.getPath))
    // seed a multi-file sink through the fault FS
    Seq((1L, "keep one"), (2L, "keep two"), (3L, "keep three"))
      .toDF("doc_id", "text").repartition(3)
      .write.mode("overwrite").parquet(sink)
    val before = spark.read.parquet(sink).as[(Long, String)].collect().toSet
    // arm: the swap's final rename (dst = the sink itself) throws —
    // the process "dies" after delete-old, the corpus's only copy is
    // the sibling temp
    FaultFs.failRenameDst = Some(
      new org.apache.hadoop.fs.Path(sink).toUri.getPath)
    try intercept[java.io.IOException] {
      Streaming.compactSink(spark, sink, targetFiles = 1)
    } finally FaultFs.failRenameDst = None
    // crash window state: no sink, complete temp with commit marker
    assert(!localSink.exists())
    val tmpDir = new java.io.File(localSink.getParent, "docs__tmp")
    assert(tmpDir.exists())
    assert(new java.io.File(tmpDir, "_SUCCESS").exists())
    // the lease must not have survived the crash as a fresh lock that
    // wedges recovery (finally-released even on the injected throw)
    assert(!new java.io.File(localSink.getParent, "docs__lock").exists())
    // recovery: the next maintenance run promotes the orphan and
    // completes the compaction it was asked for
    Streaming.compactSink(spark, sink, targetFiles = 1)
    val after = spark.read.parquet(sink).as[(Long, String)].collect().toSet
    assert(after === before)
    assert(!tmpDir.exists())
    assert(localSink.listFiles().count(_.getName.startsWith("part-")) === 1)
  }

  test("appends refuse a fresh compaction lease and resume when stale") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_lease")
    val sink = root.toString + "/docs"
    val input = MemoryStream[(Long, String)]
    val q = Streaming.appendDedupedStream(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text", sink).start()
    input.addData((1L, "first doc"))
    q.processAllAvailable()
    // a live compaction's lease: the append batch must fail LOUDLY
    // (silently proceeding is how the swap destroys the batch's files)
    val lock = new java.io.File(root.toFile, "docs__lock")
    assert(lock.createNewFile())
    input.addData((2L, "second doc"))
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(c => c +: causes(c.getCause))
    assert(causes(err).exists(c =>
      c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("compaction in flight")))
    // the failed query is dead; a crashed compactor's STALE lock must
    // not wedge the restarted stream forever
    assert(lock.setLastModified(
      System.currentTimeMillis() - 16 * 60 * 1000L))
    val q2 = Streaming.appendDedupedStream(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text", sink).start()
    input.addData((3L, "third doc"))
    q2.processAllAvailable()
    q2.stop()
    val ids = spark.read.parquet(sink).select("doc_id")
      .as[Long].collect().toSet
    assert(ids.contains(1L) && ids.contains(3L))
  }

  test("compactSink: fresh foreign lease rejected, stale lease reclaimed") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_lease2")
    val sink = root.toString + "/docs"
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .repartition(2).write.parquet(sink)
    val lock = new java.io.File(root.toFile, "docs__lock")
    assert(lock.createNewFile())
    intercept[IllegalStateException] {
      Streaming.compactSink(spark, sink, targetFiles = 1)
    }
    // stale (crashed compactor from 16 min ago): reclaim and proceed
    assert(lock.setLastModified(
      System.currentTimeMillis() - 16 * 60 * 1000L))
    Streaming.compactSink(spark, sink, targetFiles = 1)
    assert(!lock.exists()) // released after the run
    assert(spark.read.parquet(sink).count() === 2)
    assert(new java.io.File(sink).listFiles()
      .count(_.getName.startsWith("part-")) === 1)
  }

  test("writeWithManifest: empty input writes an empty manifest, not a crash") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_emptymf")
      .resolve("docs").toString
    val empty = Seq.empty[(Long, String, Long)]
      .toDF("doc_id", "lang", "n_tok")
    graft.sink.Writers.writeWithManifest(
      empty, out, Seq("lang"), Seq("doc_id", "n_tok"))
    val mf = new java.io.File(out, "_manifest.jsonl")
    assert(mf.exists())
    assert(java.nio.file.Files.readString(mf.toPath) === "")
  }
}
