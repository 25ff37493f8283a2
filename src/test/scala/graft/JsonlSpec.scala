package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.ingest.Jsonl

/** The JSONL source/sink (`ingest/Jsonl`): gzip file round-trip,
  * the corrupt-line quarantine accounting identity, column pruning
  * into the parse, and the in-memory parseLines twin. */
class JsonlSpec extends SparkSpec {

  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-jsonl").toString

  test("write → read round-trips every field through .jsonl.gz, " +
    "unicode and JSON metacharacters included") {
    val docs = Seq(
      (1L, "plain ascii text", "en"),
      (2L, "quotes \" and \\ backslashes\nand a newline", "en"),
      (3L, "unicode: café 日本語 😀", "ja"),
      (4L, "{\"looks\":\"like json\"}", "en"))
      .toDF("doc_id", "text", "lang")
    val dir = tmp() + "/corpus"
    Jsonl.write(docs, Seq("doc_id", "text", "lang"), dir)
    // the sink really wrote gzip shards
    assert(new java.io.File(dir).listFiles()
      .exists(_.getName.endsWith(".gz")), "sink must write .gz shards")
    val (clean, corrupt) = Jsonl.readCounted(spark, dir, docSchema)
    assert(corrupt.count() === 0)
    val got = clean.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got === docs.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq)
  }

  test("writeZst → read round-trips through .jsonl.zst (zstd-jni " +
    "codec, both the native reader and the counted reader)") {
    val docs = Seq(
      (1L, "plain ascii text", "en"),
      (2L, "quotes \" and \\ backslashes\nand a newline", "en"),
      (3L, "unicode: café 日本語 😀", "ja"))
      .toDF("doc_id", "text", "lang")
    val dir = tmp() + "/corpus_zst"
    Jsonl.writeZst(docs, Seq("doc_id", "text", "lang"), dir)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".zst"))
    assert(shards.nonEmpty, "sink must write .zst shards")
    // the bytes on disk are REAL zstd frames (magic 0xFD2FB528 LE),
    // not a renamed plain file
    val head = java.nio.file.Files.readAllBytes(
      shards.head.toPath).take(4)
    assert(head.map(_ & 0xff).toSeq === Seq(0x28, 0xb5, 0x2f, 0xfd),
      "missing zstd frame magic")
    def roundTrip(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val want = roundTrip(docs)
    val (clean, corrupt) = Jsonl.readCounted(spark, dir, docSchema)
    assert(corrupt.count() === 0)
    assert(roundTrip(clean) === want)
    // the native json reader path resolves the codec too
    assert(roundTrip(Jsonl.read(spark, dir, docSchema)
      .where(col(Jsonl.CorruptCol).isNull)
      .select("doc_id", "text", "lang")) === want)
  }

  test("corrupt lines quarantine raw — clean + corrupt = input lines") {
    val dir = tmp() + "/mixed"
    val lines = Seq(
      """{"doc_id":1,"text":"ok","lang":"en"}""",
      """{"doc_id":2,"text":"trunc""", // killed-writer tail
      """total garbage, not json""",
      """{"doc_id":3,"text":"also ok","lang":"de"}""",
      """{}""") // valid JSON, fields missing -> nulls, NOT corrupt
    lines.toDF("value").repartition(1).write.text(dir)
    val (clean, corrupt) = Jsonl.readCounted(spark, dir, docSchema)
    assert(clean.count() + corrupt.count() === lines.length,
      "every input line must land in exactly one frame")
    assert(corrupt.count() === 2)
    val raw = corrupt.collect().map(_.getString(0)).toSet
    assert(raw.contains("total garbage, not json"),
      "quarantine must carry the raw offending line")
    // the all-missing-fields row is PERMISSIVE nulls, not corruption
    assert(clean.where(col("doc_id").isNull).count() === 1)
  }

  test("column pruning reaches the JSON parse") {
    val dir = tmp() + "/prune"
    Jsonl.write(Seq((1L, "t", "en")).toDF("doc_id", "text", "lang"),
      Seq("doc_id", "text", "lang"), dir)
    val p = Jsonl.read(spark, dir, docSchema).select("doc_id")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("ReadSchema: struct<doc_id:bigint") &&
      !p.contains("text:string"),
      s"unprojected fields must not reach the parser:\n$p")
  }

  test("parseLines matches the file reader's contract in memory") {
    val lines = Seq(
      """{"doc_id":7,"text":"x","lang":"en"}""",
      """nope""").toDF("line")
    val parsed = Jsonl.parseLines(lines, "line", docSchema)
    val rows = parsed.orderBy(col("doc_id").asc_nulls_last).collect()
    assert(rows.length === 2)
    assert(rows(0).getLong(0) === 7L &&
      rows(0).isNullAt(rows(0).fieldIndex(Jsonl.CorruptCol)))
    assert(rows(1).isNullAt(0) &&
      rows(1).getString(rows(1).fieldIndex(Jsonl.CorruptCol)) === "nope")
  }

  test("parseLines runs on a stream with the same quarantine contract") {
    implicit val sc = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val q = Jsonl.parseLines(input.toDS().toDF("line"), "line",
        docSchema)
      .writeStream.format("memory").queryName("jsonlstream")
      .outputMode("append").start()
    input.addData("""{"doc_id":1,"text":"a","lang":"en"}""", "garbage")
    q.processAllAvailable()
    input.addData("""{"doc_id":2,"text":"b","lang":"de"}""")
    q.processAllAvailable(); q.stop()
    val rows = spark.table("jsonlstream")
    assert(rows.count() === 3, "a row per input line, stream included")
    assert(rows.where(col(Jsonl.CorruptCol).isNotNull).count() === 1)
    assert(rows.where(col("doc_id").isin(1L, 2L)).count() === 2)
  }

  test("a NULL input line quarantines instead of passing as a clean " +
    "all-null row") {
    // from_json(null) is a null struct — without the guard it would
    // explode to all-null fields with a null _corrupt and silently
    // break the clean + corrupt = input-lines identity
    val lines = Seq(Some("""{"doc_id":7,"text":"x","lang":"en"}"""),
      None).toDF("line")
    val parsed = Jsonl.parseLines(lines, "line", docSchema)
    assert(parsed.count() === 2)
    val bad = parsed.where(col(Jsonl.CorruptCol).isNotNull).collect()
    assert(bad.length === 1 &&
      bad(0).getAs[String](Jsonl.CorruptCol) === "<null input line>")
    assert(parsed.where(col(Jsonl.CorruptCol).isNull)
      .select("doc_id").head.getLong(0) === 7L)
  }

  test("a schema declaring _corrupt is rejected loudly") {
    intercept[IllegalArgumentException] {
      Jsonl.read(spark, "/nonexistent", StructType(Seq(
        StructField("_corrupt", StringType))))
    }
  }
}
