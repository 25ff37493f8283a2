package graft

import org.apache.spark.sql.functions._

import graft.ops._

/** Golden tests for the span machinery behind t44/t45: window
  * extraction positions and gaps-and-islands merging. */
class SpansSpec extends SparkSpec {

  import spark.implicits._

  test("tokenWindows: positions are 1-based, short docs yield empty") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(Spans.tokenWindows(TextOps.tokens(col("text")), 3).as("w"))
    val got = df.as[Seq[(Long, String)]].collect()
    assert(got(0) === Seq((1L, "a b c"), (2L, "b c d")))
    assert(got(1) === Seq.empty)
  }

  test("windowHashes kernel ≡ declarative tokenWindows + md5 prefix") {
    // the t44/t45 hot path must be indistinguishable from the
    // declarative reference (and hence from the DuckDB oracle)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val kernel = docs.select(col("doc_id"),
      explode(graft.functions.SketchExpressions.windowHashes(col("toks"), 8))
        .as("w"))
      .select(col("doc_id"), col("w.pos").as("pos"), col("w.gh").as("gh"))
    val ref = docs.select(col("doc_id"),
      explode(Spans.tokenWindows(col("toks"), 8)).as("w"))
      .select(col("doc_id"), col("w.pos").as("pos"),
        substring(md5(col("w.gram")), 1, 16).as("gh"))
    assert(kernel.count() > 0)
    assert(kernel.exceptAll(ref).isEmpty && ref.exceptAll(kernel).isEmpty)
  }

  test("mergeSpans: overlapping and adjacent windows merge, gaps split") {
    // width 3: [1,3] + [2,4] overlap → one span; [6,8] touches [9,11]
    // (pos 9 = end 8 + 1) → merged; [20,22] is isolated.
    val hits = Seq((7L, 1L), (7L, 2L), (7L, 6L), (7L, 9L), (7L, 20L),
      (8L, 5L)).toDF("doc_id", "pos")
    val got = Spans.mergeSpans(hits, "doc_id", "pos", 3)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect()
    assert(got === Seq(
      (7L, 1L, 4L, 2L),   // windows at 1,2
      (7L, 6L, 11L, 2L),  // windows at 6,9 (adjacent coverage)
      (7L, 20L, 22L, 1L),
      (8L, 5L, 7L, 1L)))
  }

  test("span redaction removes exactly the covered tokens") {
    // doc 7: spans [2,4] and [8,9] → keep tokens 1,5,6,7,10
    // doc 9: no spans → identity
    val docs = Seq((7L, "a b c d e f g h i j"), (9L, "x y z"))
      .toDF("doc_id", "text")
    val spans = Seq((7L, 2L, 4L), (7L, 8L, 9L)).toDF("doc_id", "s", "e")
      .groupBy("doc_id")
      .agg(collect_list(struct(col("s"), col("e"))).as("spans"))
    val got = docs.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"),
        coalesce(col("spans"),
          array().cast("array<struct<s:bigint,e:bigint>>")).as("sp"))
      .select(col("doc_id"),
        concat_ws(" ", filter(col("toks"), (t, i) =>
          !exists(col("sp"),
            sp => (i + 1) >= sp("s") && (i + 1) <= sp("e")))).as("kept"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(7L -> "a e f g j", 9L -> "x y z"))
  }

  test("duplicated spans: planted cross-doc copy is located exactly") {
    // docs 1 and 2 share tokens 4..11 of doc 1 (an 8-token run placed
    // at position 3 in doc 2); every other token is unique per doc.
    val shared = (1 to 8).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 u3 $shared u4 u5"),
      (2L, s"v1 v2 $shared v3 v4 v5"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")).toDF("doc_id", "text")
    val n = 8
    val grams = docs.select(col("doc_id"),
      explode(Spans.tokenWindows(TextOps.tokens(col("text")), n)).as("w"))
      .select(col("doc_id"), col("w.pos").as("pos"), col("w.gram").as("gram"))
    val dup = grams.groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("nd")).where(col("nd") >= 2)
    val spans = Spans.mergeSpans(
      grams.join(dup.select("gram"), Seq("gram")).select("doc_id", "pos"),
      "doc_id", "pos", n).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    // the only shared 8-gram is the planted run: doc 1 tokens 4-11,
    // doc 2 tokens 3-10; doc 3 has no duplicate
    assert(spans === Seq((1L, 4L, 11L, 1L), (2L, 3L, 10L, 1L)))
  }

  test("decontamSpans: a NULL isEval verdict lands on the corpus " +
    "side, not nowhere") {
    // where(!null) and where(null) both drop the row — a
    // contaminated null-source doc would silently evade
    // decontamination entirely
    val passage = (1 to 8).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$passage tail", "eval"),
      (2L, s"head $passage", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "source")
    val spans = Spans.decontamSpans(docs, "doc_id", "text", 8,
      col("source") === "eval").collect()
    assert(spans.map(_.getLong(0)).toSeq === Seq(2L),
      "the null-source doc's contamination must be found")
  }
}
