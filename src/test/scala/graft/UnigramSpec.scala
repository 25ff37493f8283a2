package graft

import org.apache.spark.sql.functions._
import graft.functions.UnigramExpressions

/** Unigram-LM tokenizer (t132/t133/t134). The DuckDB twin gates the
  * full EM numerically; this spec pins the kernel's DP contract on
  * hand-computed tables and the trainer's invariants on a tiny
  * hand-built corpus. */
class UnigramSpec extends SparkSpec {

  private def encode(word: String,
                     table: Seq[(String, Long)]): Seq[String] = {
    import spark.implicits._
    Seq(word).toDF("w")
      .select(UnigramExpressions.unigramEncode(col("w"), table).as("p"))
      .head.getSeq[String](0).toSeq
  }

  test("Viterbi DP: the cheapest segmentation wins over greedy") {
    // dp("abab"): a·b·a·b = 400, ab·ab = 300, abab = 250 → whole word
    val t = Seq("a" -> 100L, "b" -> 100L, "ab" -> 150L, "abab" -> 250L)
    assert(encode("abab", t) === Seq("abab"))
    // without the whole-word piece the pair split wins
    assert(encode("abab", t.filterNot(_._1 == "abab")) ===
      Seq("ab", "ab"))
  }

  test("Viterbi tie-break: equal cost goes to the LONGEST piece — " +
    "the rule the DuckDB twin unrolls") {
    // "ab": b+a = 200 == ab = 200 → tie → ab
    val t = Seq("a" -> 100L, "b" -> 100L, "ab" -> 200L)
    assert(encode("ab", t) === Seq("ab"))
  }

  test("reconstruction: pieces concatenate back to the word") {
    val t = Seq("a" -> 5L, "b" -> 7L, "c" -> 11L, "ab" -> 9L,
      "bc" -> 8L, "abc" -> 20L)
    for (w <- Seq("abc", "abcabc", "cba", "aabbcc"))
      assert(encode(w, t).mkString === w)
  }

  test("a character missing from the table fails loudly, not " +
    "silently mis-segments") {
    val t = Seq("a" -> 5L)
    val e = intercept[Exception] { encode("ax", t) }
    assert(e.getMessage.contains("unsegmentable"))
  }

  test("trainer on a hand-built corpus: frequent whole words become " +
    "pieces, singles survive pruning, encode is consistent") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-unigram-spec").toString
    // 40 docs of "abab abab ab", 10 of "cd" — 'abab' dominates
    val docs = ((0 until 40).map(i =>
        (i.toLong, "web", "abab abab ab")) ++
      (40 until 50).map(i => (i.toLong, "web", "cd")))
      .toDF("doc_id", "source", "text")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val table = SparkEntry.queries("t132_unigram_train")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val pieces = table.map(_._1).toSet
    // coverage guarantee: every corpus character survives as a piece
    assert(Set("a", "b", "c", "d").subsetOf(pieces))
    // the dominant word is in the vocabulary and carries count 80
    // (2 occurrences × 40 docs): the EM converged on whole-word
    // segmentation for it
    val abab = table.find(_._1 == "abab")
    assert(abab.isDefined, s"abab missing from ${pieces.toSeq.sorted}")
    assert(abab.get._2 === 80L)
    // encode consistency: every doc's pieces reconstruct its words
    val enc = SparkEntry.queries("t133_unigram_encode")(spark, dir)
      .collect()
    assert(enc.length === 50)
    val first = enc.find(_.getLong(0) < 40).get
    assert(first.getAs[Long]("n_words") === 3L)
    // "abab abab ab" → [abab][abab][ab] = 3 pieces
    assert(first.getAs[Long]("n_pieces") === 3L)
  }

  test("staged artifact: a fresh JVM (memo cleared) reuses the " +
    "on-disk trained table; an in-place corpus rewrite rebuilds it") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-unigram-stage").toString
    ((0 until 30).map(i => (i.toLong, "web", "xyxy xyxy xy")) ++
      (30 until 40).map(i => (i.toLong, "web", "qr")))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val staged = new java.io.File("/tmp/graft_staged/" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_") + "_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8"))
        .take(6).map("%02x".format(_)).mkString + "/unigram_table")
    def run() = SparkEntry.queries("t132_unigram_train")(spark, dir)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // the artifact is ONE file NAMED by the corpus fingerprint
    // (table.<fp>.tsv — identity and content land in one atomic
    // rename, so cross-JVM writers of different snapshots can never
    // pair one snapshot's table with another's identity)
    def stagedTables(): Seq[java.io.File] =
      Option(staged.listFiles()).getOrElse(Array.empty).toSeq
        .filter(f => f.getName.startsWith("table.") &&
          f.getName.endsWith(".tsv"))
    val r1 = run()
    val tsvs1 = stagedTables()
    assert(tsvs1.size === 1, s"expected one staged table: $tsvs1")
    val tsv = tsvs1.head
    val mtime1 = tsv.lastModified()
    // "fresh JVM": only the DISK artifact survives a memo clear —
    // the re-run must parse it back, not re-train (mtime unchanged)
    SparkEntry.resetUnigramMemoForTest()
    Thread.sleep(1100) // fs mtime granularity
    val r2 = run()
    assert(r2.toSeq === r1.toSeq, "staged table drifted on reuse")
    assert(tsv.lastModified() === mtime1,
      "reuse path rewrote the artifact (re-trained?)")
    // in-place corpus rewrite → metadata fingerprint changes → the
    // stale table must NOT be served, from memo or disk: a NEW
    // fingerprint-named artifact appears (the stale one may linger —
    // its name can never match the new snapshot)
    ((0 until 40).map(i => (i.toLong, "web", "mn mn mn")))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.resetUnigramMemoForTest()
    val r3 = run()
    assert(stagedTables().map(_.getName).toSet.size === 2,
      s"corpus rewrite did not stage a new table: ${stagedTables()}")
    assert(r3.exists(_._1 == "mn") && !r3.exists(_._1 == "xyxy"),
      s"rebuilt table still reflects the old corpus: ${r3.map(_._1)}")
  }
}
