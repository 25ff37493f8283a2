package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BloomExpressions.BloomHash

/** The header word is the safety mechanism of the whole bloom gate:
  * it carries k from build to probe, so a probe can never run with a
  * different k than the build (which would break the no-false-negative
  * guarantee t40/decontaminateStream rest on). These tests pin the
  * header contract itself — round-trip, rejection of non-graft input,
  * and that the probe really reads k from the bitmap, not a default. */
class BloomHeaderSpec extends SparkSpec {

  import spark.implicits._

  test("header round-trips k across the representable range") {
    for (k <- Seq(1, 5, 11, 1000, 0xffff))
      assert(BloomHash.headerK(BloomHash.header(k)) === k)
  }

  test("headerK rejects wrong magic / wrong version / garbage") {
    // zero word, arbitrary junk, and a valid header with version+1
    val badVersion =
      BloomHash.header(5) + (1L << 16) // bumps the version field
    for (h <- Seq(0L, 0xdeadbeefL, -1L, badVersion)) {
      val e = intercept[IllegalArgumentException](BloomHash.headerK(h))
      assert(e.getMessage.contains("not a graft bloom bitmap"))
    }
  }

  test("probe reads k from the header: no false negatives at any k") {
    val words = (0 until 300).map(i => s"gram $i")
    val df = words.toDF("g").repartition(3)
    for (k <- Seq(1, 3, 11)) {
      val bloom = df.agg(
        BloomExpressions.bloomFilter($"g", 1 << 12, k).as("bf"))
      val missed = df.crossJoin(bloom)
        .where(!BloomExpressions.bloomMightContain($"bf", $"g"))
        .count()
      assert(missed === 0L, s"false negative at k=$k")
    }
  }

  test("probing a non-graft array<bigint> fails loudly, not silently") {
    val bogus = Seq((Array(0L, 0L, 0L), "x")).toDF("bf", "g")
    val e = intercept[Throwable] {
      bogus.select(
        BloomExpressions.bloomMightContain($"bf", $"g")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("not a graft bloom bitmap"))))
  }

  test("tampered header (k field zeroed by hand) is rejected at probe") {
    val bloom = Seq("a", "b").toDF("g")
      .agg(BloomExpressions.bloomFilter($"g", 1 << 10, 5).as("bf"))
      .select(
        // strip the magic: replace word 0 with 0 — probe must reject
        concat(array(lit(0L)), slice($"bf", 2, 1 << 10)).as("bf"),
        lit("a").as("g"))
    val e = intercept[Throwable] {
      bloom.select(
        BloomExpressions.bloomMightContain($"bf", $"g")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("not a graft bloom bitmap"))))
  }

  test("k above the 16-bit header field is rejected at construction") {
    val e = intercept[IllegalArgumentException] {
      Seq("a").toDF("g")
        .agg(BloomExpressions.bloomFilter($"g", 1 << 10, 0x10000))
        .collect()
    }
    assert(e.getMessage.contains("numHashes"))
  }

  test("merged partials carry the same header as a single-pass build") {
    val words = (0 until 200).map(i => s"w$i")
    def head0(parts: Int): Long = words.toDF("g").repartition(parts)
      .agg(BloomExpressions.bloomFilter($"g", 1 << 10, 7).as("bf"))
      .head().getSeq[Long](0).head
    assert(head0(1) === BloomHash.header(7))
    assert(head0(8) === BloomHash.header(7))
  }
}
