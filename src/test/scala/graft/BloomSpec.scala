package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{BloomExpressions, SketchExpressions}

/** Bloom prefilter contract (t40's correctness argument): NO false
  * negatives ever — membership of every inserted key must test true —
  * and the bitmap must be invariant to how the build rows were
  * partitioned (update/merge/serialize all hit the same result).
  * Plus the charEntropy golden values the quality signal relies on. */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  private def forAll[T](g: Gen[T], n: Int = 8)(body: T => Unit): Unit = {
    val params = Gen.Parameters.default
    (0 until n).foreach(i => g.apply(params, Seed(1234L + i)).foreach(body))
  }

  private val wordsGen: Gen[List[String]] =
    Gen.listOfN(200, Gen.choose(5, 20).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)))

  test("no false negatives: every inserted key tests positive") {
    forAll(wordsGen) { words =>
      val df = words.toDF("g").repartition(5)
      val bloom = df.agg(
        BloomExpressions.bloomFilter($"g", 1 << 12, 5).as("bf"))
      val missed = df.crossJoin(bloom)
        .where(!BloomExpressions.bloomMightContain($"bf", $"g"))
        .count()
      assert(missed === 0L)
    }
  }

  test("bitmap is partitioning-invariant (merge ≡ single update pass)") {
    val words = (0 until 500).map(i => s"shingle token $i")
    def bitmap(parts: Int): Seq[Long] = words.toDF("g").repartition(parts)
      .agg(BloomExpressions.bloomFilter($"g", 1 << 12, 5).as("bf"))
      .head().getSeq[Long](0)
    assert(bitmap(1) === bitmap(7))
  }

  test("false-positive rate stays sane at m/n ≈ 8 bits per key") {
    val n = 512
    val inserted = (0 until n).map(i => s"in $i").toDF("g")
    val probes = (0 until n).map(i => s"out $i").toDF("p")
    val bloom = inserted.agg(
      BloomExpressions.bloomFilter($"g", 4096, 5).as("bf"))
    val fp = probes.crossJoin(bloom)
      .where(BloomExpressions.bloomMightContain($"bf", $"p"))
      .count()
    // theoretical FP at m/n=8, k=5 is ~2.2%; allow wide slack
    assert(fp.toDouble / n < 0.10, s"fp rate ${fp.toDouble / n}")
  }

  test("non-string inputs fail at analysis time, not runtime") {
    val ints = (1 to 5).toDF("x")
    intercept[AnalysisException] {
      ints.agg(BloomExpressions.bloomFilter($"x", 1024, 3)).collect()
    }
    val bloom = ints.select(lit("a").as("g"))
      .agg(BloomExpressions.bloomFilter($"g", 1024, 3).as("bf"))
    intercept[AnalysisException] {
      ints.crossJoin(bloom)
        .select(BloomExpressions.bloomMightContain($"bf", $"x"))
        .collect()
    }
  }

  test("charEntropy goldens: single-char, alternating, uniform, empty") {
    val df = Seq(
      (0, "aaaa"),       // one symbol → 0 bits
      (1, "abab"),       // two equiprobable symbols → 1 bit
      (2, "abcd"),       // four equiprobable symbols → 2 bits
      (3, "aab"),        // H = log2(3) - (2·log2 2)/3
      (4, ""),           // empty → 0 by convention
      (5, "😀😀😀😀"),   // one CODEPOINT (non-BMP) → 0 bits, not 1
      (6, "😀a😀a")      // two equiprobable codepoints → 1 bit
    ).toDF("id", "text")
    val got = df.select($"id",
        round(SketchExpressions.charEntropy($"text"), 6).as("h"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got(0) === 0.0)
    assert(got(1) === 1.0)
    assert(got(2) === 2.0)
    assert(got(3) === math.rint((math.log(3) / math.log(2) - 2.0 / 3) * 1e6) / 1e6)
    assert(got(4) === 0.0)
    assert(got(5) === 0.0)
    assert(got(6) === 1.0)
  }
}
