package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** `Graph.pageRankPpm` vs a sequential reference implementation of the
  * same integer-ppm recurrence (the BPE-spec pattern: the distributed
  * plan must be bit-identical to straight-line Scala), plus the mass
  * and guard invariants. */
class GraphSpec extends SparkSpec {

  /** Sequential twin: same ppb edge quantization, same floor
    * divisions, same dangling redistribution — positives only, so
    * Scala `/` (truncation) matches Spark `div` and DuckDB `//`. */
  private def refPageRank(edges: Seq[(String, String, Long)],
                          iters: Int): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toLong
    val ow = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = nodes.map(_ -> 1000000L / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(ow.contains).map(r).sum
      r = nodes.map { v =>
        // per EDGE OCCURRENCE, like the operator: a duplicated
        // (src,dst) row quantizes and contributes independently — a
        // keyed map would collapse duplicates and diverge
        val in = edges.collect { case (s, d, w) if d == v =>
          (85L * r(s) * ((1000000000L * w) / ow(s))) / 100000000000L }.sum
        v -> ((1000000L * 15) / (100L * n) + (85L * dang) / (100L * n) + in)
      }.toMap
    }
    r
  }

  // cycle + weighted fan-out + a dangling sink: every code path (in-
  // contributions, dangling redistribution, base term) is exercised
  private val g = Seq(
    ("a", "b", 3L), ("a", "d", 1L), ("b", "c", 2L),
    ("c", "a", 1L), ("c", "b", 1L))

  private def run(edges: Seq[(String, String, Long)],
                  iters: Int): Map[String, Long] = {
    import spark.implicits._
    Graph.pageRankPpm(edges.toDF("s", "d", "w"), "s", "d", "w", iters)
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
  }

  test("pageRankPpm matches the sequential reference bit-for-bit") {
    for (iters <- Seq(0, 1, 3))
      assert(run(g, iters) === refPageRank(g, iters))
    // duplicate (src,dst) rows are independent edges on both sides
    val gDup = g ++ Seq(("a", "b", 2L))
    assert(run(gDup, 3) === refPageRank(gDup, 3))
  }

  test("rank mass stays within [90%, 100%] of one (floors only lose)") {
    val total = run(g, 3).values.sum
    assert(total <= 1000000L && total >= 900000L)
  }

  test("pageRankPpm ≡ reference on random graphs (cycles, dangling, dups)") {
    // deterministic scalacheck-style sweep (the PropertySpec pattern):
    // random multigraphs hit shapes the fixed graph cannot — isolated
    // cycles, multiple dangling sinks, duplicate edges, self-loop-free
    // but otherwise arbitrary topology
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val nodeG = Gen.choose(0, 7).map(i => s"n$i")
    val edgeG = for {
      s <- nodeG; d <- nodeG.suchThat(_ != s)
      w <- Gen.choose(1L, 5L)
    } yield (s, d, w)
    val graphG = Gen.choose(1, 15).flatMap(Gen.listOfN(_, edgeG))
    (0 until 12).foreach { i =>
      graphG.apply(Gen.Parameters.default, Seed(1000L + i)).foreach { es =>
        assert(run(es, 3) === refPageRank(es, 3), s"seed ${1000 + i}: $es")
        val total = run(es, 3).values.sum
        assert(total <= 1000000L, s"mass created on seed ${1000 + i}")
      }
    }
  }

  test("empty edge list yields an empty ranking, not a div-by-zero") {
    assert(run(Seq.empty, 3).isEmpty)
  }

  test("per-edge weight beyond the ppb-normalization domain fails loud") {
    val e = intercept[Exception] {
      run(Seq(("a", "b", 10000000000L)), 1)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("pageRankPpm")))
  }

  test("a NULL weight fails loud instead of silently vanishing from " +
    "the distribution") {
    // min/max skip nulls, so before the count conjunct a bad cast
    // passed the guard while its edge dropped out of __ow — the edge
    // gone, its endpoints still counted toward n, ranks silently off
    import spark.implicits._
    val e = intercept[Exception] {
      Graph.pageRankPpm(
        Seq(("a", "b", Some(3L)), ("a", "c", None))
          .toDF("s", "d", "w"), "s", "d", "w", 1)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("non-null")),
      s"null weight must be rejected, got: ${msgs(e).mkString("; ")}")
  }
}
