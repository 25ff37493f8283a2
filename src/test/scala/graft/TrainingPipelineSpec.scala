package graft

import org.apache.spark.sql.functions._

import graft.ops._

/** Training-data pipeline operators beyond pairwise dedup: duplicate
  * clustering, decontamination, TF-IDF, sampling, packing. */
class TrainingPipelineSpec extends SparkSpec {

  import spark.implicits._

  test("connected components label chains, triangles and singletons") {
    // components: {1,2,3,4} (a chain), {10,11,12} (a triangle),
    // {20,21} — node 30 appears in no edge (callers coalesce to self)
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (21L, 20L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: long path converges via pointer jumping") {
    // a 33-node path needs 32 plain propagation rounds; path doubling
    // must finish well inside maxIter=20
    val edges = (0L until 32L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got.size === 33 && got.values.forall(_ == 0L))
  }

  test("connected components: strict mode throws when propagation is cut short") {
    // maxIter=1 cannot close a 33-node path; default mode warns and
    // returns split labels, strict mode refuses to hand them back.
    val edges = (0L until 32L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val lax = Dedup.connectedComponents(edges, "id_a", "id_b", maxIter = 1)
      .as[(Long, Long)].collect().toMap
    assert(lax.values.toSet.size > 1) // genuinely split — the hazard is real
    val ex = intercept[IllegalStateException] {
      Dedup.connectedComponents(edges, "id_a", "id_b", maxIter = 1,
        strict = true).count()
    }
    assert(ex.getMessage.contains("not converged"))
  }

  test("connected components of an empty edge list is empty") {
    val edges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(edges, "id_a", "id_b").count() === 0)
  }

  test("cluster assignment keeps transitive duplicates together") {
    // A~B and B~C near-dups (no A~C pair): one cluster of three
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base), (2L, base + " x"), (3L, base + " x y"),
      (50L, "completely different content with no overlap at all here"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextOps.shingleSet(col("text"), 3).as("shingles"))
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "shingles",
      k = 8, bands = 4)
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(cc.getOrElse(1L, 1L) === 1L)
    assert(cc.get(2L).contains(1L) && cc.get(3L).contains(1L))
    assert(!cc.contains(50L)) // singleton: no edge, labels itself downstream
  }

  test("fuzzy decontamination flags exact and near copies, not strangers") {
    val bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (20L, bench),                       // the benchmark doc (id%20==0)
      (1L, bench),                        // exact copy → flagged
      (2L, bench + " extra"),             // near copy → flagged
      (3L, "totally unrelated words that share nothing with the test"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.shingleSet(col("text"), 3).as("sh"))
    val keys = Dedup.lshBandKeys(docs, "doc_id", "sh", k = 8, bands = 4)
    val benchKeys = keys.where(col("doc_id") % 20 === 0)
      .select("band", "bh").distinct()
    val hits = keys.where(col("doc_id") % 20 =!= 0)
      .join(benchKeys, Seq("band", "bh"), "left_semi")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(hits.contains(1L) && hits.contains(2L))
    assert(!hits.contains(3L) && !hits.contains(20L))
  }

  test("incremental ingest drops exact and near dups of the standing corpus") {
    // standing corpus: A (and an unrelated doc); delta: exact copy of
    // A, a near copy of A, a fresh doc
    val corpus = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, "old", corpus),
      (2L, "old", "unrelated standing content nothing shared here at all"),
      (10L, "new", corpus),                       // exact dup → drop
      (11L, "new", corpus + " lambda"),           // near dup → drop
      (12L, "new", "genuinely novel text with fresh tokens only"))
      .toDF("doc_id", "source", "text")
    val delta = docs.where(col("source") === "new")
    val existing = docs.where(col("source") =!= "new")
    val exH = existing.select(md5(col("text")).as("h")).distinct()
      .withColumn("__ex", lit(1L))
    def keys(df: org.apache.spark.sql.DataFrame) = Dedup.lshBandKeys(
      df.select(col("doc_id"), TextOps.shingleSet(col("text"), 3).as("sh")),
      "doc_id", "sh", k = 8, bands = 4)
    val nearIds = keys(delta)
      .join(keys(existing).select("band", "bh").distinct(),
        Seq("band", "bh"), "left_semi")
      .select("doc_id").distinct().withColumn("__near", lit(1L))
    val got = delta.select(col("doc_id"), md5(col("text")).as("h"))
      .join(exH, Seq("h"), "left")
      .join(nearIds, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__ex"), lit(0L)).as("ex"),
        coalesce(col("__near"), lit(0L)).as("near"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got(10L) === ((1L, 1L))) // exact copy is also a near hit
    assert(got(11L)._2 === 1L && got(11L)._1 === 0L)
    assert(got(12L) === ((0L, 0L)))
  }

  test("cluster-family cross-query consistency: copy-flow totals = " +
    "t57's dup counts = t86's dropped docs; containment rows = " +
    "non-canonical members with grams") {
    // four independent queries ride the same staged label artifact —
    // their totals must reconcile exactly, or one of them is reading
    // a different clustering than it claims
    val dir = "/root/testdata/sf0.001"
    val flows = SparkEntry.queries("t109_copy_flow")(spark, dir)
      .collect()
    val nCopies = flows.map(_.getAs[Long]("n_copies")).sum
    val dupTotal = SparkEntry.queries("t57_source_dup_rate")(spark, dir)
      .collect().map(_.getAs[Long]("n_dup")).sum
    assert(nCopies === dupTotal,
      "every non-canonical member is exactly one copy-flow edge")
    val savings = SparkEntry.queries("t86_dedup_savings")(spark, dir)
      .collect()
    val dropped = savings.map(r => (r.getAs[Long]("cluster_size") - 1L) *
      r.getAs[Long]("n_clusters")).sum
    assert(dropped === dupTotal,
      "t86's cluster-size histogram must account for the same drops")
    val contained = SparkEntry.queries("t110_containment")(spark, dir)
      .collect()
    assert(contained.length <= nCopies,
      "containment rows are the members (minus gram-less docs)")
    assert(contained.forall(r =>
      r.getAs[Long]("containment_ppm") >= 0L &&
        r.getAs[Long]("containment_ppm") <= 1000000L))
    // members of REAL near-dup clusters share most grams with their
    // canonical — median containment should sit high, not near zero
    assert(contained.nonEmpty,
      "near-dup members with >= 8 tokens must exist in the testdata")
    val ppms = contained.map(_.getAs[Long]("containment_ppm")).sorted
    assert(ppms(ppms.length / 2) >= 500000L,
      s"median member-vs-canonical containment ${ppms(ppms.length / 2)}")
  }

  test("t115/t116: the distilled student discriminates — agreement " +
    "beats majority voting and both decision classes occur") {
    val dir = "/root/testdata/sf0.001"
    val audit = SparkEntry.queries("t116_distill_audit")(spark, dir)
      .collect()
    val n = audit.map(_.getAs[Long]("n_docs")).sum
    val tp = audit.map(_.getAs[Long]("teacher_pos")).sum
    val sp = audit.map(_.getAs[Long]("student_pos")).sum
    val agreeDocs = audit.map(r =>
      r.getAs[Long]("agree_ppm") * r.getAs[Long]("n_docs")).sum / 1e6
    val base = math.max(tp, n - tp).toDouble / n
    assert(sp > 0L && sp < n,
      "the student must use both decision classes (a bias-only " +
        "majority voter is exactly the failure t116 exists to catch)")
    assert(agreeDocs / n > base,
      f"student agreement ${agreeDocs / n}%.3f must beat the " +
        f"majority base rate $base%.3f")
    // the shipped model is the audited model (one memoized run), and
    // the structural axes must carry learned signal
    val model = SparkEntry.queries("t115_logreg_distill")(spark, dir)
      .collect()
    assert(model.exists(_.getString(0) == "__bias"))
    assert(model.exists(r => r.getString(0).startsWith("_n") &&
      r.getAs[Long]("w_micro") > 0L),
      "the structural features must carry positive learned weight")
  }

  test("t122: DoReMi weights upweight the domain the global LM fits " +
    "worst; a lone domain has zero excess and full weight") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-doremi-spec").toString
    // 'web' and 'news' share one vocabulary and dominate the global
    // unigram LM; 'code' is disjoint, so the global LM prices its
    // tokens far worse than its own LM — DoReMi's excess-loss signal
    // must single it out. 8 docs per source cover all 4 slices.
    val mk = (src: String, words: String) => (0 until 8).map(i =>
      (i.toLong * 3 + (if (src == "web") 0 else if (src == "news") 1
       else 2), src, words))
    val docs = (mk("web", "the cat sat on the mat") ++
      mk("news", "the dog sat on the rug") ++
      mk("code", "fn impl struct enum trait match"))
      .toDF("doc_id", "source", "text")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val w = SparkEntry.queries("t122_doremi_weights")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("excess_micro"), r.getAs[Long]("weight_ppm")))
      .toMap
    assert(w.keySet === Set("web", "news", "code"))
    assert(w("code")._1 > w("web")._1 && w("code")._1 > w("news")._1,
      s"the disjoint-vocabulary domain must carry the max excess: $w")
    assert(w("code")._2 > w("web")._2 && w("code")._2 > w("news")._2,
      s"MWU must upweight the worst-fit domain: $w")
    // each normalized iterate sums to 1e6 (floor-division slack only)
    val tot = w.values.map(_._2).sum
    assert(tot > 999000L && tot <= 1000000L,
      s"averaged iterates must stay a distribution (got $tot ppm)")
    // a lone domain IS the global distribution: excess 0, weight 1e6
    val solo = java.nio.file.Files
      .createTempDirectory("graft-doremi-solo").toString
    docs.where(col("source") === "web").write.mode("overwrite")
      .parquet(s"$solo/documents.parquet")
    val s1 = SparkEntry.queries("t122_doremi_weights")(spark, solo)
      .collect()
    assert(s1.length == 1 && s1(0).getAs[Long]("excess_micro") == 0L
      && s1(0).getAs[Long]("weight_ppm") == 1000000L)
  }

  test("t125 identity: a single-source corpus reports same_ppm = " +
    "expected_ppm = 1e6 exactly") {
    // expected = Σn_s(n_s−1)/(N(N−1)) with one source is exactly 1;
    // the integer two-step division must not lose that identity
    val dir = java.nio.file.Files
      .createTempDirectory("graft-shufaudit-spec").toString
    (0 until 64).map(i => (i.toLong, "only", s"doc $i text"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("t125_shuffle_audit")(spark, dir).head
    assert(r.getAs[Long]("same_ppm") === 1000000L)
    assert(r.getAs[Long]("expected_ppm") === 1000000L)
  }

  test("t130 dominance: the pack order never touches more cells per " +
    "window than the shuffle, and both orders cover the same windows") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("t130_order_coherence")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("cell_windows")))
      .toMap
    val (nwP, cwP) = rows("pack"); val (nwS, cwS) = rows("shuffle")
    assert(nwP === nwS, "same token stream → same window count")
    assert(cwP <= cwS, s"pack must not be LESS coherent: $rows")
    assert(cwP >= nwP, "every window touches at least one cell")
  }

  test("star edges give the same components as clique pairs") {
    // The clustering path (lshStarEdges) must be indistinguishable from
    // the pair path (lshCandidatePairs) after connected components —
    // co-bucket connectivity is what defines a cluster, not the edge
    // representation. Real corpus slice so buckets overlap non-trivially.
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        graft.functions.SketchExpressions
          .wordShingles(TextOps.tokens(col("text")), 3).as("shingles"))
    def labelsOf(edges: org.apache.spark.sql.DataFrame) =
      Dedup.connectedComponents(edges, "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
    val clique = labelsOf(
      Dedup.lshCandidatePairs(docs, "doc_id", "shingles", k = 8, bands = 4))
    val star = labelsOf(
      Dedup.lshStarEdges(docs, "doc_id", "shingles", k = 8, bands = 4))
    assert(star === clique)
    assert(clique.nonEmpty) // the slice must actually exercise collisions
  }

  test("t70 unimax: integer water-filling invariants hold") {
    // the policy's defining properties, independent of the oracle:
    // never exceed a language's cap, spend the budget to within one
    // sub-token remainder per unsaturated language, and saturate
    // exactly a cap-ascending prefix with one common water level after
    val rows = SparkEntry.queries("t70_unimax")(
        spark, "/root/testdata/sf0.001")
      .orderBy("cap", "lang").collect()
    val caps = rows.map(_.getLong(2))
    val allocs = rows.map(_.getLong(3))
    val budget = 2L * rows.map(_.getLong(1)).sum
    assert(allocs.zip(caps).forall { case (a, c) => a <= c && a >= 0 })
    // epochCap=3 > 2 average epochs => the budget is always binding
    val unsat = allocs.zip(caps).count { case (a, c) => a < c }
    assert(unsat >= 1, "budget must bind on this distribution")
    val slack = budget - allocs.sum
    assert(slack >= 0 && slack < unsat,
      s"integer water level leaves <1 token per unsaturated lang, got $slack")
    // prefix structure: saturated langs first, then one shared level
    val k = allocs.zip(caps).indexWhere { case (a, c) => a < c }
    assert(allocs.take(k).zip(caps.take(k)).forall { case (a, c) => a == c })
    assert(allocs.drop(k).distinct.length == 1,
      "all unsaturated languages share the pivot water level")
  }

  test("t72: every near-dup cluster lands whole in one split") {
    // leakage purity — the property t17's doc-hash split lacks; here
    // it holds by construction (split = f(cluster)), this guards the
    // construction against a refactor hashing the doc id again
    val df = SparkEntry.queries("t72_cluster_split")(
      spark, "/root/testdata/sf0.001")
    val perCluster = df.groupBy("cluster_id")
      .agg(countDistinct("split").as("ns"), count(lit(1)).as("n"))
    assert(perCluster.where(col("ns") =!= 1).count() === 0)
    // the slice must actually contain multi-doc clusters, or the
    // purity assertion is vacuous
    assert(perCluster.where(col("n") > 1).count() > 0)
    assert(df.select("split").distinct().count() >= 2)
  }

  /** Sequential reference BPE trainer (Sennrich et al. 2016) — the
    * ground truth the distributed trainer must reproduce exactly. */
  private def refBpe(wordCnt: Map[String, Long],
                     m: Int): Seq[(String, String, Long)] = {
    var words = wordCnt.toSeq.map { case (w, c) =>
      (w.map(_.toString).toVector, c)
    }
    val out =
      scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (out.length < m && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((sym, c) <- words; i <- 0 until sym.length - 1)
        pc((sym(i), sym(i + 1))) =
          pc.getOrElse((sym(i), sym(i + 1)), 0L) + c
      if (pc.isEmpty) done = true
      else {
        val ((a, b), c) = pc.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((a, b, c))
        words = words.map { case (sym, cnt) =>
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < sym.length) {
            if (i < sym.length - 1 && sym(i) == a && sym(i + 1) == b) {
              buf += (a + b); i += 2
            } else { buf += sym(i); i += 1 }
          }
          (buf.result(), cnt)
        }
      }
    }
    out.toSeq
  }

  test("t71 bpe train matches the sequential reference, classic corpus") {
    val corpus =
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val got = TextOps.bpeTrainMerges(
      corpus.toSeq.toDF("w", "cnt"), "w", "cnt", 8)
    assert(got === refBpe(corpus, 8))
    // the famous first merge on this distribution: (e,s) and (s,t)
    // tie at 9; lexicographic tie-break picks (e,s)
    assert(got.head === (("e", "s", 9L)))
  }

  test("t73 bpe encode matches the sequential reference per document") {
    val toks = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), TextOps.tokensLower(col("text")).as("tl"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, tl) => (id, tl.filter(_.nonEmpty)) }
    val wc = toks.flatMap(_._2).groupBy(identity)
      .map { case (w, g) => w -> g.length.toLong }
    val merges = refBpe(wc, 8)
    def encLen(w: String): Long = {
      var sym = w.map(_.toString).toVector
      for ((a, b, _) <- merges) {
        val buf = Vector.newBuilder[String]
        var i = 0
        while (i < sym.length) {
          if (i < sym.length - 1 && sym(i) == a && sym(i + 1) == b) {
            buf += (a + b); i += 2
          } else { buf += sym(i); i += 1 }
        }
        sym = buf.result()
      }
      sym.length.toLong
    }
    val want = toks.filter(_._2.nonEmpty).map { case (id, tl) =>
      val nb = tl.map(encLen).sum
      (id, tl.length.toLong, nb, nb * 10000L / tl.length)
    }.toSet
    val got = SparkEntry.queries("t73_bpe_encode")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("t71 bpe train matches the reference on a real corpus slice") {
    val words = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(TextOps.tokensLower(col("text"))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val wc = words.as[(String, Long)].collect().toMap
    assert(TextOps.bpeTrainMerges(words, "w", "cnt", 6) === refBpe(wc, 6))
  }
}
