package graft

/** Plan-shape regression tests: the scale properties the operator
  * comments claim (pushdown into the scan, broadcast of small sides,
  * shuffle-free map-side kernels, partial aggregation) locked in as
  * assertions on the optimized plan — so a refactor that silently
  * turns a broadcast into a sort-merge join or un-pushes a filter
  * fails CI, not the 100 TB run. */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)

  test("q22: the time slice pushes into the parquet scan as raw int64") {
    val p = plan("q22_timeslice")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(ts") && p.contains("LessThan(ts"),
      "time-range predicate must reach the scan (row-group pruning)")
  }

  test("t46/t41: map-side kernels plan with zero shuffles") {
    Seq("t46_gopher_rules", "t41_char_entropy").foreach { q =>
      assert(!plan(q).contains("Exchange"),
        s"$q claims pure map-side execution but plans a shuffle")
    }
  }

  test("t45: the eval gram set joins as a broadcast, never a shuffle join") {
    assert(plan("t45_decontam_spans").contains("BroadcastExchange"))
  }

  test("t44: span windows stay partitioned by document") {
    // a lost partitionBy would plan a SinglePartition exchange and
    // serialize the whole corpus through one task
    assert(!plan("t44_dup_spans").contains("SinglePartition"))
  }

  // FormattedMode prints every operator twice (tree + "(n) Op"
  // details) — count the numbered detail form so each NODE counts once
  private def nodes(p: String, op: String): Int =
    s"""\\(\\d+\\) $op""".r.findAllIn(p).length

  test("t48: covariance is one partial-agg pass, not a per-cell shuffle") {
    val p = plan("t48_embed_covariance")
    assert(nodes(p, "Exchange") <= 1,
      "expected only the partial->final agg exchange")
    // the d×d explode must sit ABOVE the aggregate (driver-sized
    // input), not below it (corpus × d² expansion): FormattedMode
    // numbers nodes leaf-first, so a parent's id is LARGER
    val genId = "\\((\\d+)\\) Generate".r
      .findFirstMatchIn(p).map(_.group(1).toInt)
    val aggIds = "\\((\\d+)\\) ObjectHashAggregate".r
      .findAllMatchIn(p).map(_.group(1).toInt).toSeq
    assert(genId.nonEmpty && aggIds.nonEmpty)
    assert(genId.get > aggIds.max,
      s"Generate (node ${genId.get}) must be above the aggregate " +
        s"(nodes $aggIds) — explode after agg, not before")
  }

  test("d4: per-group top-k plans as WindowGroupLimit, not full sort") {
    // the map-side group-limit is what keeps the shuffle samples-sized
    assert(plan("d4_hash_sample").contains("WindowGroupLimit"))
  }

  test("decontamination joins broadcast the eval side (t13/t40/q11)") {
    Seq("t13_decontaminate", "t40_bloom_decontam", "q11_join_broadcast")
      .foreach { q =>
        assert(plan(q).contains("BroadcastExchange"),
          s"$q claims a broadcast join")
      }
  }

  test("q1: aggregation combines map-side before the shuffle") {
    val p = plan("q1_agg")
    assert(nodes(p, "HashAggregate") >= 2,
      "partial aggregation missing — every row would shuffle")
  }

  test("t51: eval exposure filters via a broadcast SEMI join before distinct") {
    // the corpus is filtered down to eval-hitting rows by a broadcast
    // semi-join FIRST; losing either property re-shuffles the corpus
    val p = plan("t51_eval_exposure")
    assert(p.contains("BroadcastHashJoin LeftSemi"),
      "eval-hash gate must be a broadcast left-semi join")
    assert(!p.contains("SortMergeJoin"),
      "a sort-merge join here shuffles the full corpus on gram hashes")
  }

  test("t44: dup spans bound to gram-keyed exchanges, window stays per-doc") {
    // the ExactSubstr shape: two gram-hash-keyed shuffles (dup-gram
    // detection + doc re-association) plus the per-document window
    // merge — anything beyond that is a regression toward a self-join
    val p = plan("t44_dup_spans")
    assert(nodes(p, "Exchange") <= 3,
      "t44 should plan at most 3 shuffles (2 gram-keyed + window)")
    assert(!p.contains("SortMergeJoin"))
  }

  test("t53: bigram LM aggregates partially and broadcasts the unigram side") {
    val p = plan("t53_bigram_logprob")
    assert(nodes(p, "HashAggregate") >= 4,
      "bigram/unigram counts must combine map-side (partial agg pairs)")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      "count-table joins must broadcast, not shuffle the corpus")
  }

  test("t52b: KMV sketch tier partial-aggs + broadcast pair join; " +
    "the folded exact-compare tier stays source²-keyed") {
    // the production artifact — per-source KMV sketches — must keep
    // its shape: mergeable partials (ObjectHashAggregate pair) and a
    // broadcast NLJ pair join over the sources-sized sketch table.
    // Since the ε fold, the query ALSO carries the exact matrix as
    // its verification harness (same cost class as t52 — gram-keyed
    // shuffles), so the old ≤2-exchange bound no longer applies; what
    // must NOT appear is an unbroadcast cartesian or a corpus-row
    // window
    val p = plan("t52b_source_overlap_est")
    assert(nodes(p, "ObjectHashAggregate") >= 2,
      "KMV aggregate must combine map-side (partial pair)")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the pair join must broadcast the tiny sketch side")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      s"t52b must stay agg/join-shaped, sources²-bounded:\n$p")
  }

  test("t59: DSIR weights — partial vocab aggs, scalar LM stats broadcast") {
    val p = plan("t59_dsir_weight")
    assert(nodes(p, "HashAggregate") >= 4,
      "vocab counts must combine map-side (partial agg pairs)")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "the (totS, totT, V) scalars must ride a broadcast")
    // expected exchanges: vS/vT vocab agg pairs, the 1-row scalar
    // aggs for (totS, totT, V), and the final doc_id agg — ~6. The
    // vocab JOINS must not add more: at this SF both sides broadcast
    // (the exploded token stream itself never shuffles on term)
    assert(nodes(p, "Exchange") <= 7,
      s"t59 plans too many shuffles:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "the token stream must not sort-merge-join the vocab sides")
  }

  test("t61: snapshot KL aggregates partially; joins stay vocab-sized") {
    val p = plan("t61_snapshot_kl")
    assert(nodes(p, "HashAggregate") >= 4,
      "(source, term) counts must combine map-side")
    // both snapshot aggs partition by (source, term) and the union-
    // vocab full-outer join reuses that partitioning; the scalar join
    // is vocab-keyed too — nothing should re-shuffle the token stream
    assert(nodes(p, "Exchange") <= 5,
      s"t61 plans too many shuffles:\n$p")
  }

  test("t63: the funnel is single-pass — scans bounded, hits broadcast") {
    // the rewrite's contract: cumulative stage flags over ONE corpus
    // lineage + the gram pass + the eval-gram side = at most 3 scans
    // of documents; the staged 5-agg shape regresses to 8+. The hit
    // set must join as a broadcast, never a corpus shuffle.
    val p = plan("t63_pipeline_funnel")
    assert(nodes(p, "Scan parquet") <= 3,
      s"t63 re-scans documents per stage:\n$p")
    assert(p.contains("BroadcastExchange"))
  }

  test("t49: incremental ingest gates the delta with semi-join shapes") {
    // the delta shuffles only its own keys: exact-hash and LSH-band
    // membership against the standing corpus are (broadcast) semi
    // joins — never a full-corpus re-cluster or a shuffled join
    val p = plan("t49_incremental_ingest")
    assert(p.contains("LeftSemi"),
      "corpus-membership checks must be semi-joins")
    assert(!p.contains("SortMergeJoin"),
      "a sort-merge join means the standing corpus re-shuffles per delta")
  }

  test("t66: the bounded blocklist broadcasts; the hit-set anti-join " +
    "is unhinted (AQE size-gates the corpus-proportional side)") {
    // the blocklist is list-bounded and must broadcast; the hit set is
    // blocked-docs-sized — corpus-proportional on a real crawl — so it
    // must NOT carry a forced hint (the fleet-wide hint audit pins
    // that); statistics still pick a broadcast at this SF, which is
    // the point: size-gated, not forced
    val p = plan("t66_url_blocklist")
    assert(nodes(p, "BroadcastExchange") >= 1,
      s"t66 blocklist should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("t67: train shuffle is one shard-partitioned window, no global sort") {
    val p = plan("t67_train_shuffle")
    assert(nodes(p, "Exchange") == 1,
      s"t67 should plan exactly one shard-keyed exchange:\n$p")
    assert(!p.contains("SinglePartition"),
      "a SinglePartition window means the corpus sorts on one reducer")
  }

  // Fleet-wide forced-broadcast audit: every broadcast() hint in the
  // engine must sit on a side whose cardinality is BOUNDED by
  // something other than the corpus — a hint on a data-dependent side
  // (hit sets, df>1 line hashes, host-cardinality artifacts) either
  // OOMs or hits Spark's broadcast ceiling at 100 TB, which sf0.1
  // runs can never reveal. The expected counts below pin the exact
  // number of ResolvedHint nodes per analyzed query plan; a query
  // absent from the map must carry ZERO hints. Adding a hint anywhere
  // fails this test until the new site is justified here under one of
  // the bounded-side categories:
  //   [scalar]   1-row totals/stats riding crossJoin(broadcast(...))
  //   [model]    fixed-size models/codebooks/centroids/step tables
  //              (256 hash buckets, PQ codebooks, 16 seeds, ~100-row
  //              schedule frames)
  //   [probe]    query-bounded probe/eval sets (eval grams, probe
  //              vectors, eval-hash sets — sized by the eval suite,
  //              not the corpus)
  //   [dim]      list-bounded dimension tables (nation/part dims,
  //              the UT1-style blocklist, robots rule tables)
  //   [bucket]   twoLevelRank/PrefixSum bucket tables (≤ #buckets by
  //              construction) where the caller opts in
  //   [vocab]    vocabulary-bounded LM/stat tables (top-k cutoffs,
  //              unigram/char tables — O(vocab), not O(corpus))
  // Corpus-proportional sides deliberately carry NO hint and resolve
  // by statistics/AQE: t80's boilerplate set (bloom-prefiltered),
  // t66/t87 blocklist-hit doc sets, t63 contamination hits, t94/t77
  // host-rank artifacts.
  private val expectedHints: Map[String, Int] = Map(
    "q11_join_broadcast" -> 1, // [dim] part dim
    "q12_join_multi" -> 1, // [dim] nation dim
    "q18_calibration" -> 1, // [dim] calibration lookup + mean fallback
    "q32_scalar_subquery" -> 1, // [scalar] avg-price 1-row
    "q36_ivf_assign" -> 1, // [model] 16 seed centroids
    "q39_kmeans_step" -> 1, // [model] 16 seed centroids
    "q40_window_ranks" -> 7, // [bucket]+[scalar] two-level rank tables
    "t100_neg_sampling" -> 1, // [vocab] vocab bucket offsets
    "t102_batch_schedule" -> 1, // [scalar]+[model] total + step frame
    "t103_dpo_pairs" -> 4, // [bucket] two-level rank tables
    "t104_kn_doc_ppl" -> 3, // [vocab] midCtx/uni/total LM sides
    "t105_data_card" -> 1, // [model] source-cardinality top-1 langs
    // t107: the scored table is localCheckpointed (r20 — map-side dot
    // scoring left no exchange for the two twoLevelRank consumers to
    // share), hiding the [model] hint; 2 visible = [bucket] rank
    // offsets + [scalar] doc total
    "t107_calibration_bins" -> 2,
    "t113_epoch_alloc" -> 1, // [scalar] budget totals
    "t114_compression_gate" -> 3, // [model] O(sources) median/MAD stats
    "t116_distill_audit" -> 1, // [model] 256-weight student model
    "t119_curriculum_order" -> 3, // [scalar]+[bucket] tot + unlock + tlr
    "t117_gate_mix_shift" -> 3, // [model]+[scalar] student + totals
    // t122_doremi_weights: 0 visible — its two hints ([scalar] corpus
    // total + [model] O(sources) totals) sit in the cell-table plan it
    // EXECUTES internally (the MWU driver loop collects the bounded
    // source×slice table, q39/t115 precedent), so the returned local
    // frame carries no lineage for this walk to audit
    "t125_shuffle_audit" -> 1, // [scalar] 1-row corpus-composition totals
    // [scalar] sources×3 per-group gram totals joined back to route
    // each group to its exact/KMV tier (r14 size-tier fold)
    "t126_ngram_diversity" -> 1,
    "t127_gate_agreement" -> 1, // [model] t81's 256-bucket classifier
    "t128_gate_cube" -> 1, // [model] same shared gateFlags classifier
    // t129: the ranked subtree is localCheckpointed (r13 judge nit #1
    // — it fed both sides of the offset join), so its centroid/band
    // hints carry no lineage for this walk; the 1 visible hint is
    // [bucket] the O(cells) offset table joined back
    "t129_pack_order" -> 1,
    // t130: the shared packDistances⋈ntok base is localCheckpointed
    // (same nit), so only the two prefix-sum [bucket] band tables —
    // value-range-bounded by construction — remain visible
    "t130_order_coherence" -> 2,
    // t135: the release chain's two 1-row [scalar] broadcasts (the
    // self-calibrated classifier median; the corpus token total for
    // the budget cut) are visible because the card aggregates the
    // chain's UNCHECKPOINTED gate frame; t131 checkpoints past them
    "t135_release_card" -> 2,
    // t137b: three nProbe variants × two 1-row [scalar] mined-set
    // count broadcasts (the [model] centroid-array broadcasts sit
    // behind the candidate checkpoint and carry no hint lineage —
    // t137 itself audits at zero for the same reason)
    "t137b_bitext_recall" -> 6,
    // t137c: same shape as t137b — three nProbe variants × two 1-row
    // [scalar] count broadcasts (truth + mined); the [model]
    // centroid/lloyd broadcasts sit behind the candidate checkpoint
    "t137c_bitext_planted" -> 6,
    // t138: the two-level index is [model] by construction — the
    // g-super array row, the g-row children table, the super argmin
    // inside the child→super assignment, plus the k-row centroid
    // join for the distortion column (k = n/8 of a gate corpus ≤ 250
    // rows; at true scale k rows broadcast is the documented trade vs
    // the flat path's single 2 GB-capped row)
    "t138_hier_assign" -> 4,
    // SQ8 family: the trained scalar-quantizer stats are ONE row
    // (2 × dims longs) riding crossJoin(broadcast(...)) — [model];
    // the probe sets are 10 checkpointed query vectors — [probe].
    // t142 sees the stats hint twice (exact + ADC sides each read
    // the encoded corpus) plus the probe broadcast twice.
    "t140_sq8_encode" -> 1, // [model] 1-row per-dim min/max stats
    "t141_sq8_adc" -> 2, // [model] stats + [probe] 10 queries
    "t142_sq8_recall" -> 4, // [model] stats ×2 + [probe] probes ×2
    // IVF-PQ composite: every hinted side is a fixed-size model or a
    // probe set — the 16 seed centroids (assign + residual join +
    // probe list), the 256-entry residual codebook, and the 10-query
    // probe frame. t144 sees only the probe broadcast: the encoded
    // posting table is localCheckpointed (index-build-once), which
    // hides the build-side hints from this walk (t129 precedent).
    // [model]×5 + [probe]: centroid model (assign + residual + probe
    // residual), codebook (encode + recon), probe frame — all k- or
    // query-bounded; the corpus-scaled k rides the floor dispatch
    "t143_ivfpq_search" -> 6,
    "t144_ivfpq_recall" -> 1, // [probe] 10 checkpointed queries
    // [model]+[probe]: flat probe-cell centroid array + probe frame
    // (the SQ8 stats + assignment model hints sit behind the posting
    // table's checkpoint)
    "t145_ivfsq8_search" -> 2,
    // [model]×2+[probe]×2: SQ8 stats + exact side's probe queries,
    // plus the t145 probe pair on the approx side
    "t146_ivfsq8_recall" -> 4,
    // [probe]: the 10-query frame on the refine rerank side — the
    // encoded corpus, the k=50 ADC candidate table, AND the exact
    // truth side are all localCheckpointed (index-build-once /
    // two-consumer reuse), hiding their internal model/probe hints
    // from this walk (t144 precedent)
    "t148_ivfsq8_refine" -> 1,
    "t13_decontaminate" -> 1, // [probe] eval gram set
    "t14_tfidf" -> 1, // [scalar] doc-count 1-row
    "t25_quality_shards" -> 2, // [bucket] two-level rank tables
    "t26_mix_weights" -> 1, // [scalar] per-source totals (O(sources))
    "t27_unigram_logprob" -> 1, // [vocab] unigram LM table
    "t28_pq_encode" -> 1, // [model] PQ codebook
    "t29_pq_adc" -> 3, // [model]+[probe] codebook + probe LUT
    "t30_bm25" -> 2, // [probe]+[scalar] query terms + corpus stats
    "t32_stratified_sample" -> 2, // [bucket] two-level rank tables
    "t36_heavy_hitters" -> 2, // [scalar] MG summary + total (agg outputs)
    "t40_bloom_decontam" -> 2, // [probe] fixed-size bloom + eval grams
    "t45_decontam_spans" -> 1, // [probe] eval gram set
    "t47_span_redact" -> 1, // [probe] redaction span set (eval-sized)
    "t4_knn_cosine" -> 1, // [probe] probe vectors
    "t50_embed_whiten" -> 1, // [model] d×d whitening matrix
    "t51_eval_exposure" -> 1, // [probe] eval hash set
    "t52b_source_overlap_est" -> 1, // [model] O(sources) KMV sketches
    "t52c_overlap_bounds" -> 1, // [model] O(sources) KMV sketches
    "t55_temp_mixing" -> 3, // [scalar] per-source weight frames
    "t59_dsir_weight" -> 1, // [scalar] (totS, totT, V) scalars
    "t60_ivf_recall" -> 4, // [model]+[probe] centroids + probes
    "t63_pipeline_funnel" -> 1, // [probe] eval grams (hits UNHINTED)
    "t64_repetition_budget" -> 2, // [scalar]+[model] budget + decisions
    "t66_url_blocklist" -> 1, // [dim] blocklist (hit set UNHINTED)
    "t69_cluster_sample" -> 1, // [model] 16 centroids
    // t75: the LM score table is localCheckpointed (r19 — three
    // consumers), hiding the [vocab] LM-side hints; the 2 visible are
    // the [bucket] tercile offsets + the O(langs) [scalar] count table
    "t75_ccnet_buckets" -> 2,
    "t76_lsh_recall" -> 2, // [probe] probe signatures ×2 passes
    // t78: the LM score table is localCheckpointed (r19 — twoLevelRank
    // consumes it twice), hiding the [vocab] LM sides; the 3 visible
    // are two [bucket] rank-offset tables + the host-cardinality
    // [model] rank position table
    "t78_rrf_fusion" -> 3,
    "t80_line_dedup" -> 2, // [scalar] 1-row bloom ×2 union branches
    "t81_hash_classifier" -> 1, // [model] 256-bucket model
    "t84_hard_negatives" -> 1, // [probe] probe vectors
    "t87_warc_pipeline" -> 2, // [dim]+[bucket] blocklist + prefix-sum
    "t88_binary_ann" -> 3, // [probe] signatures, candidates, rerank
    "t91_mmr_diversify" -> 1, // [probe] probe pool
    "t92_binary_recall" -> 4, // [probe] probes ×2 passes + compare
    "t93_robots_gate" -> 1, // [dim] robots rule table
    "t94_frontier_schedule" -> 1, // [bucket] two-level (ranks UNHINTED)
    "t95_token_budget_select" -> 2, // [scalar]+[bucket] total + offsets
    "t97_kn_trigram" -> 5, // [vocab] top-50 + type tables
    "t9_ivf_probe" -> 3, // [model]+[probe] centroids + probes
    "x1_depth_recurrence" -> 1) // [dim] install-event table

  test("fleet-wide: every broadcast hint sits on a bounded side — " +
    "counts pinned per query, zero for everyone else") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val actual = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val n = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.analyzed.collect { case h: ResolvedHint => h }
        .size
      name -> n
    }.filter(_._2 > 0).toMap
    val drift = (actual.keySet ++ expectedHints.keySet).toSeq.sorted
      .flatMap { q =>
        val (a, e) = (actual.getOrElse(q, 0), expectedHints.getOrElse(q, 0))
        if (a != e) Some(s"$q: $a hints (expected $e)") else None
      }
    assert(drift.isEmpty,
      "broadcast-hint drift — justify each new site under a bounded-" +
        s"side category above, or remove the hint:\n${drift.mkString("\n")}")
  }

  test("no query plans an unbroadcast cartesian product") {
    // fleet-wide guard: every deliberate crossJoin in the engine is a
    // broadcast of a singleton/config/codebook side and must plan as
    // BroadcastNestedLoopJoin — a CartesianProduct node means a small
    // side lost its broadcast and the query would all-pairs at scale
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      assert(!plan(name).contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }

  test("t69: per-cell quota prunes map-side, centroids broadcast") {
    // the rank<=k filter must plan as WindowGroupLimit on BOTH sides
    // of the cid exchange (partial prune before the shuffle), and the
    // centroid table joins as a broadcast
    val p = plan("t69_cluster_sample")
    assert(nodes(p, "WindowGroupLimit") == 2,
      s"t69 quota should prune partial+final:\n$p")
    assert(p.contains("BroadcastExchange"))
  }

  test("t68: only the bucket-table cumsum runs single-partition") {
    // the two-level prefix sum's contract: the corpus-sized window is
    // partitioned by bucket (parallel); only the corpus/64-sized
    // bucket table may pass through a SinglePartition window
    val p = plan("t68_sequence_pack")
    // SinglePartition is an Exchange ARGUMENT, not a node header —
    // count the raw string (details section prints each once)
    assert("SinglePartition".r.findAllIn(p).length == 1,
      s"t68 must keep the doc-level window bucket-partitioned:\n$p")
  }

  test("t70: one partial-agged corpus shuffle; windows on the lang table") {
    // the corpus pass must partial-aggregate map-side into the lang
    // hash exchange; everything after (the water-filling windows) runs
    // on #languages rows, so at most two more tiny exchanges
    val p = plan("t70_unimax")
    assert(p.contains("partial_sum"),
      "per-lang token totals must combine map-side")
    assert(nodes(p, "Exchange") <= 3,
      s"t70 should shuffle the corpus exactly once:\n$p")
  }

  test("t75: LM sides broadcast; no per-language single-reducer sort") {
    // the vocab-sized LM tables (bigram counts, unigram counts, vocab
    // size) must join as broadcasts, and every window must stay
    // hash-partitioned (lang / lang+bucket) — a SinglePartition node
    // means the tercile rank collapsed into a one-reducer global sort
    val p = plan("t75_ccnet_buckets")
    assert(p.contains("BroadcastExchange"),
      s"t75 LM tables must broadcast:\n$p")
    assert(!p.contains("SinglePartition"),
      s"t75 rank must not plan a single-reducer window:\n$p")
  }

  test("t77: curation aggs combine map-side; the rank join is " +
    "unhinted and AQE broadcasts it at runtime while it fits") {
    // the (host,hash) and host rollups must partial-aggregate before
    // their exchanges. The rank table is HOST-cardinality — ~10⁸ rows
    // at CC scale, near Spark's broadcast ceiling — so it carries no
    // forced hint (the checkpointed artifact hides static stats →
    // the initial plan is a sort-merge join); the contract is that
    // AQE's runtime sizes convert it to a broadcast when it fits,
    // which the EXECUTED plan must show at this SF
    val p = plan("t77_host_curation")
    assert(p.contains("partial_sum"),
      "host rollup must combine map-side")
    val df = SparkEntry.queries("t77_host_curation")(
      spark, "/root/testdata/sf0.001")
    df.collect() // execute THIS plan so AQE finalizes its join choice
    // AdaptiveSparkPlan.toString prints "== Final Plan ==" then the
    // pre-AQE "== Initial Plan ==" — judge only what actually ran
    val executed = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(executed.contains("BroadcastHashJoin") &&
      !executed.contains("SortMergeJoin"),
      s"AQE must runtime-broadcast the small rank side:\n$executed")
  }

  test("t78: fused top-k is TakeOrdered; corpus windows stay bucketed") {
    // the final top-50 must plan as TakeOrderedAndProject (never a
    // global sort of the corpus), and the only SinglePartition spots
    // allowed are the tiny ones: the two bucket-table cumsums and the
    // host-cardinality rank window
    val p = plan("t78_rrf_fusion")
    assert(p.contains("TakeOrderedAndProject"),
      s"t78 top-k must be TakeOrdered:\n$p")
    assert("SinglePartition".r.findAllIn(p).length <= 3,
      s"t78 corpus-sized windows must stay bucket-partitioned:\n$p")
  }

  test("t76: probe sides broadcast — truth is one linear corpus pass") {
    // the probe set must ride as the broadcast side of BOTH the exact
    // ground-truth join (equi on the shared shingle since the r20
    // intersection-count rewrite) and the band-key candidate join
    // (equi on (band,bh)) — if either falls back to a shuffle, or the
    // truth join regresses to the per-pair nested loop the rewrite
    // replaced, the "probe vs corpus" cost story breaks
    val p = plan("t76_lsh_recall")
    assert(nodes(p, "BroadcastHashJoin") >= 2,
      s"t76 truth + band joins must broadcast the probe side:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"t76 truth join must stay an equi-join on the shingle, not a " +
        s"per-pair loop:\n$p")
  }

  test("t74/pageRankPpm: scalar sides broadcast, iteration stays hash-based") {
    // t74's production plan hides behind the per-iteration lazy
    // checkpoints (Scan ExistingRDD), so the audit reads the same
    // operator with truncation off: each round's node-count and
    // dangling-mass scalars must ride as broadcast nested-loop joins
    // (explicit broadcast() hints — 1-row sides), never a
    // CartesianProduct, and the rank update must plan hash join +
    // hash agg — a Sort node means a sort-merge join snuck in
    import spark.implicits._
    val edges = Seq(("a", "b", 1L), ("b", "c", 2L)).toDF("s", "d", "w")
    val p = graft.ops.Graph
      .pageRankPpm(edges, "s", "d", "w", iters = 1,
        truncateLineage = false)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"pageRankPpm scalar sides must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(nodes(p, "Sort") == 0,
      s"pageRankPpm iteration joins must stay hash-based:\n$p")
  }

  test("bigramLmScore: the [vocab] LM sides broadcast in the scoring " +
    "subplan the t75/t78 checkpoints hide") {
    // t75/t78 localCheckpoint the narrow (doc_id, lm_lp) score table,
    // so their query-level audits see only Scan ExistingRDD above the
    // cut — a regression dropping the LM-side broadcasts UPSTREAM of
    // it would pass them (r19 advice #4). Audit the scoring subplan
    // directly, the pageRankPpm truncateLineage=false precedent: the
    // three vocab-sized LM tables (bigram counts, unigram counts,
    // vocab sizes) must each ride an explicit broadcast, and the plan
    // must never fall back to sort-merge on the corpus gram stream.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val (bg0, ug0, vsz) = graft.ops.TextOps
      .bigramLm(docs.where(org.apache.spark.sql.functions
        .col("source") === "src0"), "lang", "text")
    val lm = graft.ops.TextOps
      .bigramLmScore(docs, "doc_id", "lang", "text", bg0, ug0, vsz)
    val hints = lm.queryExecution.analyzed
      .collect { case h: ResolvedHint => h }.size
    assert(hints == 3,
      s"the three [vocab] LM sides must stay hinted (got $hints)")
    val p = lm.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(nodes(p, "BroadcastHashJoin") == 3,
      s"LM sides must execute as broadcast hash joins:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus gram stream must never sort-merge with an LM side:\n$p")
  }

  test("t80: fixed-size bloom prefilters the boilerplate anti-join — " +
    "the clean branch stays map-side, the exact join is unhinted") {
    // the df>1 line-hash set is CORPUS-PROPORTIONAL on the real web,
    // so it must never ride a forced broadcast. The scale shape: a
    // constant-size bloom (one broadcast row) tags every line; the
    // bloom-negative branch never joins at all (Union of the two
    // branches), and only the bloom-positive sliver reaches the exact
    // LeftAnti join, whose strategy is left to statistics/AQE (the
    // hint audit pins that boiler itself carries no hint)
    val p = plan("t80_line_dedup")
    assert(p.contains("graft_bloom_might_contain"),
      s"t80 must prefilter through the bloom kernel:\n$p")
    assert(nodes(p, "Union") >= 1,
      s"t80 must keep the bloom-negative branch join-free:\n$p")
    assert(p.contains("LeftAnti"),
      s"t80 must resolve bloom false positives with an exact anti-join:\n$p")
  }

  test("t81: scoring is a MAP-SIDE dot against the broadcast model array") {
    val p = plan("t81_hash_classifier")
    // r20 shape: the 1-row 256-weight array broadcasts (BNLJ cross of
    // a single row) and per-doc scores are computed in the scan
    // projection — no per-doc aggregate, no doc-keyed exchange, no
    // shuffle of the corpus against the model
    assert(p.contains("BroadcastNestedLoopJoin") ||
        p.contains("BroadcastHashJoin"),
      s"t81 model must reach the corpus as a broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"t81 scoring must never shuffle the corpus against the model:\n$p")
    // exactly one kernel eval on the scoring side + one in the model
    // branch — the r20 rewrite halved the static evals (the inferred
    // generate filter re-ran the kernel per scan before)
    assert(p.sliding("graft_feature_bucket_counts".length)
        .count(_ == "graft_feature_bucket_counts") <= 2,
      s"t81 must not re-evaluate the feature kernel per consumer:\n$p")
  }

  test("t82: z-key derivation is map-side — one partial->final agg exchange") {
    val p = plan("t82_zorder_layout")
    assert(nodes(p, "Exchange") <= 1,
      s"t82 must only shuffle the file-count-sized stats agg:\n$p")
    assert(!p.contains("Join"), s"t82 needs no join:\n$p")
  }

  test("t83: overlapping chunking plans zero shuffles") {
    assert(!plan("t83_chunk_overlap").contains("Exchange"),
      "t83 claims pure map-side chunking but plans a shuffle")
  }

  test("t84: probe set broadcasts; top-k prunes via WindowGroupLimit") {
    val p = plan("t84_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"t84 must broadcast the probe side of the non-equi join:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"t84 per-probe top-k must prune map-side before the qid shuffle:\n$p")
  }

  test("t88: Hamming pass reads signatures only; vectors rejoin by " +
    "broadcast") {
    val p = plan("t88_binary_ann")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"t88 must broadcast the probe signatures against one linear pass:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"t88 Hamming top-20 must prune map-side before the qid shuffle:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"t88 rerank must broadcast the candidate ids against the corpus:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"t88 must never shuffle the corpus for probes or rerank:\n$p")
  }

  test("t89: canonical key derives map-side — agg-only exchanges, no join") {
    val p = plan("t89_url_canonical")
    // count(DISTINCT url) plans the standard two-phase distinct agg:
    // partial-agg on (curl, url), exchange, then agg on curl — BOTH
    // exchanges key on the canonical URL, so the shape stays a single
    // logical shuffle of pre-combined rows. Anything beyond 2 means
    // the key derivation stopped being map-side.
    assert(nodes(p, "Exchange") <= 2,
      s"t89 must only shuffle the canonical-key aggregation:\n$p")
    assert(!p.contains("Join"), s"t89 needs no join:\n$p")
  }

  test("t93: rules broadcast; the longest-match winner is a partial " +
    "agg, not a window") {
    val p = plan("t93_robots_gate")
    assert(p.contains("BroadcastHashJoin"),
      s"t93 must broadcast the robots-sized rule table:\n$p")
    assert(p.contains("partial_max"),
      s"t93 argmax-by-struct must combine map-side:\n$p")
    assert(!p.contains("Window"),
      s"t93 must not pay a per-URL window for the argmax:\n$p")
  }

  test("t91: one corpus pass + bounded-pool kernel — no per-round " +
    "re-derivation") {
    // MMR is sequential in k; the kernel form must plan exactly one
    // broadcast corpus pass (probes side broadcast), a WindowGroupLimit
    // top-10 prune, and the pool-grouping shuffle — NOT k unrolled
    // rounds each re-deriving the scan (the pre-kernel form planned 22
    // nested-loop joins and 69 exchanges; a regression to driver-loop
    // plan-building shows up here as exploding node counts)
    val p = plan("t91_mmr_diversify")
    assert(nodes(p, "BroadcastNestedLoopJoin") === 1,
      s"t91 must scan the corpus exactly once, probes broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"t91 top-10 pool prune must run map-side:\n$p")
    assert(nodes(p, "Exchange") <= 2,
      s"t91 is one window shuffle + one grouping shuffle, max:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"t91's pairwise/greedy work belongs in the row kernel, " +
        s"not in joins:\n$p")
  }

  test("t92: both rankings broadcast-shaped; the recall join never " +
    "shuffles the corpus") {
    val p = plan("t92_binary_recall")
    // two corpus passes by design (approx + exact truth), each with
    // probes broadcast; the approx∩exact compare and the final probe
    // join run on probe-bounded rows
    assert(nodes(p, "BroadcastNestedLoopJoin") === 2,
      s"t92 runs exactly two linear corpus passes:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"t92 must never plan an unbroadcast cross:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"t92 top-k prunes must stay map-side:\n$p")
  }

  test("t94: rank join unhinted (AQE runtime-broadcasts the host-" +
    "cardinality table); queue window keys on host; the per-round " +
    "position rides the two-level scan (round 1 holds EVERY host — " +
    "no single-task round sort)") {
    val p = plan("t94_frontier_schedule")
    // the rank table is host-cardinality (~10⁸ rows at CC scale):
    // unhinted by contract — at this SF, AQE's runtime sizes must
    // still turn the initial sort-merge join into a broadcast
    val df = SparkEntry.queries("t94_frontier_schedule")(
      spark, "/root/testdata/sf0.001")
    df.collect() // execute THIS plan so AQE finalizes its join choice
    // AdaptiveSparkPlan.toString prints "== Final Plan ==" then the
    // pre-AQE "== Initial Plan ==" — judge only what actually ran
    val executed = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(executed.contains("BroadcastHashJoin") &&
      !executed.contains("SortMergeJoin"),
      s"AQE must runtime-broadcast the small rank side:\n$executed")
    assert(!p.contains("SinglePartition"),
      s"t94's queue/round windows must all hash-partition:\n$p")
    assert(p.contains("__tlb"),
      s"t94's per-round position must rank through the bucketed " +
        s"two-level path:\n$p")
    assert(
      """windowspecdefinition\(fetch_round#\d+L?, (?!__tlb#)[^,]* (ASC|DESC)"""
        .r.findFirstIn(p).isEmpty,
      s"t94 must not sort a whole round's hosts in one task:\n$p")
  }

  test("t95: corpus prefix sum stays bucket-partitioned; the scalar " +
    "total broadcasts") {
    // the only SinglePartition spots allowed are the tiny ones — the
    // bucket-table cumsum and the 1-row total aggregate; the
    // corpus-sized in-bucket window must hash-partition, and the
    // total must join back as a broadcast, never shuffle the corpus
    val p = plan("t95_token_budget_select")
    assert("SinglePartition".r.findAllIn(p).length <= 4,
      s"t95's corpus window must stay bucket-partitioned:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      s"t95's 1-row total must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"t95 must not shuffle the corpus for the total or the " +
        s"bucket offsets:\n$p")
  }

  test("t96: partitioned prefix sum plans with NO SinglePartition at " +
    "all — both levels key on source") {
    // with a real partition column, even twoLevelPrefixSum's level-1
    // bucket window partitions (by source) — the per-group packing
    // must never plan a global window, and the bucket-table join back
    // must broadcast
    val p = plan("t96_context_stitch")
    assert(!p.contains("SinglePartition"),
      s"t96's windows must all hash-partition:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"t96's (source × block) offset table must broadcast back:\n$p")
  }

  test("t108: novelty is gram-keyed end to end — no broadcast of a " +
    "corpus-scale side, no global window") {
    val p = plan("t108_ngram_novelty")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("SinglePartition"),
      s"t108 must stay keyed at gram/doc cardinality:\n$p")
  }

  test("d5/t56/t57/t72/t86/t109/t110: cluster reports derive from " +
    "the staged label artifact — zero LSH/CC work in the derived plans") {
    Seq("d5_neardup_keep", "t56_keep_best", "t57_source_dup_rate",
      "t72_cluster_split", "t86_dedup_savings", "t109_copy_flow",
      "t110_containment", "t112_edit_layers").foreach { q =>
      val p = plan(q)
      assert(!p.contains("graft_minhash_sig") &&
        !p.contains("graft_word_shingles") &&
        !p.contains("graft_bottomk_shingle_hashes"),
        s"$q must read the staged label artifact, not re-derive " +
          s"labels per consumer:\n$p")
      assert(p.contains("cluster_labels"),
        s"$q must scan the staged cluster_labels artifact:\n$p")
    }
  }

  test("t114: per-source median/MAD aggregate a bounded-domain " +
    "histogram — no per-source row collect, stats broadcast back") {
    val p = plan("t114_compression_gate")
    // the fence must come from percentile-over-(value, count): a
    // refactor to median()/percentile() straight over the doc rows
    // re-opens the dominant-source one-buffer trap
    assert(!p.contains("SinglePartition"),
      s"t114 must stay source/doc-keyed end to end:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"t114's O(sources) stats tables must broadcast back:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"t114 must not shuffle-sort-join the corpus against " +
        s"20-row stats tables:\n$p")
    assert(!perGroupCorpusSort.findFirstIn(p).isDefined,
      s"t114 must not sort corpus rows per source:\n$p")
  }

  test("t113: the budget scalars broadcast; the per-source table " +
    "never cartesians against corpus rows") {
    val p = plan("t113_epoch_alloc")
    assert(!p.contains("CartesianProduct"),
      s"t113's one-row totals must broadcast:\n$p")
  }

  // The one-task-per-source trap: a window partitioned by a LOW-
  // cardinality group key (source/lang — O(10) values, one of them
  // routinely 80% of a pretraining corpus) sorting real data rows
  // serializes the dominant group through ONE task. In the plan text
  // such a window reads `windowspecdefinition(source#N, <col> ASC…`
  // — a single partition key followed directly by a SORT item. The
  // only legitimate instance is twoLevelRank/PrefixSum's level-1
  // cumsum, which orders the BUCKET-cardinality table by __tlb.
  private val perGroupCorpusSort =
    """windowspecdefinition\((source|lang|event_type)#\d+, (?!__tlb#)[^,]* (ASC|DESC)""".r

  test("t101/t103/t24/t25/t32/q40: per-group ranks ride the two-level " +
    "scan — no single-level per-group window ever sorts corpus rows") {
    Seq("t101_chat_template", "t103_dpo_pairs", "t24_seq_packing",
      "t25_quality_shards", "t32_stratified_sample",
      "q40_window_ranks").foreach { q =>
      val p = plan(q)
      assert(perGroupCorpusSort.findFirstIn(p).isEmpty,
        s"$q plans a corpus-row sort window partitioned by the group " +
          s"key alone — one task per source at 100 TB:\n" +
          perGroupCorpusSort.findFirstIn(p).getOrElse(""))
      assert(p.contains("__tlb"),
        s"$q must rank through twoLevelRank/PrefixSum's bucket path")
      assert(!p.contains("SinglePartition"),
        s"$q must not plan any global window:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"$q's bucket-offset/count tables must broadcast back:\n$p")
    }
  }

  test("t97: one corpus shuffle; every stats join broadcasts the " +
    "top-50, never a sort-merge join") {
    val p = plan("t97_kn_trigram")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"t97's type-table joins must stream against the broadcast " +
        s"top-50:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"t97's top-50 must be TakeOrdered, not a global sort+limit:\n$p")
    assert(nodes(p, "HashAggregate") >= 2,
      s"trigram counting must partial-agg map-side:\n$p")
  }

  test("t119: within-band order rides the two-level scan — band is " +
    "low-cardinality; only the O(bands) CDF table may window " +
    "single-partition") {
    val p = plan("t119_curriculum_order")
    assert(p.contains("__tlb"),
      s"t119's band position must rank through twoLevelRank:\n$p")
    // a length band holds a large corpus fraction: a single-level
    // window partitioned by band alone would serialize it into one
    // task
    assert(
      """windowspecdefinition\(band#\d+L?, (?!__tlb#)[^,]* (ASC|DESC)"""
        .r.findFirstIn(p).isEmpty,
      s"t119 must not sort a whole band in one task:\n$p")
    // allowed tiny SinglePartition spots: the band-table cumsum and
    // the 1-row total agg
    assert("SinglePartition".r.findAllIn(p).length <= 3,
      s"t119's corpus window must stay bucket-partitioned:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct"),
      s"t119's unlock/offset tables must broadcast back:\n$p")
  }

  test("t99: FIM transform is pure map-side — zero shuffles") {
    assert(!plan("t99_fim_transform").contains("Exchange"),
      "t99 claims per-row expression work but plans a shuffle")
  }

  test("t100: sampler cumsum never plans a global window; top-100 is " +
    "TakeOrdered") {
    val p = plan("t100_neg_sampling")
    // the vocab prefix sum must ride the two-level scan: only the
    // first-codepoint bucket table (≤ #initial code points, bounded)
    // may window single-partition; the vocab-sized in-bucket window
    // must hash-partition, and the bucket offsets must rejoin as a
    // broadcast, never a sort-merge
    assert("SinglePartition".r.findAllIn(p).length <= 2,
      s"t100's vocab window must stay bucket-partitioned:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"t100's bucket offsets must broadcast back:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 must be TakeOrdered, not sort+limit:\n$p")
  }

  test("t98: keep-flag windows stay partitioned by the canonical hash") {
    val p = plan("t98_dedup_scope")
    assert(!p.contains("SinglePartition"),
      s"t98's dedup windows must hash-partition on h, never " +
        s"serialize the corpus:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("t90: no window runs single-partition — both prefix-sum levels " +
    "stay bucketed") {
    val p = plan("t90_length_batches")
    assert(!p.contains("SinglePartition"),
      s"t90's offset window partitions by bucket; a SinglePartition " +
        s"means the two-level shape was lost:\n$p")
  }

  test("t101: conversation windows stay keyed — no global window, " +
    "no shuffle join") {
    val p = plan("t101_chat_template")
    assert(!p.contains("SinglePartition"),
      s"t101's turn/span windows partition by (source[, conv]); " +
        s"SinglePartition means a window lost its key:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"t101 is window + agg only — no join may appear:\n$p")
  }

  test("t102: schedule builds from broadcast sides over ONE corpus " +
    "agg shuffle") {
    val p = plan("t102_batch_schedule")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"t102's 1-row total and 100-row step table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"t102 must never shuffle for the schedule cross joins:\n$p")
    assert(nodes(p, "Exchange") <= 2,
      s"t102's only shuffle is the per-source token agg " +
        s"(plus its 1-row rollup):\n$p")
  }

  test("t104: the held-out stream pays <=2 keyed shuffle joins " +
    "(ctx12 carrying the folded continuation map, w23); unigram " +
    "stats + total broadcast") {
    val p = plan("t104_kn_doc_ppl")
    assert(!p.contains("CartesianProduct"),
      s"t104's stat lookups must stay equi-joins:\n$p")
    // the tg-keyed c3 join is folded into the ctx12 join as a
    // per-context map — losing the fold re-adds a third
    // trigram-keyed shuffle of the whole stream
    assert(p.contains("map_from_entries"),
      s"t104's c3 lookup must ride the ctx12 continuation map:\n$p")
    assert(nodes(p, "SortMergeJoin") + nodes(p, "ShuffledHashJoin") <= 2,
      s"t104's held-out stream must shuffle-join at most twice " +
        s"(ctx12, w23):\n$p")
    assert(nodes(p, "BroadcastExchange") >= 3,
      s"t104's midCtx/uni/total must broadcast:\n$p")
    // the 1-row total agg and nothing else may single-partition
    assert("SinglePartition".r.findAllIn(p).length <= 2,
      s"t104 must not serialize the corpus or the model:\n$p")
  }

  test("t105: one corpus scan into keyed aggs; the language top-1 " +
    "joins back as a broadcast") {
    val p = plan("t105_data_card")
    assert(!p.contains("SinglePartition"),
      s"t105's aggs and top-1 window all key on source:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"t105's source-cardinality language table must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("t103: rank windows partition by source; the pair self-join " +
    "is (source, rank)-keyed — never a cartesian") {
    val p = plan("t103_dpo_pairs")
    assert(!p.contains("SinglePartition"),
      s"t103's quality-rank windows partition by source:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"t103's pair join must stay an equi-join on (source, rank):\n$p")
  }

  test("t137/t147: every bitext window is group-limited — the " +
    "full-partition aggregate-window shape that OOMs at 2M vectors " +
    "must not regress") {
    // the r15-r17 bitextTop1 computed the k-NN neighborhood sums as
    // unordered aggregate windows over the full partition
    // (sum(cm) OVER (PARTITION BY x_id)), which buffers the ENTIRE
    // candidate table in the window sorts: measured at the organic
    // 1000× point (2M vectors, 512M candidate rows, 8 GiB heap) that
    // shape dies in SparkOutOfMemoryError where the group-limited
    // rank→filter→aggregate completes (NOTES_r19). Pin both halves:
    // (a) the rank prunes map-side as WindowGroupLimit, and (b) NO
    // window in the plan carries a full-partition frame — in
    // FormattedMode exactly the unordered-aggregate windows print an
    // `unboundedfollowing$()` upper frame bound (row_number frames
    // end at currentrow), so its absence IS the no-buffer guarantee.
    for (q <- Seq("t137_bitext_margin", "t147_miner_preflight")) {
      val p = plan(q)
      assert(nodes(p, "WindowGroupLimit") >= 1,
        s"$q: the per-key rank filter must plan as WindowGroupLimit" +
          s" (map-side top-k prune before the exchange):\n$p")
      assert(!p.contains("unboundedfollowing"),
        s"$q: a full-partition window frame buffers the whole " +
          s"candidate table per sort — the 1000×-OOM shape:\n$p")
    }
  }
}
