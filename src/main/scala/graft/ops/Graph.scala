package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph rank propagation — the host-importance step of a crawl
  * curation pipeline (Common Crawl publishes exactly this artifact as
  * its host-level ranks; FineWeb-style curation consumes link-based
  * host scores as a quality prior). Reference behavior: the pipeline's
  * per-domain aggregation (`bin/fs_aggregate.py`-family provenance
  * stats) stops at counting; rank propagation is the graph-native
  * extension a 100 TB crawl needs.
  *
  * Everything is INTEGER arithmetic (ppm-scaled ranks, ppb-scaled edge
  * probabilities, floor division) so a fixed iteration count yields
  * bit-identical results in any engine — the same design as the UniMax
  * water-filling and the stableAvg family: no float summation order,
  * no ties, an exact DuckDB twin.
  */
object Graph {

  /** PageRank with `iters` fixed Jacobi iterations over a weighted
    * edge list, damping d = dampingPct/100, ranks as ppm longs
    * (Σ ranks ≤ 1,000,000; floors only ever LOSE mass, never create
    * it — each per-node rank stays a valid long far from overflow).
    *
    * Scale shape (per iteration, corpus-sized graph):
    *  - contributions: one hash join ranks⋈edges on the source key +
    *    one partial-aggregated shuffle on the destination key — the
    *    canonical distributed-PageRank plan;
    *  - the dangling-mass total and the node count are 1-row
    *    aggregates broadcast back (never a driver collect);
    *  - edge out-probabilities are quantized ONCE at ppb
    *    (`p_ppb = (1e9·w) div Σ_out w`) so iterations never touch the
    *    raw weights again and the per-iteration product
    *    d·rank_ppm·p_ppb ≤ 85·10^6·10^9 < 2^63 CANNOT overflow at any
    *    corpus size. The one-time normalization needs 10^9·w in the
    *    long domain — per-edge weight < ~9.2·10^9, enforced loud
    *    (assert_true) because at 100 TB a mega-hub edge could breach
    *    it silently otherwise (pre-scale weights if so: rank depends
    *    on w only through the per-source RATIO).
    *  - lineage: each iteration references the previous ranks three
    *    times (contributions, dangling mass, base term) — without
    *    truncation the plan tree grows 3^iters, so ranks are lazily
    *    localCheckpoint'ed per round (the `connectedComponents`
    *    pattern: truncation without an extra eager job).
    *
    * Dangling nodes (no out-edges) redistribute their mass uniformly —
    * the standard treatment; with it, total mass stays ~10^6 ppm minus
    * floor dust, so ranks are comparable across graphs.
    *
    * Returns (node, rank_ppm: long). Deterministic: fixed iterations,
    * integer floors, no floats anywhere. */
  def pageRankPpm(edges: DataFrame, srcCol: String, dstCol: String,
                  wCol: String, iters: Int, dampingPct: Int = 85,
                  truncateLineage: Boolean = true): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0,100], got $dampingPct")
    // truncateLineage=false keeps the full per-iteration lineage
    // visible — ONLY for plan audits (PlanAuditSpec reads the joins a
    // checkpoint would hide behind Scan ExistingRDD); production keeps
    // the default or the plan tree grows 3^iters
    def cut(df: DataFrame): DataFrame =
      if (truncateLineage) df.localCheckpoint(eager = false) else df
    // The caller's edge pipeline is often a full corpus pass (t74/t77/
    // t78/t94 extract link domains from every document's text); e feeds
    // outw, en, nodes (twice, via the union) and dangling, so without
    // its own cut that extraction re-executes ~5× — once per derived
    // materialization (r19 measured: the t74 host pipeline re-ran its
    // regex/explode/rollup pass 5×). One cut here makes every
    // downstream build read the edge-cardinality materialization.
    val e = cut(edges.select(col(srcCol).cast("string").as("__src"),
      col(dstCol).cast("string").as("__dst"),
      col(wCol).cast("long").as("__w")))
    // Per-source out-weight, with the ppb-normalization precondition
    // enforced IN the aggregate row (the stableAvg pattern: null when
    // the guard holds, contributes 0, errors loud on violation).
    // Guard conjuncts beyond the per-edge range: (a) NULL weights —
    // min/max SKIP nulls, so a bad cast used to pass the guard while
    // its edge silently vanished from the distribution (the endpoint
    // still counted toward n); count(*) vs count(col) catches it.
    // (b) the per-source SUM — 2e9 edges near the per-edge cap
    // overflow the long sum, flipping __ow negative and every __p
    // with it; summed as decimal for the check, exact as long once
    // the check passes.
    val outw = e.groupBy("__src")
      .agg((sum("__w") + coalesce(assert_true(
        coalesce(max("__w") <= 9223372036L, lit(true)) &&
          coalesce(min("__w") > 0L, lit(true)) &&
          count(lit(1)) === count(col("__w")) &&
          coalesce(sum(col("__w").cast("decimal(38,0)")) <=
            lit(Long.MaxValue).cast("decimal(38,0)"), lit(true)),
        lit("pageRankPpm: edge weights must be non-null, in " +
          "(0, ~9.2e9], and sum within long per source — a null " +
          "weight silently vanishes from the distribution; an " +
          "overflowed out-sum flips every probability negative; " +
          "pre-scale or clean the weights"))
        .cast("long"), lit(0L))).as("__ow"))
    // One-time edge-probability quantization: iterations are weight-free.
    val en = cut(e.join(outw, Seq("__src"))
      .select(col("__src"), col("__dst"),
        expr("(1000000000 * __w) div __ow").as("__p")))
    val nodes = cut(e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct())
    val nRow = nodes.agg(count(lit(1)).as("__n"))
    // Dangling = nodes with no out-edges; computed once, it is a
    // node-set-sized side input to each round's 1-row mass aggregate.
    val dangling = cut(nodes
      .join(outw.select(col("__src").as("node")), Seq("node"), "left_anti"))
    var ranks = cut(nodes.crossJoin(broadcast(nRow))
      .select(col("node"), expr("1000000 div __n").as("rank_ppm")))
    for (_ <- 1 to iters) {
      val contrib = ranks
        .join(en, ranks("node") === en("__src"))
        .select(col("__dst").as("node"),
          expr(s"($dampingPct * rank_ppm * __p) div 100000000000")
            .as("__c"))
        .groupBy("node").agg(sum("__c").as("__in"))
      val dang = dangling.join(ranks, Seq("node"))
        .agg(coalesce(sum("rank_ppm"), lit(0L)).as("__d"))
      ranks = cut(nodes.crossJoin(broadcast(nRow)).crossJoin(broadcast(dang))
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (expr(s"(1000000 * ${100 - dampingPct}) div (100 * __n)") +
            expr(s"($dampingPct * __d) div (100 * __n)") +
            coalesce(col("__in"), lit(0L))).as("rank_ppm")))
    }
    ranks
  }
}
