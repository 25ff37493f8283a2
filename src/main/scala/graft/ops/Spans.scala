package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-position span utilities for substring-level dedup and
  * decontamination — the "ExactSubstr" side of exact n-gram matching
  * (Lee et al. 2021, arXiv:2107.06499 §4), where pipelines locate the
  * duplicated/contaminated token SPANS instead of deleting whole
  * documents (one boilerplate footer shouldn't kill the page).
  *
  * Scale shape: window extraction is a map-side expression
  * ([[tokenWindows]] — no shuffle); collision detection is one
  * map-side-combined aggregation keyed by the gram (vocabulary-sized
  * shuffle, never corpus-sized); span merging ([[mergeSpans]]) is a
  * single per-document window pass over the already-filtered hits —
  * gaps-and-islands on the running max end, O(1) state per document.
  * The corpus never self-joins.
  */
object Spans {

  /** Overlapping `n`-token windows with their 1-based start position,
    * as `array<struct<pos:long, gram:string>>`. Documents shorter than
    * `n` tokens yield an empty array (guarded — `sequence` would
    * otherwise run descending). */
  def tokenWindows(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => struct(i.cast("long").as("pos"),
          concat_ws(" ", slice(toks, i, lit(n))).as("gram"))))
      .otherwise(array().cast("array<struct<pos:bigint,gram:string>>"))

  /** Exploded position-tagged 64-bit gram hashes for a documents
    * frame — (idCol, pos, gh), one row per window — the shared first
    * stage of the span queries (t44/t45/t47). Hashing happens in the
    * single-pass WindowHashesExpr kernel, so gram strings never
    * materialize and downstream shuffles carry 16-byte keys. */
  def gramHashes(docs: DataFrame, idCol: String, textCol: String,
                 n: Int): DataFrame =
    docs.select(col(idCol),
      explode(graft.functions.SketchExpressions
        .windowHashes(TextOps.tokens(col(textCol)), n)).as("__w"))
      .select(col(idCol), col("__w.pos").as("pos"), col("__w.gh").as("gh"))

  /** Contaminated-span detection against a held-out slice: windows of
    * non-eval docs colliding exactly with any window of eval docs
    * (`isEval` over the documents frame's columns), merged into
    * maximal per-doc spans. The eval gram set is eval-sized →
    * broadcast left-semi; only colliding windows reach the merge. */
  def decontamSpans(docs: DataFrame, idCol: String, textCol: String,
                    n: Int, isEval: Column): DataFrame = {
    // a NULL isEval verdict (e.g. a null source column) must land a
    // doc on the CORPUS side, not vanish from both: where(!null) and
    // where(null) each drop the row, so a contaminated null-source
    // doc would silently evade decontamination
    val grams = docs
      .select(col(idCol), coalesce(isEval, lit(false)).as("__eval"),
        explode(graft.functions.SketchExpressions
          .windowHashes(TextOps.tokens(col(textCol)), n)).as("__w"))
      .select(col(idCol), col("__eval"),
        col("__w.pos").as("pos"), col("__w.gh").as("gh"))
    val evalG = grams.where(col("__eval")).select("gh").distinct()
    mergeSpans(
      grams.where(!col("__eval"))
        .join(broadcast(evalG), Seq("gh"), "left_semi")
        .select(idCol, "pos"),
      idCol, "pos", n)
  }

  /** Merge fixed-width window hits into maximal spans. A window of
    * width `n` starting at `pos` covers tokens `[pos, pos+n-1]`; two
    * windows merge when their covered ranges overlap or touch. Input:
    * one row per hit window (`docCol`, 1-based `posCol`); output:
    * (`docCol`, `span_start`, `span_end`, `n_windows`), one row per
    * maximal span. */
  def mergeSpans(hits: DataFrame, docCol: String, posCol: String,
                 n: Int): DataFrame = {
    val w = Window.partitionBy(docCol).orderBy(posCol)
    val end = col(posCol) + (n - 1)
    // Gaps-and-islands: a window starts a new span iff it begins after
    // the running max end of all earlier windows (+1: adjacent spans
    // cover contiguous tokens, so they merge too).
    val prevEnd = max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    hits
      .withColumn("__new",
        when(prevEnd.isNull || col(posCol) > prevEnd + 1, 1).otherwise(0))
      .withColumn("__isl",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(docCol), col("__isl"))
      .agg(min(col(posCol)).cast("long").as("span_start"),
        max(end).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("__isl")
  }
}
