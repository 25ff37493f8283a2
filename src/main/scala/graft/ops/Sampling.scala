package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling for training pipelines.
  *
  * Both ops key off md5 of the row's id — not `rand()` and not Spark's
  * `sample()` — so the assignment is (a) reproducible across runs and
  * engines, (b) stable under repartitioning and appends (a document keeps
  * its split forever, the property train/test hygiene actually needs),
  * and (c) pure map-side at any scale.
  */
object Sampling {

  /** First hex nibble of md5(id) — a uniform 16-bucket hash, portable
    * to any engine with md5 (hex chars order identically in ASCII). */
  private def hexBucket(id: Column): Column =
    substring(md5(id.cast("string")), 1, 1)

  /** Deterministic train/val/test assignment: 16 md5 buckets split
    * 12/2/2 (75% / 12.5% / 12.5%). Map-side, no shuffle, no state. */
  def hashSplit(id: Column): Column = {
    val b = hexBucket(id)
    when(b < "c", "train").when(b < "e", "val").otherwise("test")
  }

  /** Deterministic stratified sample: the `k` rows with the smallest
    * md5(id) per stratum — uniform within each stratum, reproducible,
    * and engine-portable. One shuffle on the stratum key; the per-group
    * top-k is pre-reduced map-side by the partial WindowGroupLimit, so
    * only ~k·strata rows reach the exchange at 100 TB. */
  def stratifiedSample(df: DataFrame, strata: Seq[String], idCol: String,
                       k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
  }

  /** Top TF-IDF terms per document: tf = in-doc term count, idf =
    * ln(N / df) with df = docs containing the term. The corpus size N is
    * a 1-row lazy aggregate broadcast-joined in (no driver-side job at
    * plan build); the vocabulary table broadcasts (vocab ≪ corpus —
    * drop the hint and let AQE decide if yours is corpus-scale). Scores
    * are rounded before
    * ranking so cross-engine log ULP differences cannot flip the order.
    * Shuffles: one on (doc, term), one on term — both partial-aggregated;
    * the per-doc top-k pre-reduces map-side via WindowGroupLimit. */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol),
      explode(TextOps.tokensLower(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
    val tf = toks.groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = toks.groupBy(col("tok"))
      .agg(countDistinct(col(idCol)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("__n"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("tok"))
    tf.join(broadcast(df), "tok")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("__n") / col("df")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
      .select(col(idCol), col("tok"), col("tfidf"), col("rn"))
  }
}
