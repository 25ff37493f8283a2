package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline: a broadcast of the
  * (small) query set against the corpus — the corpus side never shuffles,
  * each partition emits its local candidates and only the per-query top-k
  * shuffles for the final rank. The scale path is sign-random-projection
  * LSH: vectors map to a b-bit bucket map-side, candidate search touches
  * one bucket (± neighbors by Hamming distance).
  *
  * All arithmetic is double-precision folds in array-index order, so an
  * external engine reproduces the values bit-for-bit.
  */
object Vectors {

  /** Declarative reference forms (HOF folds — interpreted per element);
    * the hot paths below use the single-pass kernels in
    * `functions.VectorExpressions`, bit-identical by the same index-order
    * fold (equivalence: SketchExprSpec). */
  def dotDeclarative(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normDeclarative(a: Column): Column = sqrt(dotDeclarative(a, a))

  def cosineDeclarative(a: Column, b: Column): Column =
    dotDeclarative(a, b) / (normDeclarative(a) * normDeclarative(b))

  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine(a, b)

  /** Exact top-k neighbors by cosine for each query vector.
    * `queries`: (qidCol, vector) — small, broadcast. `corpus`:
    * (idCol, vector). Self-matches (qid == id) are excluded; ties break
    * on the neighbor id for determinism. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     qidCol: String, idCol: String, vecCol: String,
                     k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(qidCol), col(vecCol).as("__qv"))
    val scored = corpus.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(q))
      .where(col(qidCol) =!= col(idCol))
      .withColumn("__cos", cosine(col("__qv"), col(vecCol)))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("__cos").desc, col(idCol))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
      .select(col(qidCol), col(idCol), round(col("__cos"), 6).as("cos"),
        col("rn"))
  }

  /** Squared euclidean distance, index-order fold (portable). */
  def sqDistDeclarative(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
      (x, y) => (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)

  def sqDist(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.sqDist(a, b)

  /** IVF cell assignment: nearest centroid by squared distance (ties →
    * smallest centroid id). `centroids` is small → broadcast; the corpus
    * never shuffles except for the final per-vector argmin window, which
    * `dedupKeepFirst`-style reduces map-side. This is the coarse
    * quantizer of an IVF index; search then probes one (or few) cells. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame,
                idCol: String, cidCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = centroids.select(col(cidCol), col(vecCol).as("__cv"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__dist"), col(cidCol))
    corpus.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(c))
      .withColumn("__dist", sqDist(col(vecCol), col("__cv")))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(idCol), col(cidCol))
  }

  /** IVF probe search: approximate top-k by cosine, searching only the
    * `nProbe` cells whose centroids are nearest each query (the standard
    * IVF query path over the `ivfAssign` coarse quantizer). Exact within
    * the probed cells — recall is governed by nProbe/centroid quality.
    *
    * 100 TB shape: the corpus partitions by cell once (reusable across
    * queries), the probe list is queries × nProbe rows (tiny, broadcast),
    * and candidate scoring is an equi-join on the cell id — the corpus
    * side never cross-joins. Only the per-query top-k window shuffles
    * candidates, bounded by the probed cells' population. */
  def ivfProbeTopK(queries: DataFrame, corpus: DataFrame,
                   centroids: DataFrame, qidCol: String, idCol: String,
                   cidCol: String, vecCol: String,
                   k: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = corpus.select(col(idCol), col(vecCol))
      .join(ivfAssign(corpus, centroids, idCol, cidCol, vecCol), idCol)
    val c = centroids.select(col(cidCol), col(vecCol).as("__cv"))
    val probeW = Window.partitionBy(col(qidCol))
      .orderBy(col("__dist"), col(cidCol))
    val probes = queries.select(col(qidCol), col(vecCol).as("__qv"))
      .crossJoin(broadcast(c))
      .withColumn("__dist", sqDist(col("__qv"), col("__cv")))
      .withColumn("__rn", row_number().over(probeW))
      .where(col("__rn") <= nProbe)
      .select(col(qidCol), col("__qv"), col(cidCol))
    val scored = assigned.join(broadcast(probes), Seq(cidCol))
      .where(col(qidCol) =!= col(idCol))
      .withColumn("__cos", cosine(col("__qv"), col(vecCol)))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("__cos").desc, col(idCol))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
      .select(col(qidCol), col(idCol), round(col("__cos"), 6).as("cos"),
        col("rn"))
  }

  /** One Lloyd's iteration: assign every vector to its nearest centroid,
    * then recompute each centroid as the element-wise mean of its cell.
    * All distributed: assignment is the broadcast argmin of `ivfAssign`,
    * the mean is a posexplode → (cid, dim) partial-aggregated average →
    * re-assembled array (sorted struct collect, bounded by dims per
    * group). Chain for k-means; one step is also the IVF re-train. */
  def kmeansStep(corpus: DataFrame, centroids: DataFrame,
                 idCol: String, cidCol: String,
                 vecCol: String): DataFrame = {
    val assigned = ivfAssign(corpus, centroids, idCol, cidCol, vecCol)
    corpus.join(assigned, idCol)
      .select(col(cidCol), posexplode(col(vecCol)))
      .groupBy(col(cidCol), col("pos"))
      .agg(avg(col("col").cast("double")).as("__v"))
      .groupBy(col(cidCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("__v")))),
        s => s.getField("__v")).as(vecCol))
  }

  /** k-means on an embedding corpus: deterministic seeding with the k
    * smallest ids, `iters` Lloyd steps. Returns (cid, vector). */
  def kmeans(corpus: DataFrame, idCol: String, vecCol: String,
             k: Int, iters: Int): DataFrame = {
    var cent = corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("cid"),
        transform(col(vecCol), x => x.cast("double")).as(vecCol))
    (0 until iters).foreach { _ =>
      cent = kmeansStep(corpus, cent, idCol, "cid", vecCol)
        .localCheckpoint() // truncate the growing iteration lineage
    }
    cent
  }

  /** Sign-random-projection LSH bucket id (a `planes`-char '0'/'1'
    * string). The projection matrix is pseudo-random ±1 weights derived
    * from md5(plane||'_'||dim) — deterministic, engine-portable, and
    * needs no stored model. The matrix depends only on (plane, dim), so
    * it is computed ONCE driver-side and embedded as a literal (an
    * in-expression md5 would re-hash planes×dims times per row).
    * Map-side only. */
  def srpBucket(vec: Column, dims: Int, planes: Int): Column = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    val w: Seq[Seq[Double]] = (1 to planes).map { p =>
      (1 to dims).map { d =>
        val h = digest.digest(s"${p}_$d".getBytes("UTF-8"))
        if ((h(0) & 0xFF) >= 0x80) 1.0 else -1.0 // first hex char in 8..f
      }
    }
    val wLit = typedlit(w)
    concat_ws("", transform(sequence(lit(1), lit(planes)), p =>
      when(aggregate(sequence(lit(1), lit(dims)), lit(0.0), (acc, d) =>
        acc + element_at(element_at(wLit, p), d) *
          element_at(vec, d).cast("double")) >= 0, "1")
        .otherwise("0")))
  }

  /** Bucketed ANN: top-k by cosine searched only within each query's SRP
    * bucket — the 100 TB path (bucket is a map-side label; the join is an
    * equi-join on it, not a cross join). Recall depends on `planes`. */
  def bucketedTopK(queries: DataFrame, corpus: DataFrame,
                   qidCol: String, idCol: String, vecCol: String,
                   k: Int, dims: Int, planes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(qidCol), col(vecCol).as("__qv"),
      srpBucket(col(vecCol), dims, planes).as("__bkt"))
    val c = corpus.select(col(idCol), col(vecCol),
      srpBucket(col(vecCol), dims, planes).as("__bkt"))
    val scored = c.join(broadcast(q), Seq("__bkt"))
      .where(col(qidCol) =!= col(idCol))
      .withColumn("__cos", cosine(col("__qv"), col(vecCol)))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("__cos").desc, col(idCol))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
      .select(col(qidCol), col(idCol), round(col("__cos"), 6).as("cos"),
        col("rn"))
  }
}
