package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Single-pass kernels for the vector-similarity hot path.
  *
  * Why custom: `Vectors.dot/sqDist/cosine` compose `zip_with` +
  * `aggregate`, which Spark evaluates INTERPRETED — one lambda dispatch
  * and one boxed intermediate per array element, and cosine walks the
  * arrays three times (dot + both norms). For a 64-dim embedding scored
  * against 16 centroids that is thousands of closure calls per row;
  * here it is one tight JVM loop per pair with zero allocation.
  *
  * Bit-identical to the declarative forms (equivalence: SketchExprSpec):
  * every accumulator folds in ascending index order — the same order as
  * `aggregate` — and cosine's three sums are independent accumulators,
  * so IEEE results match exactly. Length-mismatched inputs return null,
  * matching `zip_with`'s null padding propagating through the fold.
  */
object VectorExpressions {

  private def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case DoubleType => arr.getDouble(i)
    case FloatType => arr.getFloat(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case _ => throw new IllegalArgumentException(s"non-numeric vector: $t")
  }

  sealed trait VecBinary extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    // length-mismatched vectors return null even when both children
    // are non-nullable: without this override Catalyst derives
    // nullable=false from the children, parents skip the null check
    // (NPE in codegen) and the optimizer may fold IsNull to false —
    // breaking the NaN/null filters the top-k paths rely on
    override def nullable: Boolean = true
    @transient protected lazy val lt: DataType =
      left.dataType.asInstanceOf[ArrayType].elementType
    @transient protected lazy val rt: DataType =
      right.dataType.asInstanceOf[ArrayType].elementType
  }

  /** Σ aᵢ·bᵢ in index order. */
  case class VecDotExpr(left: Expression, right: Expression)
    extends VecBinary {
    override def prettyName: String = "graft_vec_dot"
    protected override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      var acc = 0.0
      var i = 0
      while (i < n) { acc += get(x, i, lt) * get(y, i, rt); i += 1 }
      acc
    }
    override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** Σ (aᵢ−bᵢ)² in index order. */
  case class VecSqDistExpr(left: Expression, right: Expression)
    extends VecBinary {
    override def prettyName: String = "graft_vec_sqdist"
    protected override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = get(x, i, lt) - get(y, i, rt)
        acc += d * d
        i += 1
      }
      acc
    }
    override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** dot/(‖a‖·‖b‖) — three independent index-order accumulators in ONE
    * array walk (the declarative form walks three times). */
  case class VecCosineExpr(left: Expression, right: Expression)
    extends VecBinary {
    override def prettyName: String = "graft_vec_cosine"
    protected override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      var i = 0
      while (i < n) {
        val xi = get(x, i, lt); val yi = get(y, i, rt)
        ab += xi * yi; aa += xi * xi; bb += yi * yi
        i += 1
      }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** Sign-random-projection bucket id: one '0'/'1' char per plane,
    * bit p = (Σ_d w(p)(d)·v(d) >= 0), accumulated in index order —
    * bit-identical to the declarative `srpBucket` fold. The ±1 weight
    * matrix is driver-derived (md5-based, engine-portable) and baked
    * into the expression; one tight planes×dims loop per row replaces
    * planes interpreted `aggregate` lambdas with per-element 2-D
    * `element_at` lookups. */
  case class VecSrpBucketExpr(child: Expression,
                              weights: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_vec_srp_bucket"
    @transient private lazy val vt: DataType =
      child.dataType.asInstanceOf[ArrayType].elementType
    @transient private lazy val w: Array[Array[Double]] =
      weights.map(_.toArray).toArray

    protected override def nullSafeEval(vec: Any): Any = {
      val v = vec.asInstanceOf[ArrayData]
      val n = v.numElements()
      val out = new Array[Byte](w.length)
      var p = 0
      while (p < w.length) {
        val wp = w(p)
        val dims = math.min(n, wp.length)
        var acc = 0.0
        var d = 0
        while (d < dims) { acc += wp(d) * get(v, d, vt); d += 1 }
        out(p) = (if (acc >= 0.0) '1' else '0').toByte
        p += 1
      }
      org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
    }
    override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
  }

  /** Argmin-centroid: given a vector and an array<struct<cid, cv>> of
    * centroids (one broadcast row for the whole corpus), return the cid
    * with minimal squared distance, ties to the smallest cid. One scan,
    * order-insensitive — so `collect_list`'s nondeterministic assembly
    * order cannot change the answer. This makes IVF assignment fully
    * MAP-SIDE: no per-candidate row explosion, no argmin shuffle. */
  case class VecArgminCentroidExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    // empty / all-length-mismatched centroid arrays return null
    override def nullable: Boolean = true
    override def prettyName: String = "graft_vec_argmin_centroid"
    // the eval reads cid with getLong: an int cid would pass analysis
    // and then misread/ClassCastException EXECUTOR-side at scale
    // (the VecCovarianceAgg precedent) — reject at analysis instead
    override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      right.dataType match {
        case ArrayType(st: StructType, _)
          if st.fields.length == 2 && st.fields(0).dataType == LongType &&
            st.fields(1).dataType.isInstanceOf[ArrayType] =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"argminCentroid expects array<struct<cid:bigint, " +
            s"cv:array<numeric>>>, got $other (cast cid to long)")
      }
    }
    @transient private lazy val vt: DataType =
      left.dataType.asInstanceOf[ArrayType].elementType
    @transient private lazy val centStruct: StructType = right.dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    @transient private lazy val cvType: DataType =
      centStruct.fields(1).dataType.asInstanceOf[ArrayType].elementType

    protected override def nullSafeEval(vec: Any, cents: Any): Any = {
      val v = vec.asInstanceOf[ArrayData]
      val cs = cents.asInstanceOf[ArrayData]
      val n = v.numElements()
      var bestCid = 0L
      var bestDist = Double.PositiveInfinity
      var found = false
      var c = 0
      while (c < cs.numElements()) {
        val s = cs.getStruct(c, 2)
        val cid = s.getLong(0)
        val cv = s.getArray(1)
        if (cv.numElements() == n) {
          var acc = 0.0
          var i = 0
          while (i < n) {
            val d = get(v, i, vt) - get(cv, i, cvType)
            acc += d * d
            i += 1
          }
          if (!found || acc < bestDist ||
            (acc == bestDist && cid < bestCid)) {
            bestDist = acc; bestCid = cid; found = true
          }
        }
        c += 1
      }
      if (found) bestCid else null
    }
    override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** Σ (aᵢ−bᵢ)² over INTEGER arrays with a LONG accumulator, in index
    * order — the SQ8 family's hot pair loop (t141/t142/t145/t146/t148
    * ADC and exact-micro distances). The declarative form — an
    * `aggregate(sequence(1, dims), 0L, …)` fold — pays one interpreted
    * lambda dispatch plus boxed element_at calls PER COORDINATE PER
    * PAIR; this is one tight primitive loop per pair. Bit-identical to
    * that fold (equivalence: SketchExprSpec): long arithmetic in the
    * same index order, null on length mismatch (matching the fold over
    * zip_with-style padding). Integer element types only — the µ²
    * distances must stay in the exact integer domain end to end. */
  case class VecSqDistLongExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_vec_sqdist_long"
    private def getL(arr: ArrayData, i: Int, t: DataType): Long = t match {
      case LongType => arr.getLong(i)
      case IntegerType => arr.getInt(i).toLong
      case ShortType => arr.getShort(i).toLong
      case ByteType => arr.getByte(i).toLong
      case _ => throw new IllegalArgumentException(
        s"non-integer vector: $t")
    }
    @transient private lazy val lt: DataType =
      left.dataType.asInstanceOf[ArrayType].elementType
    @transient private lazy val rt: DataType =
      right.dataType.asInstanceOf[ArrayType].elementType
    protected override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      var acc = 0L
      var i = 0
      while (i < n) {
        // a null element propagates null for the whole distance — the
        // aggregate(...) fold this kernel replaced did the same, and a
        // silent 0-read would let a corrupt coordinate RANK instead of
        // dropping (r19 advice #1)
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val d = getL(x, i, lt) - getL(y, i, rt)
        acc += d * d
        i += 1
      }
      acc
    }
    override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  // Column-level entry points --------------------------------------

  def sqDistLong(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecSqDistLongExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecDotExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def sqDist(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecSqDistExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecCosineExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Greedy MMR (Carbonell & Goldstein 1998) over a BOUNDED candidate
    * pool, entirely within the row: from `array<struct<vec_id:long,
    * simq:double, v:array<numeric>>>` pick `k` candidates maximizing
    * `λ·simq − μ·max_{s∈picked} cos(v, v_s)` (pick 1 scores `λ·simq`
    * with NO penalty term), ties on the score going to the smaller
    * vec_id. Returns `array<struct<pick, vec_id, mmr>>`, pick 1-based
    * in selection order.
    *
    * Why an expression and not a driver loop of DataFrame ops: MMR is
    * sequential in k by definition, and unrolling k rounds as plan
    * nodes re-derives the candidate scan each round (the pre-rewrite
    * t91 planned 22 nested-loop joins and 69 exchanges for k=3). The
    * pool is top-N-per-probe — bounded by construction — so the O(k·N)
    * greedy with O(N²) pairwise cosines belongs IN the row: one corpus
    * pass builds pools, one shuffle groups them, this kernel finishes.
    *
    * λ and μ are taken separately, NOT μ=1−λ: `1.0 − 0.7` is
    * `0.30000000000000004` in IEEE doubles and flips ranks vs an
    * engine (the DuckDB twin) that writes `0.3` literally. Argmax is
    * order-independent — total-order comparison with vec_id
    * tie-break, where a real score always beats NaN (a zero-norm
    * vector's cosine) and NaN-vs-NaN falls to the id — so the
    * non-deterministic `collect_list` pool order cannot leak into the
    * result. Cosine folds in ascending index order — bit-identical to
    * `VecCosineExpr`. */
  case class MmrPicksExpr(child: Expression, lambda: Double, mu: Double,
                          k: Int)
    extends UnaryExpression with CodegenFallback {
    require(k > 0, "mmrPicks: k must be positive")
    override def prettyName: String = "graft_mmr_picks"
    // eval reads vec_id with getLong and simq with getDouble — wrong
    // field types would misread executor-side; reject at analysis
    override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      child.dataType match {
        case ArrayType(st: StructType, _)
          if st.fields.length == 3 && st.fields(0).dataType == LongType &&
            st.fields(1).dataType == DoubleType &&
            st.fields(2).dataType.isInstanceOf[ArrayType] =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"mmrPicks expects array<struct<vec_id:bigint, simq:double, " +
            s"v:array<numeric>>>, got $other")
      }
    }
    override def dataType: DataType = ArrayType(new StructType()
      .add("pick", LongType, nullable = false)
      .add("vec_id", LongType, nullable = false)
      .add("mmr", DoubleType, nullable = false), containsNull = false)

    @transient private lazy val vType: DataType = child.dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
      .fields(2).dataType.asInstanceOf[ArrayType].elementType

    private def cos(a: Array[Double], b: Array[Double]): Double = {
      // ragged pool vectors have no cosine: NaN rides the kernel's
      // documented NaN path (an unchecked walk would crash on a
      // longer `a` or silently truncate against a longer `b`)
      if (a.length != b.length) return Double.NaN
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      var i = 0
      while (i < a.length) {
        ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i)
        i += 1
      }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }

    protected override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val ids = new Array[Long](n)
      val simq = new Array[Double](n)
      val vs = new Array[Array[Double]](n)
      var i = 0
      while (i < n) {
        val s = arr.getStruct(i, 3)
        ids(i) = s.getLong(0)
        simq(i) = s.getDouble(1)
        val va = s.getArray(2)
        val v = new Array[Double](va.numElements())
        var j = 0
        while (j < v.length) { v(j) = get(va, j, vType); j += 1 }
        vs(i) = v
        i += 1
      }
      val nPick = math.min(k, n)
      val picked = new Array[Int](nPick)
      val isPicked = new Array[Boolean](n)
      val out = new Array[Any](nPick)
      var p = 0
      while (p < nPick) {
        var bi = -1
        var bm = 0.0
        var c = 0
        while (c < n) {
          if (!isPicked(c)) {
            val m =
              if (p == 0) simq(c) * lambda
              else {
                var pen = Double.NegativeInfinity
                var q = 0
                while (q < p) {
                  val sab = cos(vs(c), vs(picked(q)))
                  // total-order max: a NaN sim (zero-norm vector)
                  // POISONS the penalty — matching math.max's NaN
                  // propagation in the spec replay — instead of
                  // silently reading as "no penalty"
                  if (java.lang.Double.compare(sab, pen) > 0) pen = sab
                  q += 1
                }
                simq(c) * lambda - pen * mu
              }
            // NaN-aware argmax, so the result stays independent of
            // the non-deterministic pool order even with zero-norm
            // vectors: a real score always beats NaN, NaN-vs-NaN
            // falls to the vec_id tie-break (plain `>`/`==` are both
            // false against NaN, which would let whichever NaN
            // arrived first squat on the pick)
            val mNaN = java.lang.Double.isNaN(m)
            val bNaN = java.lang.Double.isNaN(bm)
            val cmp = java.lang.Double.compare(m, bm)
            // the bi < 0 case must be decided FIRST: the tie branch
            // reads ids(bi), and the first unpicked candidate with a
            // score exactly equal to bm's 0.0 init used to index
            // ids(-1) — ArrayIndexOutOfBoundsException mid-query
            val beats =
              if (bi < 0) true
              else if (mNaN != bNaN) bNaN
              else cmp > 0 || (cmp == 0 && ids(c) < ids(bi))
            if (beats) { bi = c; bm = m }
          }
          c += 1
        }
        picked(p) = bi
        isPicked(bi) = true
        out(p) = new GenericInternalRow(
          Array[Any]((p + 1).toLong, ids(bi), bm))
        p += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
  }

  /** Top-`n` nearest centroid ids by (squared distance, cid) — the
    * multi-probe generalization of [[VecArgminCentroidExpr]], for
    * assignments where the PROBE side is corpus-sized and cannot ride
    * t9's broadcast-probes shape (bitext mining probes nProbe cells
    * per source vector). Same map-side contract: one scan of the
    * broadcast centroid array per row, order-insensitive, no row
    * explosion, no shuffle. Returns array<long> of ≤ n cids sorted by
    * (dist, cid); empty/mismatched centroid arrays → empty. */
  case class VecTopNCentroidExpr(left: Expression, right: Expression,
                                 n: Int)
    extends BinaryExpression with CodegenFallback {
    require(n >= 1, s"n=$n")
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_vec_topn_centroid"
    override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      right.dataType match {
        case ArrayType(st: StructType, _)
          if st.fields.length == 2 && st.fields(0).dataType == LongType &&
            st.fields(1).dataType.isInstanceOf[ArrayType] =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"topNCentroid expects array<struct<cid:bigint, " +
            s"cv:array<numeric>>>, got $other (cast cid to long)")
      }
    }
    @transient private lazy val vt: DataType =
      left.dataType.asInstanceOf[ArrayType].elementType
    @transient private lazy val centStruct: StructType = right.dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    @transient private lazy val cvType: DataType =
      centStruct.fields(1).dataType.asInstanceOf[ArrayType].elementType

    protected override def nullSafeEval(vec: Any, cents: Any): Any = {
      val v = vec.asInstanceOf[ArrayData]
      val cs = cents.asInstanceOf[ArrayData]
      val len = v.numElements()
      // bounded insertion sort into n slots (n is 1-4 in practice)
      val dists = Array.fill(n)(Double.PositiveInfinity)
      val cids = new Array[Long](n)
      var filled = 0
      var c = 0
      while (c < cs.numElements()) {
        val s = cs.getStruct(c, 2)
        val cid = s.getLong(0)
        val cv = s.getArray(1)
        if (cv.numElements() == len) {
          var acc = 0.0
          var i = 0
          while (i < len) {
            val d = get(v, i, vt) - get(cv, i, cvType)
            acc += d * d
            i += 1
          }
          // insert (acc, cid) if it beats the current worst slot
          var p = if (filled < n) filled else n - 1
          val beatsLast = filled < n || acc < dists(n - 1) ||
            (acc == dists(n - 1) && cid < cids(n - 1))
          if (beatsLast) {
            while (p > 0 && (acc < dists(p - 1) ||
                (acc == dists(p - 1) && cid < cids(p - 1)))) {
              dists(p) = dists(p - 1); cids(p) = cids(p - 1); p -= 1
            }
            dists(p) = acc; cids(p) = cid
            if (filled < n) filled += 1
          }
        }
        c += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        (0 until filled).map(i => cids(i): Any).toArray)
    }
    override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** `VecTopNCentroidExpr` with the squared distance retained:
    * array<struct<cid:bigint, dist:double>> sorted by (dist, cid).
    * The hierarchical quantizer's level-2 probe needs the distance to
    * RE-RANK candidate cells gathered from several super-cells — the
    * cid-only kernel would force a join back to the full flat centroid
    * table (the exact single-structure shape the hierarchy removes).
    * Same scan, same tie-breaks, same length-mismatch skip as the
    * cid-only variant (equivalence: VectorHierSpec). */
  case class VecTopNCentroidDistExpr(left: Expression, right: Expression,
                                     n: Int)
    extends BinaryExpression with CodegenFallback {
    require(n >= 1, s"n=$n")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("cid", LongType, nullable = false),
      StructField("dist", DoubleType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "graft_vec_topn_centroid_dist"
    override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      right.dataType match {
        case ArrayType(st: StructType, _)
          if st.fields.length == 2 && st.fields(0).dataType == LongType &&
            st.fields(1).dataType.isInstanceOf[ArrayType] =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"topNCentroidDist expects array<struct<cid:bigint, " +
            s"cv:array<numeric>>>, got $other (cast cid to long)")
      }
    }
    @transient private lazy val vt: DataType =
      left.dataType.asInstanceOf[ArrayType].elementType
    @transient private lazy val centStruct: StructType = right.dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    @transient private lazy val cvType: DataType =
      centStruct.fields(1).dataType.asInstanceOf[ArrayType].elementType

    protected override def nullSafeEval(vec: Any, cents: Any): Any = {
      val v = vec.asInstanceOf[ArrayData]
      val cs = cents.asInstanceOf[ArrayData]
      val len = v.numElements()
      val dists = Array.fill(n)(Double.PositiveInfinity)
      val cids = new Array[Long](n)
      var filled = 0
      var c = 0
      while (c < cs.numElements()) {
        val s = cs.getStruct(c, 2)
        val cid = s.getLong(0)
        val cv = s.getArray(1)
        if (cv.numElements() == len) {
          var acc = 0.0
          var i = 0
          while (i < len) {
            val d = get(v, i, vt) - get(cv, i, cvType)
            acc += d * d
            i += 1
          }
          var p = if (filled < n) filled else n - 1
          val beatsLast = filled < n || acc < dists(n - 1) ||
            (acc == dists(n - 1) && cid < cids(n - 1))
          if (beatsLast) {
            while (p > 0 && (acc < dists(p - 1) ||
                (acc == dists(p - 1) && cid < cids(p - 1)))) {
              dists(p) = dists(p - 1); cids(p) = cids(p - 1); p -= 1
            }
            dists(p) = acc; cids(p) = cid
            if (filled < n) filled += 1
          }
        }
        c += 1
      }
      new GenericArrayData((0 until filled).map { i =>
        new GenericInternalRow(Array[Any](cids(i), dists(i)))
      }.toArray[Any])
    }
    override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  def argminCentroid(vec: Column, cents: Column): Column =
    GraftColumnBridge.column(VecArgminCentroidExpr(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(cents)))

  def topNCentroid(vec: Column, cents: Column, n: Int): Column =
    GraftColumnBridge.column(VecTopNCentroidExpr(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(cents),
      n))

  def topNCentroidDist(vec: Column, cents: Column, n: Int): Column =
    GraftColumnBridge.column(VecTopNCentroidDistExpr(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(cents),
      n))

  def mmrPicks(cands: Column, lambda: Double, mu: Double, k: Int): Column =
    GraftColumnBridge.column(MmrPicksExpr(
      GraftColumnBridge.expression(cands), lambda, mu, k))
}
