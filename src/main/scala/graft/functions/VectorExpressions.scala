package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
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

  // Column-level entry points --------------------------------------

  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecDotExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def sqDist(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecSqDistExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecCosineExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
