package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom AGGREGATE functions (§2.11 beyond scalar expressions).
  *
  * `TypedImperativeAggregate` is the Catalyst contract for aggregates
  * whose state is an arbitrary JVM object: Spark calls
  * update/merge/serialize on it exactly like a built-in, so the
  * aggregate is MERGEABLE — partials combine map-side per partition,
  * then across the shuffle — which is the property that matters at
  * 100 TB (re-aggregation over days/shards without re-scanning).
  */
object AggregateExpressions {

  /** Bottom-k distinct strings per group — the KMV (k-minimum-values)
    * distinct-count sketch. The buffer is a bounded TreeSet: update
    * inserts only when the value beats the current k-th minimum, so
    * state is O(k) regardless of group size, and merge is a k-way
    * union-trim (commutative, associative, idempotent — safe under
    * partial aggregation and AQE re-planning). Unlike HLL the output
    * is deterministic given the input SET: exactly the k smallest
    * distinct values — so it is exact-testable against any engine,
    * and the (k−1)/F(h_k) estimator derives from it declaratively. */
  case class BottomKStringsAgg(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[String]]
    with UnaryLike[Expression] {

    require(k > 0, "k must be positive")

    override def prettyName: String = "graft_bottom_k_strings"
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false

    override def createAggregationBuffer(): java.util.TreeSet[String] =
      new java.util.TreeSet[String]()

    private def add(b: java.util.TreeSet[String], s: String): Unit =
      if (b.size < k) { b.add(s); () }
      else if (s.compareTo(b.last) < 0 && b.add(s)) { b.pollLast(); () }

    override def update(b: java.util.TreeSet[String],
                        input: InternalRow): java.util.TreeSet[String] = {
      val v = child.eval(input)
      if (v != null) add(b, v.asInstanceOf[UTF8String].toString)
      b
    }

    override def merge(b: java.util.TreeSet[String],
                       o: java.util.TreeSet[String])
        : java.util.TreeSet[String] = {
      o.forEach(s => add(b, s))
      b
    }

    override def eval(b: java.util.TreeSet[String]): Any = {
      val out = new Array[Any](b.size)
      var i = 0
      val it = b.iterator()
      while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
      new GenericArrayData(out)
    }

    // Values are hex digests in practice, but any NUL-free string is
    // safe: '\n' cannot appear in a single collected value because the
    // serialized form is only ever produced/consumed by this class.
    override def serialize(b: java.util.TreeSet[String]): Array[Byte] =
      String.join("\n", b).getBytes(StandardCharsets.UTF_8)

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
      val b = new java.util.TreeSet[String]()
      val s = new String(bytes, StandardCharsets.UTF_8)
      if (s.nonEmpty) s.split("\n", -1).foreach(b.add)
      b
    }

    override def withNewMutableAggBufferOffset(
        newOffset: Int): BottomKStringsAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(
        newOffset: Int): BottomKStringsAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(
        newChild: Expression): BottomKStringsAgg = copy(child = newChild)
  }

  /** Column entry point: bottom-k distinct values of `c` per group. */
  def bottomKStrings(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      BottomKStringsAgg(GraftColumnBridge.expression(c), k)
        .toAggregateExpression())
}
