package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter as a mergeable Catalyst aggregate + membership test.
  *
  * The 100 TB decontamination shape: the benchmark side reduces to a
  * fixed-size bitmap (one `BloomFilterAgg` row, merged map-side like
  * any partial aggregate), the bitmap broadcasts, and the corpus is
  * prefiltered MAP-SIDE with `bloomMightContain` before the exact
  * confirm join. A Bloom filter has NO false negatives, so
  * prefilter + exact join ≡ exact join — the query stays oracle-exact
  * while the corpus-side shuffle shrinks from every document to only
  * bloom-positive ones (FP rate ~ (1-e^(-kn/m))^k; false positives
  * cost only wasted confirm work, never wrong output).
  *
  * Hashing is Kirsch–Mitzenmacher double hashing over two FNV-1a-64
  * variants: bit_i = (h1 + i·h2) mod m, m a power of two. Both the
  * aggregate and the membership expression use `BloomHash` — one
  * definition, no cross-engine drift. Reference for the semantics this
  * accelerates: benchmark n-gram decontamination as in
  * cassandra_fs_pp's exact duplicate drops (fs_pp.py:98-103), lifted
  * to the corpus/benchmark split of an LLM training pipeline.
  */
object BloomExpressions {

  private[functions] object BloomHash {
    private final val Prime = 0x100000001b3L
    private final val Basis = 0xcbf29ce484222325L

    // Word 0 of every bitmap is a self-describing header:
    // magic "GBLM" in the high 32 bits | format version | k in the low
    // 16. The probe reads k from the sketch itself (as Spark's own
    // BloomFilterAggregate serializes numHashFunctions), so a probe
    // can never run with a different k than the build — which would
    // silently void the no-false-negative guarantee the
    // decontamination gate's safety argument rests on.
    private final val Magic = 0x47424C4DL // "GBLM"
    final val Version = 1L

    def header(k: Int): Long = (Magic << 32) | (Version << 16) | k.toLong

    /** Extract k from a header word; reject anything that is not a
      * graft bloom bitmap (wrong magic / version / absurd k). */
    def headerK(h: Long): Int = {
      require((h >>> 32) == Magic && ((h >>> 16) & 0xffffL) == Version,
        f"not a graft bloom bitmap (header 0x$h%016x): probe input must " +
          "be the unmodified output of graft_bloom_filter")
      (h & 0xffffL).toInt
    }

    private def fnv(bytes: Array[Byte], basis: Long): Long = {
      var h = basis
      var i = 0
      while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= Prime; i += 1 }
      h
    }

    // splitmix64 finalizer: full-avalanche bit mix, so h2 carries no
    // linear relationship to h1 — the Kirsch–Mitzenmacher double-hash
    // scheme needs the two to be independent or the FP rate inflates.
    private def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }

    /** Set/test positions for `s` in an m-bit filter (m = words·64,
      * power of two), k probes via double hashing. */
    def positions(s: UTF8String, numWords: Int, k: Int): Array[Int] = {
      val bytes = s.getBytes
      val m = numWords.toLong * 64L
      val h1 = fnv(bytes, Basis)
      val h2 = mix(h1) | 1L // odd step → full-period probing
      val out = new Array[Int](k)
      var i = 0
      while (i < k) {
        out(i) = (((h1 + i * h2) % m + m) % m).toInt
        i += 1
      }
      out
    }

    /** Membership test against a header-carrying bitmap: k comes from
      * word 0, the filter bits live in words 1..n. */
    def test(words: ArrayData, s: UTF8String): Boolean = {
      val k = headerK(words.getLong(0))
      val ps = positions(s, words.numElements() - 1, k)
      var i = 0
      while (i < ps.length) {
        val p = ps(i)
        if ((words.getLong(1 + (p >>> 6)) & (1L << (p & 63))) == 0L)
          return false
        i += 1
      }
      true
    }
  }

  /** Builds an m-bit Bloom filter over the child strings. Buffer is a
    * fixed Array[Long]; update sets k bits, merge is a word-wise OR —
    * commutative/associative/idempotent, so partial aggregation and
    * AQE re-planning are safe. Output: array<bigint> of m/64 + 1 words —
    * word 0 is the self-describing header (magic | version | k). */
  case class BloomFilterAgg(
      child: Expression, numBits: Int, numHashes: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

    // AbstractDataType (the ExpectsInputTypes route) is private[sql];
    // an explicit check gives the same analysis-time failure.
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case _: StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string child, got ${other.catalogString}")
      }

    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      "numBits must be a power of two >= 64")
    require(numHashes > 0 && numHashes <= 0xffff,
      "numHashes must be in [1, 65535] (k is stored in a 16-bit header field)")
    private def numWords: Int = numBits / 64

    override def prettyName: String = "graft_bloom_filter"
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false

    // Buffer layout: [header | filter words]. The header travels with
    // every partial, so merge and the final probe are self-describing.
    override def createAggregationBuffer(): Array[Long] = {
      val b = new Array[Long](numWords + 1)
      b(0) = BloomHash.header(numHashes)
      b
    }

    override def update(b: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val ps = BloomHash.positions(
          v.asInstanceOf[UTF8String], numWords, numHashes)
        var i = 0
        while (i < ps.length) {
          val p = ps(i)
          b(1 + (p >>> 6)) |= 1L << (p & 63)
          i += 1
        }
      }
      b
    }

    override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
      require(b(0) == o(0), "bloom partials built with different params")
      var i = 1
      while (i < b.length) { b(i) |= o(i); i += 1 }
      b
    }

    override def eval(b: Array[Long]): Any =
      new GenericArrayData(b.map(x => x: Any))

    override def serialize(b: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(b.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      bb.asLongBuffer().put(b)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val out = new Array[Long](bytes.length / 8)
      ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        .asLongBuffer().get(out)
      out
    }

    override def withNewMutableAggBufferOffset(n: Int): BloomFilterAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): BloomFilterAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(
        newChild: Expression): BloomFilterAgg = copy(child = newChild)
  }

  /** Membership probe against a `BloomFilterAgg` bitmap. True → maybe
    * present (confirm exactly downstream); false → DEFINITELY absent.
    * k is read from the bitmap's header word, never supplied by the
    * caller — a mismatched probe cannot be expressed. */
  case class BloomMightContainExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
    override def prettyName: String = "graft_bloom_might_contain"
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), _: StringType) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, string), got " +
            s"(${l.catalogString}, ${r.catalogString})")
      }
    protected override def nullSafeEval(bits: Any, v: Any): Any =
      BloomHash.test(bits.asInstanceOf[ArrayData],
        v.asInstanceOf[UTF8String])
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Column entry points. `numBits` power of two; the probe reads
    * `numHashes` back out of the bitmap header. */
  def bloomFilter(c: Column, numBits: Int, numHashes: Int): Column =
    GraftColumnBridge.column(
      BloomFilterAgg(GraftColumnBridge.expression(c), numBits, numHashes)
        .toAggregateExpression())

  def bloomMightContain(bits: Column, v: Column): Column =
    GraftColumnBridge.column(BloomMightContainExpr(
      GraftColumnBridge.expression(bits),
      GraftColumnBridge.expression(v)))

  /** The header word a bitmap built with `numHashes` carries in word
    * 0 — for persisted-bitmap compatibility guards (a standing sketch
    * outlives the code that built it). */
  def headerWord(numHashes: Int): Long = BloomHash.header(numHashes)
}
