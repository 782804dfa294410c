package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared Bloom arithmetic for the aggregate (build) and expression (probe)
  * sides. Double hashing (Kirsch–Mitzenmacher): position i = h1 + i·h2 over
  * a power-of-two bit space, both hashes splitmix64 finalizers of the input
  * — the standard construction, k probes from one 64-bit input hash.
  *
  * Filter layout is self-describing: word 0 = numHashes, words 1.. = bits.
  * That keeps `graft_bloom_contains(bloom, h)` a two-argument expression —
  * a probe can never run with a k different from the build's.
  */
object BloomUtil {
  @inline def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Set the k positions of x in words (header at 0, bits from word 1). */
  def add(words: Array[Long], x: Long): Unit = {
    val k = words(0).toInt
    val mask = (words.length - 1).toLong * 64 - 1 // numBits is a power of two
    val h1 = mix(x)
    val h2 = mix(x * 0x9e3779b97f4a7c15L + 1) | 1L
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) & mask).toInt
      words(1 + (pos >> 6)) |= (1L << (pos & 63))
      i += 1
    }
  }

  /** Probe — called from generated code too (static forwarder).
    * A malformed filter (no bit words, or a non-positive k that would
    * vacuously claim membership) answers false rather than reading out of
    * bounds / over-claiming: containment claims must come from real bits. */
  def contains(arr: ArrayData, x: Long): Boolean = {
    if (arr.numElements() < 2) return false
    val k = arr.getLong(0).toInt
    if (k <= 0) return false
    val mask = (arr.numElements() - 1).toLong * 64 - 1
    val h1 = mix(x)
    val h2 = mix(x * 0x9e3779b97f4a7c15L + 1) | 1L
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) & mask).toInt
      if ((arr.getLong(1 + (pos >> 6)) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** `graft_bloom_agg(hash64_col, numBits, numHashes)` → array<long> Bloom
  * filter (header word + bit words) over a group's 64-bit hashes.
  *
  * The membership-sketch side of incremental ingest dedup: at 100 TB the
  * corpus fingerprint set cannot be broadcast exactly, but its Bloom filter
  * is numBits/8 bytes regardless of corpus size (2³³ bits = 1 GiB covers
  * ~10¹⁰ fingerprints at 3 hashes / ~8% FP — and the filter only PRUNES;
  * exact verification follows, so false positives cost work, never
  * correctness). Partial aggregation applies: per-partition filters OR-merge
  * (`merge`), so the shuffle carries one filter per partition, and a
  * steady-state ingest pipeline persists the filter and OR-merges each new
  * batch instead of rebuilding.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"graft_bloom_agg numBits must be a power of two >= 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"graft_bloom_agg numHashes must be in [1,16], got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bloom_agg"

  override def createAggregationBuffer(): Array[Long] = {
    val words = new Array[Long](1 + numBits / 64)
    words(0) = numHashes.toLong
    words
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 1
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): BloomAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `graft_bloom_contains(bloom, hash64)` → boolean. Codegen'd so the probe
  * fuses into the scan's WholeStageCodegen — the 100 TB ingest path filters
  * every fresh row map-side against the broadcast filter with two splitmix64
  * mixes + k word loads, no join machinery. */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains requires (array<bigint>, bigint), got $l / $r")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(a: Any, b: Any): Any =
    BloomUtil.contains(a.asInstanceOf[ArrayData], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static forwarder call — the loop body is tiny and JIT-inlined; what
    // matters is staying inside the surrounding WholeStageCodegen stage
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BloomUtil.contains($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BloomAgg {
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"graft_bloom_agg $what must be an int literal, got $other")
  }

  /** Register `graft_bloom_agg(col, numBits, numHashes)` and
    * `graft_bloom_contains(bloom, hash64)` in the session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => BloomAgg(exprs.head, intLit(exprs(1), "numBits"),
        intLit(exprs(2), "numHashes")),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      exprs => BloomContains(exprs(0), exprs(1)),
      "built-in")
  }
}
