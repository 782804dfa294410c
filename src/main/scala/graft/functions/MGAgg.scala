package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter sketch: `graft_mg(item, capacity)` → the
  * sketch's surviving items as `array<string>` (sorted, for a stable
  * render). The structural guarantee — the reason this is gateable — is
  * the SUPERSET property: any item whose true count exceeds
  * N/(capacity+1) is guaranteed to survive, on any partition layout and
  * any merge order (Misra–Gries 1982; mergeability and the COMPRESS rule
  * per Agarwal et al., "Mergeable Summaries", PODS'12). Which EXTRA items
  * survive is layout-dependent, so the sketch output itself is never
  * hashed; callers exact-count the candidates in a second pass and
  * threshold there (q92's shape), which makes the final answer
  * deterministic regardless of sketch internals.
  *
  * The 100 TB shape: a full `groupBy(token)` materializes one shuffle row
  * per DISTINCT token — at web-corpus vocabulary sizes (billions of
  * n-grams) that is the dominant cost even though only a handful of items
  * can possibly be heavy. The sketch carries at most 2·capacity entries
  * per partition through the partial/final combine (one tiny object per
  * task on the wire), and the verify pass only shuffles rows whose token
  * is in the broadcast candidate set — O(candidates) keys, not
  * O(vocabulary).
  *
  * Implementation is insert-then-compress: every row increments or
  * inserts (O(1) hash update); when the map reaches 2·capacity, COMPRESS
  * subtracts the (capacity+1)-th largest count from every entry and drops
  * the non-positive, shrinking back to ≤ capacity live entries. Each
  * compress removes ≥ d·(capacity+1) total mass while adding ≤ d to any
  * item's undercount, which is what yields the N/(capacity+1) bound —
  * amortized O(log capacity) per row, O(capacity) memory, and the same
  * rule serves as the merge's shrink so partial/final behavior cannot
  * diverge. Nulls are skipped by contract.
  */
case class MGAgg(
    item: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGAgg.Buffer] with ImplicitCastInputTypes {

  require(capacity >= 1, s"graft_mg capacity must be >= 1, got $capacity")

  override def children: Seq[Expression] = Seq(item)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_mg"

  override def createAggregationBuffer(): MGAgg.Buffer = new MGAgg.Buffer()

  override def update(buf: MGAgg.Buffer, input: InternalRow): MGAgg.Buffer = {
    val v = item.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[UTF8String]
    val cur = buf.counts.getOrElse(key, 0L)
    // UTF8String from an input row is backed by reused memory — clone on
    // first insert, never on increment
    if (cur == 0L) buf.counts.update(key.clone(), 1L)
    else buf.counts.update(key, cur + 1L)
    if (buf.counts.size >= 2 * capacity) buf.compress(capacity)
    buf
  }

  override def merge(a: MGAgg.Buffer, b: MGAgg.Buffer): MGAgg.Buffer = {
    b.counts.foreach { case (k, v) =>
      val cur = a.counts.getOrElse(k, 0L)
      if (cur == 0L) a.counts.update(k.clone(), v)
      else a.counts.update(k, cur + v)
    }
    if (a.counts.size > capacity) a.compress(capacity)
    a
  }

  override def eval(buf: MGAgg.Buffer): Any = {
    if (buf.counts.size > capacity) buf.compress(capacity)
    val live = buf.counts.keysIterator.toArray.sortBy(_.toString)
    new GenericArrayData(live.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: MGAgg.Buffer): Array[Byte] = {
    val entries = buf.counts.toArray
    val payload = entries.map { case (k, _) => k.getBytes }
    val size = 4 + entries.length * 12 + payload.map(_.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    var i = 0
    while (i < entries.length) {
      bb.putInt(payload(i).length); bb.put(payload(i)); bb.putLong(entries(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MGAgg.Buffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len); bb.get(kb)
      buf.counts.update(UTF8String.fromBytes(kb), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): MGAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MGAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
}

object MGAgg {
  final class Buffer {
    val counts: scala.collection.mutable.HashMap[UTF8String, Long] =
      scala.collection.mutable.HashMap.empty

    /** COMPRESS (Mergeable Summaries): subtract the (capacity+1)-th
      * largest count from EVERY entry, drop the non-positive — at most
      * `capacity` entries survive (only values strictly above the
      * (capacity+1)-th largest can stay positive). The subtraction is
      * load-bearing: the top capacity+1 entries each pay exactly d, so
      * every compress removes ≥ d·(capacity+1) mass while any single
      * item's undercount grows by ≤ d — summed over the stream that is
      * the N/(capacity+1) error bound behind the superset guarantee. */
    def compress(capacity: Int): Unit = {
      if (counts.size <= capacity) return
      val vs = counts.values.toArray
      java.util.Arrays.sort(vs)
      val d = vs(vs.length - (capacity + 1))
      counts.filterInPlace { case (_, v) => v > d }
      counts.mapValuesInPlace { case (_, v) => v - d }
    }
  }

  /** Register `graft_mg(item, capacity)` in the session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_mg",
      exprs => MGAgg(exprs(0), exprs(1) match {
        case Literal(i: Int, IntegerType) => i
        case other => throw new IllegalArgumentException(
          s"graft_mg capacity must be an int literal, got $other")
      }),
      "built-in")
}
