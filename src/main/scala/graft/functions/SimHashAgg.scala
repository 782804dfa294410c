package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** SimHash aggregate: `graft_simhash(mask64_col, bits)` → long signature.
  *
  * Accumulates per-bit ±1 counts from pre-packed feature bitmasks and emits
  * the sign-bit signature. Replaces `bits` separate conditional-sum
  * aggregate columns (whose generated code compiles for seconds at
  * bits=48); the int-array buffer merges additively, keeping map-side
  * partial aggregation.
  */
case class SimHashAgg(
    child: Expression,
    bits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  require(bits > 0 && bits <= 63, "bits must be in (0, 63]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val mask = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        buf(b) += (((mask >>> b) & 1L).toInt << 1) - 1
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < bits) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sim = 0L
    var b = 0
    while (b < bits) { if (buf(b) > 0) sim |= (1L << b); b += 1 }
    java.lang.Long.valueOf(sim)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 4)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(n: Int): SimHashAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SimHashAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SimHashAgg {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash",
      exprs => SimHashAgg(exprs.head, exprs(1) match {
        case Literal(i: Int, IntegerType) => i
        case other => throw new IllegalArgumentException(
          s"graft_simhash bits must be an int literal, got $other")
      }),
      "built-in")
}
