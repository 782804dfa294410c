package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_cov(cx, d)` → array<long> of d² fixed-point second-moment sums:
  * cell (i, j) accumulates Σ_rows floor(cx[i]·cx[j]·10⁶) as a BIGINT.
  *
  * The covariance/Gram-matrix aggregate behind PCA at 100 TB: a naive
  * formulation explodes every row into d² (i, j, product) records before a
  * grouped aggregate — n·4096 generated rows at d = 64 — while this buffer
  * walks the d² products in a tight primitive loop and the shuffle carries
  * ONE d²-long array per partition (32 KiB at d = 64), the q96-sketch
  * shape applied to dense linear algebra.
  *
  * Fixed-point floor BEFORE the Σ is what makes the matrix hashable: the
  * per-cell sum is an integer, order-independent on any partition layout
  * and bit-equal to the oracle's SQL Σ (q64's trick). Overflow bound: with
  * per-row |term| ≲ 2.5e7 (unit-variance data) the BIGINT cell holds to
  * ~3·10¹¹ rows; beyond that shard the aggregate and sum shards as
  * DECIMAL(38,0) — same convention as the other fixed-point aggregates.
  * The bound is ENFORCED, not prose (the repo's fail-loud convention, cf.
  * HllUtil.stats): update rejects components with |x| > 1e6 (beyond which
  * the per-row floor(x_i·x_j·10⁶) term itself could exceed Long range and
  * Double→Long conversion would SATURATE silently), and both the cell
  * accumulation and partial merge use Math.addExact so a wrapped sum
  * raises ArithmeticException instead of shipping a wrong Gram matrix. */
case class CovAgg(
    child: Expression,
    d: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(d >= 1 && d <= 512, s"graft_cov d must be in [1,512], got $d")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cov"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cov requires array<double>, got $t")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * d)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"graft_cov: row has ${arr.numElements()} dims, expected $d")
      val x = arr.toDoubleArray()
      var i = 0
      while (i < d) {
        val xi = x(i)
        // |x| ≤ 1e6 keeps every floor(x_i·x_j·1e6) term within Long range
        // (≤ 1e18 < 2⁶³) — beyond it the Double→Long conversion saturates
        // silently, so reject loudly instead (NaN fails this check too)
        require(math.abs(xi) <= 1e6,
          s"graft_cov: |component| ${xi} exceeds the 1e6 fixed-point bound")
        val row = i * d
        var j = 0
        while (j < d) {
          buf(row + j) = Math.addExact(buf(row + j),
            math.floor(xi * x(j) * 1000000.0).toLong)
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
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

  override def withNewMutableAggBufferOffset(n: Int): CovAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CovAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CovAgg {
  /** Register `graft_cov(cx, d)` in the session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cov",
      exprs => CovAgg(exprs(0), exprs(1) match {
        case Literal(i: Int, IntegerType) => i
        case other => throw new IllegalArgumentException(
          s"graft_cov d must be an int literal, got $other")
      }),
      "built-in")
}
