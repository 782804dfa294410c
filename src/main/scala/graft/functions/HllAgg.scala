package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Deterministic HyperLogLog register arithmetic, shared by the build
  * aggregate, the sketch-merge aggregate, and the stats expression.
  *
  * p = 12 → m = 4096 one-byte registers; a sketch is a 4 KiB byte array
  * regardless of input cardinality — THE cardinality-at-100-TB shape: the
  * shuffle carries one 4 KiB buffer per partition (partial aggregation
  * merges registers element-wise), never a distinct-keyed exchange.
  *
  * Determinism contract (what makes the DuckDB oracle hashable): the
  * (bucket, rho) pair is derived OUTSIDE the aggregate from md5(text) hex —
  * portable string ops both engines share (q22/q43 convention) — and every
  * register op here is an integer max. rho is capped at [[HllUtil.RhoCap]]
  * (< 52) so the register sum Σ 2^(Cap−M[b]) stays an exact BIGINT:
  * m·2^Cap = 2^62 < 2^63. The estimate is then a handful of correctly
  * rounded IEEE double ops on identical integer inputs — bit-equal across
  * engines, no libm anywhere (q56's lesson: no log in the hashed output).
  */
object HllUtil {
  val P: Int = 12
  val M: Int = 1 << P        // 4096 registers
  val RhoCap: Int = 50       // keeps m·2^RhoCap inside signed 64-bit
  val ScalePow: Long = 1L << RhoCap

  def newSketch(): Array[Byte] = new Array[Byte](M)

  def update(buf: Array[Byte], bucket: Long, rho: Long): Unit = {
    if (bucket >= 0 && bucket < M) {
      val r = (if (rho > RhoCap) RhoCap else if (rho < 0) 0 else rho).toByte
      if (r > buf(bucket.toInt)) buf(bucket.toInt) = r
    }
  }

  def mergeInto(a: Array[Byte], b: Array[Byte]): Unit = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
  }

  /** (v_empty, s_scaled): empty-register count and the exact integer
    * Σ_b 2^(RhoCap − M[b]) — the harmonic-mean denominator scaled by
    * 2^RhoCap so it sums as a BIGINT (order-independent).
    *
    * A wrong-length buffer fails LOUDLY here and in the merge below: a
    * sketch is a claim about cardinality, and silently skipping or padding
    * a malformed one would produce a confidently wrong estimate (contrast
    * BloomUtil.contains, where answering false on garbage merely costs
    * work — membership false negatives there would be wrong, and false on
    * malformed input is the conservative direction; for HLL there is no
    * conservative direction). */
  def stats(buf: Array[Byte]): (Long, Long) = {
    require(buf.length == M,
      s"malformed HLL sketch: ${buf.length} registers, expected $M")
    var v = 0L; var s = 0L; var i = 0
    while (i < M) {
      if (buf(i) == 0) v += 1
      s += (1L << (RhoCap - buf(i)))
      i += 1
    }
    (v, s)
  }
}

/** `graft_hll_agg(bucket, rho)` → binary HLL sketch (4096 registers) over a
  * group's pre-hashed (bucket, rho) pairs. Partial aggregation applies:
  * per-partition sketches max-merge, so a distinct-cardinality estimate
  * over 100 TB shuffles one 4 KiB buffer per partition. */
case class HllAgg(
    bucket: Expression,
    rho: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(bucket, rho)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_hll_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    (bucket.dataType, rho.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (b, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_hll_agg requires (bigint, bigint), got $b / $r")
    }

  override def createAggregationBuffer(): Array[Byte] = HllUtil.newSketch()

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val b = bucket.eval(input)
    val r = rho.eval(input)
    if (b != null && r != null)
      HllUtil.update(buf, b.asInstanceOf[Long], r.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    HllUtil.mergeInto(a, b); a
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(n: Int): HllAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(bucket = newChildren(0), rho = newChildren(1))
}

/** `graft_hll_merge(sketch)` → binary: element-wise max over already-built
  * sketches — the MERGE half of the sketch algebra. A corpus-wide estimate
  * is the merge of per-source sketches (no second corpus pass), and a
  * steady-state ingest pipeline persists per-batch sketches and merges on
  * read, exactly like the q65 Bloom convention. */
case class HllMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_hll_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hll_merge requires binary, got $t")
  }

  override def createAggregationBuffer(): Array[Byte] = HllUtil.newSketch()

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val b = v.asInstanceOf[Array[Byte]]
      // fail loudly, never skip: a silently dropped sketch is a silently
      // low cardinality estimate (see HllUtil.stats)
      require(b.length == HllUtil.M,
        s"graft_hll_merge: malformed sketch of ${b.length} bytes, expected ${HllUtil.M}")
      HllUtil.mergeInto(buf, b)
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    HllUtil.mergeInto(a, b); a
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(n: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `graft_hll_stats(sketch)` → struct(v_empty bigint, s_scaled bigint).
  * Runs on one row per group (the sketch rows), so interpreted eval with a
  * static-forwarder codegen is plenty; the estimate itself is left to the
  * caller as plain double arithmetic so the oracle SQL states the same
  * formula textually. */
case class HllStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hll_stats requires binary, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("v_empty", LongType, nullable = false),
    StructField("s_scaled", LongType, nullable = false)))
  override def prettyName: String = "graft_hll_stats"

  override def nullSafeEval(input: Any): Any = {
    val (v, s) = HllUtil.stats(input.asInstanceOf[Array[Byte]])
    InternalRow(v, s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"graft.functions.HllStats.statsRow($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HllStats {
  /** Static forwarder for generated code. */
  def statsRow(buf: Array[Byte]): InternalRow = {
    val (v, s) = HllUtil.stats(buf)
    InternalRow(v, s)
  }
}

object HllAgg {
  /** Register the sketch algebra in the session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll_agg", exprs => HllAgg(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll_merge", exprs => HllMergeAgg(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll_stats", exprs => HllStats(exprs.head), "built-in")
  }
}
