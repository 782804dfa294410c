package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for double-array dot products.
  *
  * The `zip_with` + `aggregate` higher-order-function formulation interprets
  * a lambda per element (2M pairs × 64 dims = 128M boxed lambda calls in the
  * near-dup join); this expression is a tight primitive loop with whole-stage
  * codegen — ~20× faster in the embedding-dedup benchmark. Stays inside
  * WholeStageCodegen so the surrounding join/filter pipeline fuses.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName: fixed locals would collide between two graft_dot calls in
    // one codegen scope (non-nullable children get no scoping braces)
    val (vN, vS, vI) =
      (ctx.freshName("dotN"), ctx.freshName("dotS"), ctx.freshName("dotI"))
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int $vN = Math.min($a.numElements(), $b.numElements());
         |double $vS = 0.0;
         |for (int $vI = 0; $vI < $vN; $vI++) {
         |  $vS += $a.getDouble($vI) * $b.getDouble($vI);
         |}
         |${ev.value} = $vS;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All SRP-LSH bucket ids of a vector in one pass: bucket `t` packs the sign
  * bits of `bits` hyperplane projections (planes `t*bits .. t*bits+bits-1`).
  *
  * One expression instead of `tables × bits` separate `graft_dot` columns:
  * the plane matrix lives in a single codegen reference object and the whole
  * `tables·bits·dim` multiply-add loop stays inside WholeStageCodegen — no
  * 120-way expression tree, no per-plane array literals re-evaluated per row.
  * `planes` is row-major `(tables*bits) × dim`, baked into the expression at
  * registration (deterministic md5-derived values — see Similarity.srpPlanes).
  */
case class SrpBuckets(child: Expression, planes: Seq[Double], tables: Int, bits: Int)
    extends UnaryExpression {

  private def dim: Int = planes.length / (tables * bits)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_buckets requires array<double> input, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_srp_buckets"

  @transient private lazy val flatPlanes: Array[Double] = planes.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val d = dim
    val n = math.min(d, x.numElements())
    val pl = flatPlanes
    val out = new Array[Int](tables)
    var off = 0
    var t = 0
    while (t < tables) {
      var bkt = 0
      var j = 0
      while (j < bits) {
        var s = 0.0
        var i = 0
        while (i < n) { s += pl(off + i) * x.getDouble(i); i += 1 }
        if (s > 0) bkt |= (1 << j)
        off += d
        j += 1
      }
      out(t) = bkt
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pl = ctx.addReferenceObj("srpPlanes", flatPlanes, "double[]")
    // freshName throughout: with a non-nullable child nullSafeCodeGen emits
    // no scoping braces, so fixed locals would collide (Janino error →
    // silent interpreted fallback) if the expression appears twice in a stage
    val (vN, vB, vOff, vT, vK, vJ, vS, vI) = (ctx.freshName("srpN"),
      ctx.freshName("srpB"), ctx.freshName("srpOff"), ctx.freshName("srpT"),
      ctx.freshName("srpK"), ctx.freshName("srpJ"), ctx.freshName("srpS"),
      ctx.freshName("srpI"))
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |int $vN = Math.min($dim, $c.numElements());
         |int[] $vB = new int[$tables];
         |int $vOff = 0;
         |for (int $vT = 0; $vT < $tables; $vT++) {
         |  int $vK = 0;
         |  for (int $vJ = 0; $vJ < $bits; $vJ++) {
         |    double $vS = 0.0;
         |    for (int $vI = 0; $vI < $vN; $vI++) {
         |      $vS += $pl[$vOff + $vI] * $c.getDouble($vI);
         |    }
         |    if ($vS > 0) $vK |= (1 << $vJ);
         |    $vOff += $dim;
         |  }
         |  $vB[$vT] = $vK;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($vB);
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Session-level registration + Column builders (SQL-name route keeps us on
  * the public API across Spark 4's Column internals). */
object VectorFunctions {
  private val registered = java.util.Collections.synchronizedSet(
    new java.util.HashSet[String]())

  def register(spark: SparkSession): Unit =
    if (registered.add(spark.sessionState.toString)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_dot", exprs => DotProductD(exprs(0), exprs(1)), "built-in")
    }

  /** dot(a, b) — requires register(spark) once per session. */
  def dot(a: String, b: String): Column = expr(s"graft_dot($a, $b)")

  // per-(session, name): the parameter fingerprint the name was bound with.
  // A plain per-name guard would silently no-op a re-registration carrying
  // DIFFERENT planes/tables/bits, handing callers a wrong-math function.
  private val srpBindings =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Register `name(e)` as SRP bucketing with a fixed plane matrix (row-major
    * `(tables*bits) × dim`) baked into the builder closure. Idempotent for
    * identical parameters; THROWS on an attempt to rebind an existing name
    * to different planes/tables/bits — silently keeping the old matrix (or
    * silently swapping it under plans already built against the name) are
    * both wrong, so the conflict must surface at the call site. */
  def registerSrp(spark: SparkSession, name: String, planes: Seq[Double],
      tables: Int, bits: Int): Unit = {
    val key = spark.sessionState.toString + "#" + name
    val fingerprint: Integer = (planes, tables, bits).hashCode()
    val prev = srpBindings.putIfAbsent(key, fingerprint)
    if (prev == null) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, exprs => SrpBuckets(exprs(0), planes, tables, bits), "built-in")
    } else require(prev == fingerprint,
      s"registerSrp: '$name' is already registered in this session with " +
        "different planes/tables/bits; re-registering would not rebind it. " +
        "Use a distinct function name per parameterisation.")
  }
}
