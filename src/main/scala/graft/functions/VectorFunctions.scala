package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

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

/** The k nearest centroids of a vector in ONE native pass:
  * `graft_near_cells(e, cents, k)` over the one-row broadcast centroid set
  * `cents: array<struct<cent_id: long, ce: array<double>>>` returns the k
  * lexicographically-(distance, cent_id)-smallest entries as
  * `array<struct<_d: double, cent_id: long>>`, ascending.
  *
  * Drop-in for the HOF formulation
  * `slice(array_sort(transform(cents, c -> struct(d, c.cent_id))), 1, k)`:
  * higher-order lambdas evaluate interpreted PER ELEMENT — at nlist = 256
  * that's nlist struct allocations + an O(nlist log nlist) interpreted sort
  * per row, which dominated the kNN-graph anchor runs (the argmin/probe
  * passes, not the candidate join, were the cost at 100k vectors). This is
  * a tight primitive loop with an O(nlist·k) bounded insertion — no
  * allocation until the k-row result.
  *
  * BIT-IDENTICAL to the HOF expression it replaces: the distance is the
  * same `dot(e,e) - 2*dot(e,ce) + dot(ce,ce)` left-to-right IEEE chain
  * with [[DotProductD]]'s min-length loop bounds, and the (distance,
  * cent_id) tie order matches struct ordering under array_min/array_sort.
  * (-0.0/NaN cannot arise here: squared-distance sums of finite inputs;
  * a NaN would sort last, matching Spark's double order.) Interpreted
  * eval (CodegenFallback) is deliberate — the per-row nlist·dim loop
  * dwarfs the call overhead, and the surrounding stage still codegens. */
case class NearCells(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(DoubleType, _) => second.dataType match {
      case ArrayType(StructType(fs), _)
        if fs.length == 2 && fs(0).dataType == LongType &&
          fs(1).dataType == ArrayType(DoubleType, false) ||
          fs.length == 2 && fs(0).dataType == LongType &&
            fs(1).dataType == ArrayType(DoubleType, true) =>
        if (third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("k must be INT")
      case t => TypeCheckResult.TypeCheckFailure(
        s"cents must be array<struct<bigint, array<double>>>, got $t")
    }
    case t => TypeCheckResult.TypeCheckFailure(s"e must be array<double>, got $t")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_d", DoubleType, nullable = false),
    StructField("cent_id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_near_cells"

  override def nullSafeEval(eAny: Any, cAny: Any, kAny: Any): Any = {
    val e = eAny.asInstanceOf[ArrayData]
    val cents = cAny.asInstanceOf[ArrayData]
    val k = kAny.asInstanceOf[Int]
    val dim = e.numElements()
    var ee = 0.0
    var i = 0
    while (i < dim) { val v = e.getDouble(i); ee += v * v; i += 1 }
    val n = cents.numElements()
    val m = math.min(k, n)
    val ds = new Array[Double](m)
    val ids = new Array[Long](m)
    var size = 0
    var ci = 0
    while (ci < n) {
      val row = cents.getStruct(ci, 2)
      val id = row.getLong(0)
      val ce = row.getArray(1)
      val lc = ce.numElements()
      val le = math.min(dim, lc)
      var ec = 0.0
      var j = 0
      while (j < le) { ec += e.getDouble(j) * ce.getDouble(j); j += 1 }
      var cc2 = 0.0
      j = 0
      while (j < lc) { val c = ce.getDouble(j); cc2 += c * c; j += 1 }
      val d = ee - 2 * ec + cc2
      // skip unless it beats the current worst (or the buffer has room)
      val worse = size == m && m > 0 &&
        (d > ds(m - 1) || (d == ds(m - 1) && id > ids(m - 1)))
      if (m > 0 && !worse) {
        var lo = math.min(size, m - 1)
        while (lo > 0 && (ds(lo - 1) > d || (ds(lo - 1) == d && ids(lo - 1) > id))) lo -= 1
        var p = math.min(size, m - 1)
        while (p > lo) { ds(p) = ds(p - 1); ids(p) = ids(p - 1); p -= 1 }
        ds(lo) = d
        ids(lo) = id
        if (size < m) size += 1
      }
      ci += 1
    }
    val out = new Array[Any](size)
    i = 0
    while (i < size) {
      out(i) = new GenericInternalRow(Array[Any](ds(i), ids(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** [[NearCells]] for the PQ codebook layout: `graft_pq_near(se, cs, m, k)`
  * ranks only the rows of `cs: array<struct<m: int, cent_id: long,
  * ce: array<double>>>` whose subspace tag equals `m` — the native
  * replacement for `array_min(transform(filter(cs, c -> c.m = m), ...))`,
  * whose interpreted filter alone evaluates a lambda per codebook row per
  * vector row (M·K per subspace assign — the dominant cost of PQ encode at
  * 1M vectors). Same distance chain, same (distance, cent_id) tie order,
  * same output shape as [[NearCells]]; bit-identical results. */
case class PqNearCells(se: Expression, cs: Expression, m: Expression, k: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(se, cs, m, k)
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = se.dataType match {
    case ArrayType(DoubleType, _) => cs.dataType match {
      case ArrayType(StructType(fs), _)
        if fs.length == 3 && fs(0).dataType == IntegerType &&
          fs(1).dataType == LongType &&
          fs(2).dataType.isInstanceOf[ArrayType] &&
          fs(2).dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
        if (m.dataType == IntegerType && k.dataType == IntegerType)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("m and k must be INT")
      case t => TypeCheckResult.TypeCheckFailure(
        s"cs must be array<struct<int, bigint, array<double>>>, got $t")
    }
    case t => TypeCheckResult.TypeCheckFailure(s"se must be array<double>, got $t")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_d", DoubleType, nullable = false),
    StructField("cent_id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_pq_near"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val eAny = se.eval(input)
    val cAny = cs.eval(input)
    val mAny = m.eval(input)
    val kAny = k.eval(input)
    if (eAny == null || cAny == null || mAny == null || kAny == null) return null
    val e = eAny.asInstanceOf[ArrayData]
    val cents = cAny.asInstanceOf[ArrayData]
    val mTag = mAny.asInstanceOf[Int]
    val kk = kAny.asInstanceOf[Int]
    val dim = e.numElements()
    var ee = 0.0
    var i = 0
    while (i < dim) { val v = e.getDouble(i); ee += v * v; i += 1 }
    val n = cents.numElements()
    val cap = math.min(kk, n)
    val ds = new Array[Double](math.max(cap, 0))
    val ids = new Array[Long](math.max(cap, 0))
    var size = 0
    var ci = 0
    while (ci < n) {
      val row = cents.getStruct(ci, 3)
      if (row.getInt(0) == mTag) {
        val id = row.getLong(1)
        val ce = row.getArray(2)
        val lc = ce.numElements()
        val le = math.min(dim, lc)
        var ec = 0.0
        var j = 0
        while (j < le) { ec += e.getDouble(j) * ce.getDouble(j); j += 1 }
        var cc2 = 0.0
        j = 0
        while (j < lc) { val c = ce.getDouble(j); cc2 += c * c; j += 1 }
        val d = ee - 2 * ec + cc2
        val worse = size == cap && cap > 0 &&
          (d > ds(cap - 1) || (d == ds(cap - 1) && id > ids(cap - 1)))
        if (cap > 0 && !worse) {
          var lo = math.min(size, cap - 1)
          while (lo > 0 && (ds(lo - 1) > d || (ds(lo - 1) == d && ids(lo - 1) > id))) lo -= 1
          var p = math.min(size, cap - 1)
          while (p > lo) { ds(p) = ds(p - 1); ids(p) = ids(p - 1); p -= 1 }
          ds(lo) = d
          ids(lo) = id
          if (size < cap) size += 1
        }
      }
      ci += 1
    }
    val out = new Array[Any](size)
    i = 0
    while (i < size) {
      out(i) = new GenericInternalRow(Array[Any](ds(i), ids(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      cs2: IndexedSeq[Expression]): Expression =
    copy(se = cs2(0), cs = cs2(1), m = cs2(2), k = cs2(3))
}

/** `graft_cos_hits(e, nrm, ev, tau)` — the q151 semantic-decontamination
  * fold as one primitive loop: over `ev: array<struct<eid: long,
  * ee: array<double>, en: double>>` (the broadcast eval set), compute
  * per-pair `round(dot(e, ee) / (nrm * en), 6)` and fold the threshold
  * hits into ONE struct `(witness_eval_id, max_sim, n_over)` — min eid,
  * max rounded sim, hit count; `n_over = 0` marks a clean row (the caller
  * filters on it, so no null handling leaks into the gate).
  *
  * BIT-IDENTICAL to the HOF chain it replaces
  * (`filter(transform(ev, …round(graft_dot…)…))` + array_min/array_max/
  * size): the dot is [[DotProductD]]'s left-to-right min-length loop and
  * the rounding replicates Spark's `Round(double, 6)` exactly —
  * `java.math.BigDecimal.valueOf` (= scala `BigDecimal(d)` for doubles:
  * `Double.toString`-based, never rounds under DECIMAL128) + HALF_UP.
  * The HOF version materialized a 100-struct array per train row and
  * walked it four times through interpreted lambdas (measured 40.4 s at
  * 100k×100); this loop allocates once per row. CodegenFallback is
  * deliberate — per-row |ev|·dim work dwarfs the call overhead and the
  * surrounding scan/filter stage still codegens. */
case class CosineHits(e: Expression, nrm: Expression, ev: Expression,
    tau: Expression) extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(e, nrm, ev, tau)
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = e.dataType match {
    case ArrayType(DoubleType, _) => ev.dataType match {
      case ArrayType(StructType(fs), _)
        if fs.length == 3 && fs(0).dataType == LongType &&
          fs(1).dataType.isInstanceOf[ArrayType] &&
          fs(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
          fs(2).dataType == DoubleType =>
        if (nrm.dataType == DoubleType && tau.dataType == DoubleType)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("nrm and tau must be DOUBLE")
      case t => TypeCheckResult.TypeCheckFailure(
        s"ev must be array<struct<bigint, array<double>, double>>, got $t")
    }
    case t => TypeCheckResult.TypeCheckFailure(s"e must be array<double>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("witness_eval_id", LongType, nullable = false),
    StructField("max_sim", DoubleType, nullable = false),
    StructField("n_over", LongType, nullable = false)))
  override def prettyName: String = "graft_cos_hits"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val eAny = e.eval(input)
    val nAny = nrm.eval(input)
    val vAny = ev.eval(input)
    val tAny = tau.eval(input)
    if (eAny == null || nAny == null || vAny == null || tAny == null) return null
    val ea = eAny.asInstanceOf[ArrayData]
    val en0 = nAny.asInstanceOf[Double]
    val evs = vAny.asInstanceOf[ArrayData]
    val t = tAny.asInstanceOf[Double]
    val dim = ea.numElements()
    var wit = -1L
    var ms = Double.NegativeInfinity
    var n = 0L
    var i = 0
    val m = evs.numElements()
    while (i < m) {
      val row = evs.getStruct(i, 3)
      val ee = row.getArray(1)
      val le = math.min(dim, ee.numElements())
      var dot = 0.0
      var j = 0
      while (j < le) { dot += ea.getDouble(j) * ee.getDouble(j); j += 1 }
      val sim = java.math.BigDecimal.valueOf(dot / (en0 * row.getDouble(2)))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      if (sim >= t) {
        val id = row.getLong(0)
        if (n == 0L || id < wit) wit = id
        if (sim > ms) ms = sim
        n += 1L
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](wit, if (n == 0L) 0.0 else ms, n))
  }

  override protected def withNewChildrenInternal(
      cs2: IndexedSeq[Expression]): Expression =
    copy(e = cs2(0), nrm = cs2(1), ev = cs2(2), tau = cs2(3))
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
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_near_cells", exprs => NearCells(exprs(0), exprs(1), exprs(2)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_pq_near", exprs => PqNearCells(exprs(0), exprs(1), exprs(2), exprs(3)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_cos_hits", exprs => CosineHits(exprs(0), exprs(1), exprs(2), exprs(3)), "built-in")
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
