package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int graftN = Math.min($a.numElements(), $b.numElements());
         |double graftS = 0.0;
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  graftS += $a.getDouble(graftI) * $b.getDouble(graftI);
         |}
         |${ev.value} = graftS;
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
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
}
