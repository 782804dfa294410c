package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sorts an `array<bigint>` by (document frequency, value) against a
  * broadcast heavy-hitter table — the global token order that makes All-Pairs
  * prefix filtering survive real corpora (see Dedup.jaccardPairs).
  *
  * Replaces the one Scala UDF the engine had: the UDF paid a
  * Catalyst→Scala `Seq[Long]` conversion (per-element boxing both ways) plus
  * an interpreted closure in the hottest query's map stage. This expression
  * reads the `ArrayData` directly, looks ranks up via primitive binary search
  * over two sorted parallel long arrays, and stays inside WholeStageCodegen —
  * the generated code calls one static helper, so the surrounding
  * shingle→prefix pipeline fuses into a single pass.
  *
  * The table ships as a `Broadcast` (fetched once per executor), not as a
  * plan-serialized literal: at the 1M-entry cap the map is ~16 MB — embedding
  * it in every task closure would multiply serialization by the task count.
  */
case class SortByDfRank(child: Expression,
    table: Broadcast[(Array[Long], Array[Long])])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_df_sort requires array<bigint> input, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_df_sort"

  override def nullSafeEval(a: Any): Any =
    RankSort.sortByRank(a.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dfTable", table,
      classOf[Broadcast[(Array[Long], Array[Long])]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RankSort.sortByRank($c, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RankSort {
  /** (values sorted ascending, df per value) from an unordered (value, df)
    * pair list — the broadcast payload for SortByDfRank. */
  def buildTable(pairs: Array[(Long, Long)]): (Array[Long], Array[Long]) = {
    val sorted = pairs.sortBy(_._1)
    (sorted.map(_._1), sorted.map(_._2))
  }

  /** Sort arr ascending by (df(value), value); unknown values rank df = 1
    * (rarest band, hash order). Called from both interpreted eval and
    * generated code. */
  def sortByRank(arr: ArrayData,
      table: Broadcast[(Array[Long], Array[Long])]): ArrayData = {
    val (keys, dfs) = table.value
    val n = arr.numElements()
    val out = new Array[Long](n)
    var hasHeavy = false
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      out(i) = v
      if (!hasHeavy && java.util.Arrays.binarySearch(keys, v) >= 0) hasHeavy = true
      i += 1
    }
    if (!hasHeavy) {
      // common case at scale: no heavy token in the doc — pure value sort
      java.util.Arrays.sort(out)
    } else {
      val boxed = new Array[java.lang.Long](n)
      i = 0
      while (i < n) { boxed(i) = out(i); i += 1 }
      java.util.Arrays.sort(boxed, new java.util.Comparator[java.lang.Long] {
        override def compare(a: java.lang.Long, b: java.lang.Long): Int = {
          val pa = java.util.Arrays.binarySearch(keys, a.longValue())
          val pb = java.util.Arrays.binarySearch(keys, b.longValue())
          val da = if (pa >= 0) dfs(pa) else 1L
          val db = if (pb >= 0) dfs(pb) else 1L
          if (da != db) java.lang.Long.compare(da, db)
          else java.lang.Long.compare(a.longValue(), b.longValue())
        }
      })
      i = 0
      while (i < n) { out(i) = boxed(i); i += 1 }
    }
    new GenericArrayData(out)
  }

  /** Column builder (bridged Expression→Column, see GraftColumnBridge). */
  def sortByDfRank(c: Column, table: Broadcast[(Array[Long], Array[Long])]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SortByDfRank(org.apache.spark.sql.GraftColumnBridge.expression(c), table))
}
