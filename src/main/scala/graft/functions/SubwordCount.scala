package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword counting against a broadcast vocabulary —
  * the q145 kernel's hot middle (candidate explode → broadcast join →
  * per-position max → fold) collapsed into ONE expression evaluation per
  * distinct word.
  *
  * Why: the relational formulation's candidate fan-out is one substring
  * per DISTINCT VOCAB LENGTH per character, so a learned 32k vocabulary
  * spanning 4 lengths paid ~1.9× the 2-length synthetic table's serve
  * wall at the 1M anchor (round-19 measurement; the round-18 "~20
  * lengths" estimate was wrong — the trained table spans {2,3,4,6}).
  * Here the per-character cost is one hash probe per vocab length
  * (longest first, first hit wins — the same tie-free max-length rule),
  * no candidate row ever materializes, and the whole walk stays inside
  * WholeStageCodegen via a static helper (the [[RankSort]] convention).
  *
  * Semantics are EXACTLY the relational kernel's (kept as
  * `subwordVocabCountsRelational` and pinned ≡ by OperatorSpec): positions
  * and lengths count CODE POINTS (a supplementary-plane char is one
  * step), at each position consume the longest vocab entry matching, else
  * one char counted as a FALLBACK step. Returns [n_subwords, n_fallback].
  *
  * The table ships as a Broadcast (fetched once per executor), never a
  * plan literal — a 256k-entry production vocabulary is MBs that must not
  * serialize per task, and the optimized plan stays byte-flat in entry
  * count (PlanSpec re-pins the q145 claim on this stronger shape). */
case class SubwordCountExpr(child: Expression,
    table: Broadcast[SubwordCount.Table])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_subword_count requires string input, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_subword_count"

  override def nullSafeEval(w: Any): Any =
    SubwordCount.count(w.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subwordTable", table,
      classOf[Broadcast[SubwordCount.Table]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SubwordCount.count($c, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SubwordCount {
  /** Vocab bucketed by code-point length, lengths DESC (longest match
    * probes first). HashSets of java Strings — the probe builds one
    * substring per (position, length) candidate, same count as the
    * relational kernel's explode but in-JVM and join-free. */
  final class Table(val lengths: Array[Int],
      val sets: Array[java.util.HashSet[String]]) extends Serializable

  def buildTable(entries: Seq[String], candLens: Seq[Int]): Table = {
    val allowed = candLens.toSet
    val byLen = entries.groupBy(e => e.codePointCount(0, e.length))
      .filter { case (l, _) => allowed(l) }
    val lens = byLen.keys.toArray.sorted.reverse
    val sets = lens.map { l =>
      val s = new java.util.HashSet[String](byLen(l).size * 2)
      byLen(l).foreach(s.add)
      s
    }
    new Table(lens, sets)
  }

  /** The greedy walk; called from interpreted eval and generated code. */
  def count(w: UTF8String, table: Broadcast[Table]): ArrayData = {
    val t = table.value
    val wd = w.toString
    // code-point boundaries: bounds(p) = UTF-16 index of code point p
    val n = wd.length
    var m = 0
    val bounds = new Array[Int](n + 1)
    var i = 0
    while (i < n) {
      bounds(m) = i
      i += Character.charCount(wd.codePointAt(i))
      m += 1
    }
    bounds(m) = n
    var p = 0
    var nSub = 0L
    var nFb = 0L
    while (p < m) {
      var step = 0
      var li = 0
      while (step == 0 && li < t.lengths.length) {
        val L = t.lengths(li)
        if (p + L <= m &&
            t.sets(li).contains(wd.substring(bounds(p), bounds(p + L))))
          step = L
        li += 1
      }
      if (step == 0) { nFb += 1L; step = 1 }
      nSub += 1L
      p += step
    }
    new GenericArrayData(Array(nSub, nFb))
  }

  /** Column face: `graft_subword_count(wd)` under a broadcast table. */
  def countOf(c: Column, table: Broadcast[Table]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SubwordCountExpr(org.apache.spark.sql.GraftColumnBridge.expression(c), table))
}
