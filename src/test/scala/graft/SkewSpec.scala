package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Salted shuffles must be result-identical to their unsalted equivalents. */
class SkewSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("salted aggregation equals plain aggregation") {
    val spark = TestSpark.spark
    val li = Tables.lineitem(spark, sf)
    val salted = Skew.saltedSumAgg(li, col("l_returnflag"),
        col("l_quantity").cast("decimal(18,2)"), col("l_orderkey"), 16)
      .select(col("k"), col("total").cast("double"))
      .orderBy("k").collect().map(_.toSeq)
    val plain = li.groupBy(col("l_returnflag").as("k"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy("k").collect().map(_.toSeq)
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join equals plain equi-join") {
    val spark = TestSpark.spark
    val orders = Tables.orders(spark, sf)
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val salted = Skew.saltedJoin(orders, cust, "o_custkey", col("o_orderkey"), 8)
      .select("o_orderkey", "c_mktsegment").orderBy("o_orderkey")
      .collect().map(_.toSeq)
    val plain = orders.join(cust, Seq("o_custkey"))
      .select("o_orderkey", "c_mktsegment").orderBy("o_orderkey")
      .collect().map(_.toSeq)
    assert(salted.toSeq == plain.toSeq)
  }
}
