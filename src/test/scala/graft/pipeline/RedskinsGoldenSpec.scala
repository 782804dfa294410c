package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Golden-file test: the rebuilt pipeline on fixture CSVs must reproduce the
  * reference's committed output (`/root/reference/results/
  * nfl_elec_results.parquet`, 12 rows × 25 cols, elections 1976–2020,
  * prediction_results False only for 2012 and 2016). */
class RedskinsGoldenSpec extends AnyFunSuite {
  private val fixtures = getClass.getResource("/fixtures").getPath
  private val goldenPath = "/root/reference/results/nfl_elec_results.parquet"

  private def normalize(v: Any): Any = v match {
    case i: java.lang.Integer => i.longValue()
    case l: java.lang.Long    => l
    case d: java.sql.Date     => d.toString
    case other                => other
  }

  test("pipeline reproduces the golden parquet row-for-row") {
    val spark = TestSpark.spark
    val result = RedskinsPipeline.run(
      RedskinsPipeline.loadNflCsv(spark, s"$fixtures/nfl"),
      RedskinsPipeline.loadElectionsCsv(spark, s"$fixtures/elections/elections.csv"),
      RedskinsPipeline.electionDaysDf(spark, 1976, 2020))
    val golden = spark.read.parquet(goldenPath)

    assert(result.columns.toSeq == golden.columns.toSeq, "column order mismatch")

    val got = result.collect().map(_.toSeq.map(normalize))
    val want = golden.orderBy("elec_date").collect().map(_.toSeq.map(normalize))
    assert(got.length == want.length, s"row count ${got.length} != ${want.length}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"row $i differs:\n  got  $g\n  want $w")
    }
  }

  test("typed Dataset edge decodes the full golden result with typed fields") {
    val spark = TestSpark.spark
    val typed = RedskinsPipeline.runTyped(
      RedskinsPipeline.loadNflCsv(spark, s"$fixtures/nfl"),
      RedskinsPipeline.loadElectionsCsv(spark, s"$fixtures/elections/elections.csv"),
      RedskinsPipeline.electionDaysDf(spark, 1976, 2020)).collect()
    assert(typed.length == 12)
    assert(typed.forall(r => r.team == "Washington" && r.home_team_rnk == 2))
    val wrong = typed.filterNot(_.prediction_results)
      .map(_.elec_date.toString.take(4)).toSet
    assert(wrong == Set("2012", "2016"))
  }

  test("rule accuracy is 10/12 with 2012 and 2016 wrong") {
    val spark = TestSpark.spark
    val result = RedskinsPipeline.run(
      RedskinsPipeline.loadNflCsv(spark, s"$fixtures/nfl"),
      RedskinsPipeline.loadElectionsCsv(spark, s"$fixtures/elections/elections.csv"),
      RedskinsPipeline.electionDaysDf(spark, 1976, 2020))
    val wrong = result.collect()
      .filter(r => !r.getAs[Boolean]("prediction_results"))
      .map(_.getAs[java.sql.Date]("elec_date").toString.take(4)).toSet
    assert(wrong == Set("2012", "2016"))
  }
}
