package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class SinksSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private def tmp(): String =
    Files.createTempDirectory("graft_sink").toString

  test("CSV sink round-trips through the CSV->parquet converter") {
    val spark = TestSpark.spark
    val dir = tmp()
    val src = Tables.nation(spark, sf).orderBy("n_nationkey")
    Sinks.writeCsv(src, s"$dir/csv")
    Sinks.csvToParquet(spark, s"$dir/csv", s"$dir/pq")
    val back = spark.read.parquet(s"$dir/pq").orderBy("n_nationkey")
    assert(back.collect().map(_.toSeq).toSeq == src.collect().map(_.toSeq).toSeq)
  }

  test("single-file parquet sink writes exactly one part file") {
    val spark = TestSpark.spark
    val dir = tmp()
    Sinks.writeSingleParquet(Tables.region(spark, sf), s"$dir/one")
    val parts = new java.io.File(s"$dir/one").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.length == 1)
    assert(spark.read.parquet(s"$dir/one").count() == 5)
  }

  test("partitioned sink enables partition pruning on read") {
    val spark = TestSpark.spark
    val dir = tmp()
    Sinks.writePartitioned(
      Tables.orders(spark, sf).withColumn("o_year", year(col("o_orderdate"))),
      s"$dir/part", "o_year")
    val pruned = spark.read.parquet(s"$dir/part").filter(col("o_year") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ==
      Tables.orders(spark, sf).filter(year(col("o_orderdate")) === 1995).count())
    // pruning visible in the scan: only the matching partition directory read
    assert(plan.contains("PartitionFilters") || pruned.inputFiles.forall(_.contains("o_year=1995")))
  }

  test("schema-evolving parquet batches read as one dataset via mergeSchema") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = tmp()
    // batch 1: the original schema; batch 2: a column added months later
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$dir/ev/batch=1")
    Seq((3L, "c", 0.5), (4L, "d", 0.9)).toDF("id", "name", "score")
      .write.parquet(s"$dir/ev/batch=2")
    val merged = Sinks.readMerged(spark, s"$dir/ev")
    assert(merged.columns.toSet == Set("id", "name", "score", "batch"))
    val rows = merged.orderBy("id")
      .select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    // pre-evolution rows surface the new column as null, not an error
    assert(rows.toSeq == Seq(1L -> None, 2L -> None, 3L -> Some(0.5), 4L -> Some(0.9)))
    // the default (non-merging) read would drop one side's column silently —
    // documenting why the explicit merge path exists
    val unmergedCols = spark.read.parquet(s"$dir/ev").columns.toSet
    assert(unmergedCols.subsetOf(Set("id", "name", "score", "batch")))
  }

  test("q81: partitioned layout is one directory per source and the pruned read is complete") {
    val spark = TestSpark.spark
    val back = Sinks.q81PartitionPrune(spark, sf)
    val rows = back.collect()
    // 2 of 20 sources × 25 docs each at sf0.001 — complete and nothing else
    assert(rows.length == 50, rows.length.toString)
    assert(rows.map(_.getAs[String]("source")).toSet == Set("src3", "src7"))
    // the write really fanned out into one directory per source value (the
    // layout the planner prunes against; inputFiles lists the whole
    // relation pre-pruning — the pruning proof itself is in PlanSpec)
    val dirs = back.inputFiles.map(_.replaceAll("/[^/]*$", "")).distinct
    assert(dirs.length == 20 && dirs.forall(_.matches(".*source=src\\d+$")),
      dirs.mkString("\n"))
  }

  test("q80: bucketed-layout rollup equals the same rollup from the raw tables") {
    val spark = TestSpark.spark
    val viaBuckets = Sinks.q80BucketedJoin(spark, sf).collect().map(_.toSeq).toSeq
    assert(viaBuckets.nonEmpty)
    // layout transparency in-engine (the DuckDB oracle re-proves it
    // cross-engine): the identical plain join/rollup over the raw parquet
    val raw = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("order_qty"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("n_lines")).as("total_lines"),
        sum(col("order_qty").cast("decimal(18,2)")).cast("double").as("total_qty"))
      .orderBy("o_orderpriority")
      .collect().map(_.toSeq).toSeq
    assert(viaBuckets == raw)
  }

  test("bucketed tables join with zero shuffle on either side") {
    val spark = TestSpark.spark
    Sinks.writeBucketed(Tables.orders(spark, sf), "graft_bkt_orders",
      "o_orderkey", buckets = 4, sortCols = Seq("o_orderkey"))
    Sinks.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "graft_bkt_lineitem", "l_orderkey", buckets = 4, sortCols = Seq("l_orderkey"))
    val joined = spark.table("graft_bkt_lineitem")
      .join(spark.table("graft_bkt_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_quantity", "o_orderpriority")
    // the whole point of bucketing: NO Exchange under the join — disable
    // broadcast so the small test tables take the sort-merge path the layout
    // is designed for
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      val expected = Tables.lineitem(spark, sf).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    }
  }

  test("range-sorted layout: per-file key ranges are disjoint so stats can prune") {
    val spark = TestSpark.spark
    val dir = tmp()
    Sinks.writeRangeSorted(Tables.events(spark, sf), s"$dir/rs", 4, "user_id")
    val files = new java.io.File(s"$dir/rs").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length == 4, s"expected 4 files, got ${files.length}")
    // the skipping precondition: file-level [min, max] ranges never overlap
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("user_id")), max(col("user_id"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"overlapping file ranges: $aMax vs $bMin")
      case _ =>
    }
    // nothing lost: the layout is a pure reorganization
    assert(spark.read.parquet(s"$dir/rs").count() ==
      Tables.events(spark, sf).count())
  }

  test("merge upsert + dynamic partition overwrite: idempotent, untouched partitions never rewritten") {
    val spark = TestSpark.spark
    val dir = Files.createTempDirectory("graft_merge_idem").toString
    val docs = Tables.spread(spark, Tables.documents(spark, sf), "doc_id")
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
    Sinks.writePartitioned(docs, dir, "source")
    // the catchup batch: updates (bumped n_chars) + late inserts, derived
    // from the raw table so every application is the same batch
    val src = docs.filter(col("source").isin("src3", "src7") && col("doc_id") % 3 === 0)
    val batch = src.withColumn("n_chars", col("n_chars") + 1000)
      .unionByName(src.withColumn("doc_id", col("doc_id") + 100000000L))
    def applyBatch(): Unit = {
      val touched = spark.read.parquet(dir)
        .filter(col("source").isin("src3", "src7"))
        .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
      Sinks.overwritePartitions(
        Sinks.mergeUpsert(touched, batch, "doc_id"), dir, "source")
    }
    def snapshot() = spark.read.parquet(dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(_.toSeq).sortBy(_.toString)
    def untouchedFiles() = {
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(dir, "source=src0")).iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(p => (p.toString, Files.size(p), Files.getLastModifiedTime(p)))
        .toSeq.sortBy(_._1)
    }
    val filesBefore = untouchedFiles()
    applyBatch()
    val after1 = snapshot()
    // the merge really happened: updated rows bumped, inserts present,
    // unmatched target rows survived
    val m = after1.map(s => s(0).asInstanceOf[Long] -> s).toMap
    val probe = docs.filter(col("source") === "src3").select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    probe.filter(_._1 % 3 == 0).take(3).foreach { case (id, nc) =>
      assert(m(id)(2) == nc + 1000, s"doc $id not updated")
      assert(m.contains(id + 100000000L), s"insert for $id missing")
    }
    probe.filter(_._1 % 3 != 0).take(3).foreach { case (id, nc) =>
      assert(m(id)(2) == nc, s"unmatched doc $id must survive unchanged")
    }
    // re-running the SAME batch is a no-op on content...
    applyBatch()
    assert(snapshot().sameElements(after1), "re-applied batch changed the table")
    // ...and partitions outside the batch were never rewritten by either
    // apply (same files, same bytes, same mtimes — not merely same rows)
    assert(untouchedFiles() == filesBefore,
      "dynamic overwrite touched a partition outside the batch")
  }

  test("HTML-table source extracts header and body rows distributed") {
    val spark = TestSpark.spark
    val html = getClass.getResource("/fixtures/html").getPath
    val df = HtmlTable.readTable(spark, s"$html/*.html")
    assert(df.columns.toSeq == Seq("src_file", "row_idx", "row_num", "year", "date", "team", "final"))
    val rows = df.orderBy("row_idx").collect()
    assert(rows.length == 4)
    // markup (links, bold) is stripped to text; the messy "(2-5)" suffix the
    // pipeline's split handles is preserved verbatim
    assert(rows(0).getAs[String]("team") == "St. Louis(2-5)")
    assert(rows(2).getAs[String]("team") == "Dallas")
    assert(rows.forall(_.getAs[String]("year") == "1976"))
    assert(rows(1).getAs[String]("final") == "17")
  }

  test("HTML-table source suffixes duplicate and reserved header labels") {
    // real stat tables repeat labels ('Yds' for passing and rushing) and can
    // shadow the source-metadata columns; every cell index must still get its
    // own column instead of rebinding to the last matching index
    val spark = TestSpark.spark
    val dir = tmp()
    val html =
      """<table>
        |<tr><th>src_file</th><th>Yds</th><th>yds</th><th></th></tr>
        |<tr><td>game1</td><td>212</td><td>87</td><td>W</td></tr>
        |</table>""".stripMargin
    Files.write(java.nio.file.Paths.get(s"$dir/dup.html"), html.getBytes)
    val df = HtmlTable.readTable(spark, s"$dir/*.html")
    // 'src_file' collides with the metadata column; the second 'yds' collides
    // case-insensitively with 'Yds'; the empty header becomes positional
    assert(df.columns.toSeq ==
      Seq("src_file", "row_idx", "src_file_2", "Yds", "yds_2", "_c3"))
    val r = df.collect().head
    assert(r.getAs[String]("src_file_2") == "game1")
    assert(r.getAs[String]("Yds") == "212")
    assert(r.getAs[String]("yds_2") == "87")
    assert(r.getAs[String]("_c3") == "W")
  }

  test("HTML-table source feeds the NFL pipeline stage end-to-end") {
    val spark = TestSpark.spark
    val html = getClass.getResource("/fixtures/html").getPath
    val raw = HtmlTable.readTable(spark, s"$html/*.html")
      .select(col("row_num"),
        col("year").cast("int").as("year"),
        col("date"), col("team"), col("final"))
    val staged = graft.pipeline.RedskinsPipeline.nflStage(raw)
      .orderBy("game_date").collect()
    // both fixture games have Washington as the 2nd (home) row: a 17-10 win
    // over St. Louis, a 24-27 loss to Dallas
    assert(staged.length == 2)
    assert(staged.map(_.getAs[String]("redskins_result")).toSeq == Seq("WIN", "LOSE"))
    assert(staged.forall(_.getAs[String]("team") == "Washington"))
  }

  test("external table registration makes parquet queryable by name") {
    val spark = TestSpark.spark
    val dir = tmp()
    Sinks.writeSingleParquet(Tables.supplier(spark, sf), s"$dir/sup")
    Sinks.registerExternalTable(spark, "graft_ext_supplier", s"$dir/sup")
    assert(spark.sql("SELECT COUNT(*) FROM graft_ext_supplier").head().getLong(0) == 10)
    spark.sql("DROP TABLE graft_ext_supplier")
  }
}
