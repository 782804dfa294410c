package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML-table source (SURVEY §2.1 S6 / §2.11 I1) — the reference scrapes
  * schedule/election tables with BeautifulSoup on the driver
  * (`jobs/ingest/nfl.py:16-42`, `jobs/ingest/elections.py:16-41`); here the
  * extraction is a distributed Spark job: one row per `<tr>`, cells split
  * per `<th>/<td>`, tags stripped — all builtin regex/array expressions
  * (codegen'd, no UDF), so a million scraped pages parse as a normal
  * column pipeline with the scan parallelised per file.
  *
  * Scope matches the reference's inputs: well-formed static tables (no
  * nested tables inside cells, no streaming parse of broken markup) — the
  * shape pro-football-reference and Wikipedia election tables actually have.
  */
object HtmlTable {

  private val RowRx = "(?s)<tr[^>]*>(.*?)</tr>"
  private val CellRx = "(?s)<t[hd][^>]*>(.*?)</t[hd]>"
  private val TagRx = "<[^>]+>"

  /** One DataFrame row per table row across every file in `glob`:
    * (src_file, row_idx, cells array<string>). `row_idx` counts from 0
    * per file in document order; cell text is tag-stripped and trimmed. */
  def readTableRows(spark: SparkSession, glob: String): DataFrame =
    spark.read.option("wholetext", "true").text(glob)
      .select(input_file_name().as("src_file"),
        posexplode(expr(s"regexp_extract_all(value, '$RowRx', 1)"))
          .as(Seq("row_idx", "row_html")))
      .withColumn("cells", expr(
        s"transform(regexp_extract_all(row_html, '$CellRx', 1), c -> trim(regexp_replace(c, '$TagRx', '')))"))
      .select("src_file", "row_idx", "cells")

  /** Header/body split (I1): first row's cells become column names, the
    * rest become string columns — the reference's
    * `table.find_all('th')` header + per-row body extraction. All files
    * must share one header row (validated — a silent mismatch would bind
    * columns to the wrong cell index); short body rows (caption/colspan
    * rows) null-pad rather than fail, matching the scraper's tolerance.
    * Two passes over the files (header probe + body scan) — cheaper than
    * pinning a whole parsed page corpus in cache for one tiny collect. */
  def readTable(spark: SparkSession, glob: String): DataFrame = {
    val rows = readTableRows(spark, glob)
    val headers = rows.filter(col("row_idx") === 0)
      .select(col("cells")).distinct().limit(10)
      .collect().map(_.getSeq[String](0))
    require(headers.nonEmpty, s"html source: no table rows under $glob")
    require(headers.length == 1,
      s"html source: files under $glob disagree on the header row: " +
        headers.map(_.mkString("[", ",", "]")).mkString(" vs "))
    val body = rows.filter(col("row_idx") > 0)
    // every cell index gets its OWN output column: duplicate header labels
    // (repeated 'Yds' in real stat tables) and labels shadowing the source
    // columns ('src_file', 'row_idx') are suffixed _2, _3, … instead of
    // silently rebinding to the last matching index. Resolution is
    // case-insensitive, so the uniqueness check is too.
    val taken = scala.collection.mutable.Set("src_file", "row_idx")
    val names = headers.head.zipWithIndex.map { case (raw, i) =>
      val base = if (raw.nonEmpty) raw else s"_c$i"
      val name = if (!taken.contains(base.toLowerCase)) base
        else Iterator.from(2).map(k => s"${base}_$k")
          .find(n => !taken.contains(n.toLowerCase)).get
      taken += name.toLowerCase
      name
    }
    // get() is 0-indexed and yields null past the end (ANSI-safe)
    body.select(col("src_file") +: col("row_idx") +:
      names.zipWithIndex.map { case (n, i) => get(col("cells"), lit(i)).as(n) }: _*)
  }
}
