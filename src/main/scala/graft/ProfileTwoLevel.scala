package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: SUB-√n CELL ASSIGNMENT — the documented next rung past the
  * √n nlist auto-sizing (`graft.ProfileTwoLevel [sfDir]`, default
  * /tmp/sfbig1m). At ≥1M vectors the corpus² family's map-side assign cost
  * is n·nlist native distance ops (graft_near_cells over all ⌈√n⌉ cells);
  * a TWO-LEVEL coarse quantizer (⌈√nlist⌉ super-cells over the centroid
  * set, then argmin only within the winning super-cell's members) cuts it
  * to n·(√nlist + nlist/√nlist) ≈ 2n·√nlist ops — O(n·n^¼) total.
  *
  * The probe measures (a) flat vs two-level assignment wall-clock at the
  * corpus's derived nlist and (b) the ASSIGNMENT AGREEMENT rate — the
  * two-level argmin is approximate near super-cell boundaries (the nearest
  * cell can live in a losing super-cell), which is exactly why this stays
  * a PROFILE: the exact-arithmetic DuckDB oracle is the catalog contract,
  * and a boundary-dependent cell map is not hash-gatable. Wire-in would
  * need either a boundary re-check (multi-super probing) or an
  * oracle-side mirror of the full two-level rule. BASELINE.md round-13
  * records the numbers. */
object ProfileTwoLevel {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfbig1m")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Similarity
    graft.functions.VectorFunctions.register(spark)
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s  ($r)")
    }
    val emb = Similarity.embWithNorm(spark, d)
      .filter(col("nrm") > 0).select("vec_id", "e")
    val n = emb.count()
    val nlist = math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)
    val snlist = math.max(8, math.ceil(math.sqrt(nlist.toDouble)).toInt)
    println(s"corpus: $n vectors, nlist=$nlist, super-cells=$snlist")
    val cents = Similarity.knnCents(emb, nlist).cache()
    cents.count()
    val cc = Similarity.ccRow(cents)
    time(s"flat assign (n·$nlist dists)")(
      emb.crossJoin(broadcast(cc))
        .withColumn("cell", expr("element_at(graft_near_cells(e, cc, 1), 1).cent_id"))
        .agg(count(lit(1)), sum(col("cell"))).collect().mkString)
    // level-2 train: one fixed-point round over the CENTROID SET (tiny)
    val centEmb = cents.select(col("cent_id").as("vec_id"), col("ce").as("e"))
    val scents = Similarity.knnCents(centEmb, snlist).cache()
    scents.count()
    val nested = Similarity.assignCells(centEmb, scents)
      .select(col("cell").as("sid"), col("vec_id").as("cent_id"), col("e").as("ce"))
      .groupBy("sid")
      .agg(collect_list(struct(col("cent_id"), col("ce"))).as("cells"))
      .agg(collect_list(struct(col("sid"), col("cells"))).as("sc"))
    val scc = Similarity.ccRow(scents).select(col("cc").as("scc"))
    def twoLevel = emb.crossJoin(broadcast(scc)).crossJoin(broadcast(nested))
      .withColumn("sid", expr("element_at(graft_near_cells(e, scc, 1), 1).cent_id"))
      .withColumn("cell", expr(
        "element_at(graft_near_cells(e, element_at(filter(sc, p -> p.sid = sid), 1).cells, 1), 1).cent_id"))
      .select("vec_id", "cell")
    time(s"two-level assign (n·($snlist + ~${nlist / snlist}) dists)")(
      twoLevel.agg(count(lit(1)), sum(col("cell"))).collect().mkString)
    val flat = emb.crossJoin(broadcast(cc))
      .withColumn("fcell", expr("element_at(graft_near_cells(e, cc, 1), 1).cent_id"))
      .select("vec_id", "fcell")
    val agree = twoLevel.join(flat, Seq("vec_id"))
      .agg(avg(when(col("cell") === col("fcell"), 1.0).otherwise(0.0)).as("agree"))
      .head().getDouble(0)
    println(f"assignment agreement: ${agree * 100}%.2f%%")
    spark.stop()
  }
}
