package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev guard: the SRP-LSH embedding near-dup at 50× the bench vector count —
  * `graft.Profile27 [n] [tables] [bits]` (default 100k vectors, 8 tables ×
  * 16 bits: 2^bits scaled with n per the q27 scaladoc). Generates
  * deterministic unit-ish gaussians per id (seeded by id — reproducible
  * across runs/executors) plus 1000 planted near-dup pairs at cos ≈ 0.99,
  * then reports wall time, candidate volume and planted-pair recall. The
  * brute-force compare is 5G pairs here — exactly the join this path exists
  * to avoid.
  */
object Profile27 {
  private val Dim = 64

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val tables = if (args.length > 1) args(1).toInt else 8
    val bits = if (args.length > 2) args(2).toInt else 16
    val planted = 1000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // base vectors 0..n-1; ids n..n+planted-1 are 0.99-blends of ids 0..planted-1
    val emb = spark.range(0, n + planted, 1, 32).map { id =>
      def gauss(seed: Long): Array[Double] = {
        val r = new java.util.Random(seed * 2654435761L + 1)
        Array.fill(Dim)(r.nextGaussian())
      }
      val v =
        if (id < n) gauss(id)
        else {
          val base = gauss(id - n)
          val noise = gauss(id)
          base.zip(noise).map { case (b, x) => b + 0.08 * x }
        }
      (id, v)
    }.toDF("vec_id", "embedding")

    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.embedNearDups(emb, 0.9, tables, bits)
      .collect()
    val sec = (System.nanoTime() - t0) / 1e9
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (0 until planted)
      .count(i => found.contains((i.toLong, (n + i).toLong))).toDouble / planted
    println(f"n=${n + planted} tables=$tables bits=$bits: ${pairs.length} pairs " +
      f"in $sec%.1f s, planted-pair recall $recall%.3f")
    spark.stop()
  }
}
