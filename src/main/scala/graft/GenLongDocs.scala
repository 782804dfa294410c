package graft

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Deterministic LONG-DOCUMENT corpus generator — the reproducible source
  * of the "sflong" anchors in BASELINE.md. The driver testdata's documents
  * cap at 598 characters, which makes every per-document-quadratic or
  * length-skew hazard invisible (round-11 verdict: q95's old O(L²) term
  * counting was green at test lengths and would have dominated real
  * documents). This corpus makes those hazards measurable: docs of
  * 10⁴–10⁵ tokens (~1000× the testdata), drawn over the shared
  * [[GenCorpus.Vocab]] so the text operators exercise realistic tf/df
  * saturation, with a length-skew tail (10% of docs at the max length)
  * so per-partition balance is stressed too.
  *
  * `graft.GenLongDocs [outDir] [nDocs] [minTok] [maxTok]`
  * (default /tmp/sflong 500 10000 100000) writes `outDir/documents.parquet`
  * in the exact driver-testdata schema (doc_id, text, lang, source,
  * n_chars), so every documents-table operator runs unchanged. Everything
  * is seeded by doc_id — bit-identical across runs and machines; generation
  * is distributed (spark.range → per-row seeded RNG), so the same tool
  * scales to an arbitrarily large corpus on a cluster.
  */
object GenLongDocs {

  /** Seeded token count: uniform [minTok, maxTok), except every 10th doc
    * pins to maxTok — the deterministic skew tail. */
  private[graft] def docLen(docId: Long, minTok: Int, maxTok: Int): Int =
    if (docId % 10 == 9) maxTok
    else {
      val rnd = new scala.util.Random(docId * 6151L + 13L)
      minTok + rnd.nextInt(math.max(1, maxTok - minTok))
    }

  /** Tokens mix a 49-word head with a 200k-id long tail (Heaps'-law-ish):
    * per-doc DISTINCT counts then grow ~L/2 with document length, which is
    * what makes O(L·distinct) term counting measurably quadratic — an
    * all-head vocabulary caps distinct at 49 and hides the hazard (the
    * round-12 first-cut of this generator did exactly that: the old
    * quadratic tf kernel measured LINEAR on it). */
  def docText(docId: Long, minTok: Int, maxTok: Int): String = {
    val len = docLen(docId, minTok, maxTok)
    val rnd = new scala.util.Random(docId * 104729L + 97L)
    val v = GenCorpus.Vocab
    val sb = new StringBuilder(len * 7)
    var i = 0
    while (i < len) {
      if (i > 0) sb.append(' ')
      if (rnd.nextDouble() < 0.5) sb.append(v(rnd.nextInt(v.length)))
      else { sb.append('t'); sb.append(rnd.nextInt(200000)) }
      i += 1
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/sflong")
    val nDocs = if (args.length > 1) args(1).toLong else 500L
    val minTok = if (args.length > 2) args(2).toInt else 10000
    val maxTok = if (args.length > 3) args(3).toInt else 100000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val langs = Array("en", "en", "en", "zh", "de", "fr")
    spark.range(nDocs)
      .map { id =>
        val text = docText(id, minTok, maxTok)
        val rnd = new scala.util.Random(id * 31L + 7L)
        (id, text, langs(rnd.nextInt(langs.length)),
          s"src${id % 20}", text.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(4)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    println(s"wrote $nDocs long docs ($minTok..$maxTok tokens) to $out/documents.parquet")
    spark.stop()
  }
}
