package graft

/** Dev probe: the q146 synthesized-PNG corpus's planted-pair geometry —
  * per picture group, the re-render pair's hamming and how many 16-bit
  * bands it shares (banding recall needs ≥ 1), plus the inverted pair's
  * distance. No Spark session — `aHash64`/`synthPng` are driver-side
  * integer code; this is the reference computation the q146 oracle embeds. */
object GenPhashReal {
  def main(args: Array[String]): Unit = {
    import graft.multimodal.Multimodal._
    for (k <- 0 until 10) {
      val f0 = aHash64(synthPng(4L * k))
      val f1 = aHash64(synthPng(4L * k + 1))
      val f3 = aHash64(synthPng(4L * k + 3))
      val shared = (0 to 3).count(b =>
        ((f0 >> (b * 16)) & 0xFFFFL) == ((f1 >> (b * 16)) & 0xFFFFL))
      println(s"group $k: rerender hamming=${hamming64(f0, f1)} sharedBands=$shared " +
        s"inverted hamming=${hamming64(f0, f3)}")
    }
  }
}
