package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's FINAL stdout line must survive the driver's 2000-char tail
  * capture WITH sbt's `[success] Total time: ...` footer (~80 chars + a
  * newline) landing after it inside the same window. Rounds 5 and 6 both
  * shipped an over-budget line (full-precision per-query seconds → BENCH
  * "parsed": null); this spec pins the budget so a third occurrence fails in
  * `sbt test`, not in post-round judging. Since round 8 the final line keys
  * queries by their stable `qNN` numeric prefix (full names live on the
  * samples line): at 80 queries the full-name rendering was 1917 chars
  * worst-case and real lines would have crossed 2000 by ~84 queries.
  * Worst-case widths: every query at 9.99 s (an order of magnitude above
  * any real sf0.1 number) and a couple of flaky names.
  * Budget 1900 = 2000 − footer − margin.
  */
class BenchLineSpec extends AnyFunSuite {
  test("catalog size is pinned — update DELIBERATELY when adding queries") {
    // round 8 silently shrank the oracle gate 76→75 via a source-schema
    // surprise; an exact pin makes any accidental shrink (or growth that
    // forgot its oracle) a red test instead of a quiet judging artifact
    assert(SparkEntry.queries.size == 165,
      s"catalog is ${SparkEntry.queries.size}, expected 165 — if you added/" +
        "removed a query on purpose, update this pin in the same commit")
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  test("final bench line fits the driver tail window at worst-case widths") {
    val names = Bench.allNames
    assert(names.size >= 69, s"catalog shrank? ${names.size}")
    // the short-key scheme requires the numeric prefixes to be unique —
    // a collision would make finalLine fall back to full names for the
    // colliding pair (correct but wider); keep the catalog collision-free
    val prefixes = names.map(_.takeWhile(_ != '_'))
    assert(prefixes.distinct.size == prefixes.size,
      s"duplicate qNN prefixes: ${prefixes.diff(prefixes.distinct).distinct}")
    // 9.99 s per query is an order of magnitude above the slowest real
    // sf0.1 entry (~3.0 s) — a query past 10 s would itself be a failed
    // round, so the budget doesn't reserve width for it. The budget is
    // HARD at any catalog size (precision degrades 2→1→0 decimals only
    // when the width demands it — the 156-query catalog crossed the
    // all-worst-case 2-decimal bound)
    val results = names.map(_ -> 9.99)
    val line = Bench.finalLine(749.25, results,
      failed = Nil, flaky = names.take(2), sfDir = "/root/testdata/sf0.1")
    assert(line.length <= 1900, s"final bench line is ${line.length} chars")
    assert(!line.contains("\n") && line.startsWith("{") && line.endsWith("}"))
    assert(line.contains("\"value\":749.250"), line)
    // full names may appear in the flaky/errors DIAGNOSTIC arrays but never
    // as a queries-map key
    assert(!line.contains("\"q01_scan_project\":"), line)
    // resolution survives at realistic widths: the 160-query catalog
    // crossed the uniform-2-decimal realistic bound, so the cascade's
    // MIXED notch must keep sub-second values at 2 decimals (they carry
    // the bench_compare signal) while multi-second values absorb the
    // width cut at 1 decimal
    val realistic = names.zipWithIndex.map { case (n, i) => n -> (0.17 + (i % 30) * 0.1) }
    val real = Bench.finalLine(297.873, realistic, Nil, Nil, "/root/testdata/sf0.1")
    assert(real.length <= 1900, s"realistic line is ${real.length} chars")
    assert(real.contains("\"q01\":0.17,"), real)
    // headroom claim: the cascade holds to 170 queries at worst-case
    // width (precision drops instead of overflowing the tail window).
    // SATURATION NOTE: past ~172 queries even 0-decimal short-key
    // rendering exceeds the 1900 budget — at that point the scheme needs
    // structural revision (e.g. an aggregate bucket for sub-threshold
    // queries), not another precision notch; this assertion is the tripwire
    val grown = (1 to 170).map(i => f"q$i%02d_some_longer_query_name" -> 9.99)
    val big = Bench.finalLine(1698.3, grown, Nil, grown.take(2).map(_._1),
      "/root/testdata/sf0.1")
    assert(big.length <= 1900, s"170-query line is ${big.length} chars")
  }
}
