#!/usr/bin/env python3
"""Mechanized cross-round bench adjudication.

Encodes the protocol the round-16 host-drift verdict was earned with by
hand (BASELINE.md "Round-16: the q110/q116/q118/q74 cross-check"):
cross-round totals are read against the SHARED-SET per-query ratio
distribution, not one canary, because host-profile drift moves whole
shape families (memory-bandwidth/scan-heavy) while leaving
CPU-cache-resident queries flat.

Usage:
    python3 tools/bench_compare.py BENCH_r15.json BENCH_r16.json

Emits, for the queries present in BOTH files:
  - median / quartile / p10 / p90 of per-query time ratios (new/old);
  - the canary panel: q05 (CPU-cache-resident — blind to bandwidth
    drift) plus q04 and q28 (scan/vector class — the second canary the
    r16 analysis nominated after showing q05 alone reads "host is fine"
    in a run whose median sat at 1.32x);
  - per-query flags for ratios outside [1/band, band] (default 1.30x),
    sorted worst-first, with the sub-second floor applied (a 0.2 s query
    doubling is scheduler noise, not a regression signal);
  - the disjoint sets (new / retired queries) so added catalog entries
    are never silently folded into the drift read.

Interpretation rule encoded from the r16 verdict: if the MEDIAN shared
ratio moved but the flagged set is shape-correlated (whole families, no
code delta), suspect HOST; if the median is flat and specific queries
flag, suspect CODE on those paths.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    p = d.get("parsed") if isinstance(d.get("parsed"), dict) else d
    if not p or "queries" not in p:
        sys.exit(f"{path}: no parsed.queries map (bench line unparsed?)")
    return p


def quantile(xs, q):
    xs = sorted(xs)
    i = (len(xs) - 1) * q
    lo, hi = int(i), min(int(i) + 1, len(xs) - 1)
    return xs[lo] + (xs[hi] - xs[lo]) * (i - lo)


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    # positional: OLD NEW [band] [floor] (r17 advice: these were read from
    # argv[4]/argv[5], silently ignoring a band passed as the 3rd arg)
    band = float(sys.argv[3]) if len(sys.argv) > 3 else 1.30
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5  # sec
    old, new = load(sys.argv[1]), load(sys.argv[2])
    qo, qn = old["queries"], new["queries"]
    shared = sorted(set(qo) & set(qn))
    added = sorted(set(qn) - set(qo))
    retired = sorted(set(qo) - set(qn))
    if not shared:
        sys.exit("no shared queries between the two runs")
    ratios = {q: (qn[q] / qo[q] if qo[q] > 0 else float("inf")) for q in shared}
    rs = list(ratios.values())
    shared_old = sum(qo[q] for q in shared)
    shared_new = sum(qn[q] for q in shared)

    print(f"shared set: {len(shared)} queries  "
          f"(+{len(added)} new, -{len(retired)} retired)")
    print(f"shared-set total: {shared_old:.1f}s -> {shared_new:.1f}s "
          f"({shared_new / shared_old:.2f}x)")
    print(f"ratio distribution (new/old): p10={quantile(rs, .10):.2f} "
          f"q1={quantile(rs, .25):.2f} median={statistics.median(rs):.2f} "
          f"q3={quantile(rs, .75):.2f} p90={quantile(rs, .90):.2f}")

    print("canary panel (q05 = cache-resident, blind to bandwidth drift; "
          "q04/q28 = scan/vector class; q24 = one-shot dedup — guard-family "
          "cost moves flag as CODE here, not host; q106 = artifact-write "
          "class — the round-19 paired A/B showed this class carries a "
          "strong first-JVM/position sensitivity, so read its moves "
          "against this canary before flagging CODE):")
    for c in ("q05", "q04", "q28", "q24", "q106"):
        if c in ratios:
            print(f"  {c}: {qo[c]:.2f}s -> {qn[c]:.2f}s ({ratios[c]:.2f}x)")
        else:
            print(f"  {c}: not in shared set")

    flags = [(q, r) for q, r in ratios.items()
             if (r > band or r < 1 / band) and max(qo[q], qn[q]) >= floor]
    flags.sort(key=lambda t: -max(t[1], 1 / t[1]))
    if flags:
        print(f"outside the {band:.2f}x band (>= {floor}s only), worst first:")
        for q, r in flags:
            print(f"  {q}: {qo[q]:.2f}s -> {qn[q]:.2f}s ({r:.2f}x)")
    else:
        print(f"no shared query outside the {band:.2f}x band at >= {floor}s")

    med = statistics.median(rs)
    regressions = [f for f in flags if f[1] > 1]
    if abs(med - 1.0) > 0.15:
        print(f"READ: median moved ({med:.2f}x) -> whole-catalog shift; "
              "check whether flagged queries are shape families with no "
              "code delta (HOST) before blaming any one path (the r16 rule)")
    elif regressions and len(regressions) / len(shared) < 0.1:
        print("READ: median flat, specific queries REGRESSED -> suspect CODE "
              "on those paths (or artifact-write host variance; A/B with "
              "BenchOne before concluding)")
    elif flags:
        print("READ: median flat, flagged queries all got FASTER -> "
              "recovery from prior-run drift or a real optimization; "
              "cross-check the prior round's flags before claiming either")
    else:
        print("READ: within band - machine noise territory "
              "(Bench.scala reproducibility scaladoc: +/-5-10%)")
    if added:
        print("new entries (excluded from every number above): " + ", ".join(added))
    if retired:
        print("retired entries: " + ", ".join(retired))


if __name__ == "__main__":
    main()
