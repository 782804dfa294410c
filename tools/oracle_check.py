#!/usr/bin/env python3
"""Dev harness mimicking the driver's DuckDB-oracle correctness gate.

Reads the parquet dumps written by graft.Verify plus oracle_sql.json, runs
each oracle SQL in DuckDB over views of the same testdata parquet, and
compares: row count, schema (column names sorted), and values row-by-row
(columns sorted by name). Reports per-query PASS/FAIL with a diff preview.

Usage: tools/oracle_check.py [sfDir] [verifyOut]
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    names = sorted([os.path.basename(d) for d in glob.glob(f"{out}/*") if os.path.isdir(d)])
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        sdf = pq.read_table(files[0]).to_pandas(date_as_object=False)
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only: {len(sdf)} rows)"); continue
        try:
            ddf = con.execute(oracle[name]).arrow().to_pandas(date_as_object=False)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} vs {dcols}"); n_fail += 1; continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows {len(sdf)} vs {len(ddf)}"); n_fail += 1; continue
        sdf, ddf = sdf[scols], ddf[scols]
        # dtype check (approximate the driver's schema match)
        dt_mismatch = [(c, str(sdf[c].dtype), str(ddf[c].dtype))
                       for c in scols if str(sdf[c].dtype) != str(ddf[c].dtype)]
        bad = []
        for c in scols:
            sv, dv = sdf[c].tolist(), ddf[c].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                eq = (a == b) or (a is None and b is None) or \
                     (isinstance(a, float) and isinstance(b, float)
                      and (a != a and b != b or a == b))
                if not eq:
                    # pandas NaN vs None
                    if (a is None or a != a) and (b is None or b != b):
                        continue
                    bad.append((c, i, a, b))
                    if len(bad) >= 3: break
            if len(bad) >= 3: break
        if bad:
            print(f"FAIL {name}: value diffs {bad}")
            n_fail += 1
        elif dt_mismatch:
            print(f"WARN {name}: dtype diffs {dt_mismatch} (values match, {len(sdf)} rows)")
            n_pass += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
