#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each SparkEntry query
result (parquet written by graft.Verify), run the oracle SQL in DuckDB over
the same sf tables and compare row count, schema width, and sorted values.
Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    pdir = f"{outdir}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{pdir}/*.parquet')").df()
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} != {wc}"); fails += 1; continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    w = want[wc].sort_values(wc).reset_index(drop=True)
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} != {len(w)}"); fails += 1; continue
    ok = True
    for c in gc:
        gv, wv = g[c].tolist(), w[c].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            same = (a == b) or (isinstance(a, float) and isinstance(b, float)
                                and (math.isnan(a) and math.isnan(b) or abs(a - b) < 1e-12))
            if not same:
                print(f"FAIL {name}: col {c} row {i}: {a!r} != {b!r}")
                ok = False; break
        if not ok: break
    if ok:
        print(f"OK   {name}: {len(g)} rows")
    else:
        fails += 1
sys.exit(1 if fails else 0)
