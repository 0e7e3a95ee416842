#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify output
(parquet per query + oracle_sql.json), run each oracle SQL in DuckDB over the
same testdata, and compare (columns sorted by name, rows sorted, values
compared exactly). Usage: selfcheck.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    if hasattr(v, "tolist") and not hasattr(v, "strftime"):
        return tuple(norm(x) for x in v.tolist())
    if isinstance(v, (list, tuple)): return tuple(norm(x) for x in v)
    if isinstance(v, dict): return tuple((k, norm(v[k])) for k in sorted(v))
    return v

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        print(f"FAIL {name}: columns {gcols} != {wcols}")
        fails += 1
        continue
    # Mimic the driver: pandas sort_values over all columns (crashes on
    # array-typed columns — if it crashes here it crashes in the gate too),
    # and flag dtype-kind mismatches (the driver's hash is dtype-sensitive).
    try:
        got = got[gcols].sort_values(by=gcols).reset_index(drop=True)
        want = want[wcols].sort_values(by=wcols).reset_index(drop=True)
    except Exception as e:
        print(f"FAIL {name}: driver-style sort_values crashed: {e}")
        fails += 1
        continue
    gk = [got[c].dtype.kind for c in gcols]
    wk = [want[c].dtype.kind for c in wcols]
    if gk != wk:
        print(f"FAIL {name}: dtype kinds {gk} != {wk} (driver hash diverges)")
        fails += 1
        continue
    g = [tuple(norm(v) for v in row) for row in got[gcols].itertuples(index=False)]
    w = [tuple(norm(v) for v in row) for row in want[wcols].itertuples(index=False)]
    g.sort(key=repr); w.sort(key=repr)  # repr: None/str mixes stay sortable
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} != {len(w)}")
        fails += 1
    elif g != w:
        diff = next(i for i in range(len(g)) if g[i] != w[i])
        print(f"FAIL {name}: first diff at sorted row {diff}:")
        print(f"  spark:  {g[diff]}")
        print(f"  duckdb: {w[diff]}")
        fails += 1
    else:
        print(f"ok   {name}: {len(g)} rows")
print(f"{'ALL OK' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
