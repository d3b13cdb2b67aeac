#!/usr/bin/env python3
"""Dev-time mimic of the driver's correctness gate: for each query parquet
dumped by graft.Verify, run the oracle SQL in DuckDB over the same sf tables
and compare (column names, row count, values).  Usage:
    python3 dev/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, math, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

def selected(name):
    # match exact names or prefixes ("q60" selects q60_stratified_sample)
    return not only or any(name == o or name.startswith(o) for o in only)

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9)
    return v

fails = 0
for name, sql in sorted(oracle.items()):
    if not selected(name): continue
    pq = glob.glob(f"{outdir}/{name}/*.parquet")
    if not pq:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{pq[0]}'").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} != {ec}"); fails += 1; continue
    g = [tuple(norm(v) for v in r) for r in got[gc].itertuples(index=False)]
    e = [tuple(norm(v) for v in r) for r in exp[ec].itertuples(index=False)]
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} != {len(e)}"); fails += 1; continue
    if sorted(map(repr, g)) != sorted(map(repr, e)):
        bad = [(a, b) for a, b in zip(sorted(map(repr,g)), sorted(map(repr,e))) if a != b][:3]
        print(f"FAIL {name}: values differ, e.g. {bad}"); fails += 1; continue
    ordered = "ordered" if g == e else "SET-ONLY"
    print(f"ok   {name}: {len(g)} rows ({ordered})")

# queries without oracle: rows-only
for qdir in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(qdir.rstrip("/"))
    if name in oracle or not selected(name): continue
    pq = glob.glob(f"{qdir}/*.parquet")
    n = con.sql(f"SELECT count(*) FROM '{pq[0]}'").fetchone()[0] if pq else -1
    print(f"rows {name}: {n}")

print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
