#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate: run Verify output
against DuckDB oracles on the same parquet tables, compare values with
columns sorted by name. Usage: check.py <sfDir> <verifyOutDir>"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracles.items()):
    pq = os.path.join(out_dir, name)
    if not os.path.isdir(pq):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(pq + "/*.parquet"))])
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    # value-level compare, exact (mirrors a hash compare)
    bad = None
    for c in got.columns:
        a, b = got[c], exp[c]
        try:
            aa = a.map(lambda v: str(v))
            bb = b.map(lambda v: str(v))
            if not (aa == bb).all():
                i = (aa != bb).idxmax()
                bad = (c, i, a[i], b[i]); break
        except Exception as e:
            bad = (c, "?", "err", e); break
    if bad:
        print(f"FAIL {name}: col={bad[0]} row={bad[1]} spark={bad[2]!r} duck={bad[3]!r}"); fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
print(f"\n{len(oracles)-fails}/{len(oracles)} passed")
sys.exit(1 if fails else 0)
