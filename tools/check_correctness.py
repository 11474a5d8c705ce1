#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run each oracle SQL in DuckDB
over the same parquet tables and diff against the Spark dumps produced by
`graft.Verify`. Usage: check_correctness.py <sfDir> <verifyOutDir>
(Dev tool only — not part of the shipped Scala library.)"""
import json, sys, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        fails += 1
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(exp.columns)}")
        fails += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}")
        fails += 1
        continue
    # value compare, column by column, with dtype normalization
    bad = None
    for c in exp.columns:
        e, g = exp[c], got[c]
        try:
            if str(e.dtype).startswith("datetime") or str(g.dtype).startswith("datetime"):
                e = pd.to_datetime(e).astype("datetime64[us]")
                g = pd.to_datetime(g).astype("datetime64[us]")
            if not e.reset_index(drop=True).equals(g.reset_index(drop=True)):
                # fall back to elementwise with NaN-awareness
                ee, gg = e.reset_index(drop=True), g.reset_index(drop=True)
                neq = ~((ee == gg) | (ee.isna() & gg.isna()))
                if neq.any():
                    i = int(neq.idxmax())
                    bad = (c, i, ee[i], gg[i], str(e.dtype), str(g.dtype))
                    break
        except Exception as ex:
            bad = (c, -1, "cmp-error", str(ex), str(e.dtype), str(g.dtype))
            break
    if bad:
        c, i, ev, gv, ed, gd = bad
        print(f"FAIL {name}: col {c} row {i}: oracle={ev!r}({ed}) spark={gv!r}({gd})")
        fails += 1
    else:
        print(f"OK   {name} ({len(exp)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
