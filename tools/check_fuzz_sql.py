#!/usr/bin/env python3
"""Cross-engine leg of the fuzz differential (dev tool).

FuzzParitySpec proves DataFrame == spark.sql for 330 generated plans and
dumps `seed<TAB>rowcount<TAB>sql` to target/fuzz_sql.tsv. This replays
every SQL string in DuckDB over the same parquet tables: each must
parse, execute, and return the SAME row count Spark saw — validating the
spec's claim that the generated SQL stays in the ANSI subset DuckDB
parses (the driver-style t2 harness could therefore use these as
oracles directly).

Usage: check_fuzz_sql.py <sfDir> [tsvPath]
"""
import sys
import duckdb

sf_dir = sys.argv[1]
tsv = sys.argv[2] if len(sys.argv) > 2 else "target/fuzz_sql.tsv"
con = duckdb.connect()
for t in ["customer", "supplier", "orders", "lineitem"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

fails = 0
n = 0
for line in open(tsv):
    seed, want_rows, sql = line.rstrip("\n").split("\t", 2)
    n += 1
    try:
        got = len(con.execute(sql).fetchall())
    except Exception as e:
        print(f"FAIL seed={seed}: duckdb error: {e}\n  sql: {sql}")
        fails += 1
        continue
    if got != int(want_rows):
        print(f"FAIL seed={seed}: rows {got} vs spark {want_rows}\n  sql: {sql}")
        fails += 1
print(f"{n - fails}/{n} fuzz SQLs parse+execute in DuckDB with matching row counts")
sys.exit(1 if fails else 0)
