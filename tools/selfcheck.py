#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
scale factor, then run each oracle SQL in DuckDB over the same parquet
tables and compare results (columns sorted by name, rows sorted, exact
values). Usage:
    python3 tools/selfcheck.py [sfdir] [outdir] [--skip-verify]
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def key(row):
    return tuple((x is None, str(x)) for x in row)


def compare(name, spark_cols, spark_rows, duck_cols, duck_rows):
    if sorted(spark_cols) != sorted(duck_cols):
        return f"SCHEMA MISMATCH spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    order_s = [spark_cols.index(c) for c in sorted(spark_cols)]
    order_d = [duck_cols.index(c) for c in sorted(duck_cols)]
    rs = sorted([tuple(norm(r[i]) for i in order_s) for r in spark_rows], key=key)
    rd = sorted([tuple(norm(r[i]) for i in order_d) for r in duck_rows], key=key)
    if len(rs) != len(rd):
        return f"ROWCOUNT MISMATCH spark={len(rs)} duck={len(rd)}"
    for i, (a, b) in enumerate(zip(rs, rd)):
        if a != b:
            return f"VALUE MISMATCH at sorted-row {i}:\n  spark={a}\n  duck ={b}"
    return None


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    results = {}
    for name, sql in sorted(oracle.items()):
        pdir = OUT / name
        if not pdir.exists():
            results[name] = "NO SPARK OUTPUT"
            continue
        tbl = pq.read_table(pdir)
        spark_cols = tbl.column_names
        spark_rows = [tuple(r) for r in zip(*[tbl.to_pydict()[c] for c in spark_cols])] if tbl.num_rows else []
        try:
            rel = con.sql(sql)
            duck_cols = rel.columns
            duck_rows = rel.fetchall()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            continue
        results[name] = compare(name, spark_cols, spark_rows, duck_cols, duck_rows)
    # queries without oracle: report rows-only
    for pdir in sorted(OUT.iterdir()):
        if pdir.is_dir() and pdir.name not in oracle:
            n = pq.read_table(pdir).num_rows
            results[pdir.name] = f"(no oracle) rows={n}"
    ok = True
    for name, err in sorted(results.items()):
        if err is None:
            print(f"  OK   {name}")
        elif err.startswith("(no oracle)"):
            print(f"  INFO {name} {err}")
        else:
            ok = False
            print(f"  FAIL {name}: {err}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
