#!/usr/bin/env python3
"""Local mimic of the driver's t2 DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the parquet
tables in <sf_dir>, sorts columns by name and rows by all columns, and
compares cell-by-cell. Reports per-query PASS/FAIL.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main(out_dir, sf_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:  # comma-separated name substrings, mirrors Verify's 3rd arg
        subs = only.split(",")
        oracle = {k: v for k, v in oracle.items()
                  if any(s in k for s in subs)}
    failures = 0
    skipped = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            if only:
                skipped += 1  # filtered Verify run — not a failure
                continue
            # UNfiltered run: a missing dump means the query CRASHED in
            # Verify — that must fail the gate, not silently skip
            print(f"FAIL {name}: no output directory (query failed in Verify?)")
            failures += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in got_cols) +
                f" FROM '{out_dir}/{name}/*.parquet' ORDER BY ALL"
            ).fetchall()
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = con.execute(
                "SELECT " + ", ".join(f'"{c}"' for c in exp_cols) +
                f" FROM ({sql}) ORDER BY ALL").fetchall()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            failures += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            failures += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rowcount {len(got_rows)} != {len(exp_rows)}")
            failures += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            gn = tuple(norm(x) for x in g)
            en = tuple(norm(x) for x in e)
            if gn != en:
                bad = (i, g, e)
                break
        if bad:
            i, g, e = bad
            print(f"FAIL {name}: row {i} differs\n  got {g}\n  exp {e}")
            failures += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows, cols={got_cols})")
    ran = len(oracle) - skipped
    note = f" ({skipped} not in out_dir, skipped)" if skipped else ""
    print(f"\n{ran - failures}/{ran} queries pass{note}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
