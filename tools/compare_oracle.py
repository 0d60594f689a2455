#!/usr/bin/env python3
"""Local mimic of the driver's t2 DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <verify_out_dir> <sf_dir> [only] [--driver]

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the parquet
tables in <sf_dir>, sorts columns by name and rows by all columns, and
compares cell-by-cell. Reports per-query PASS/FAIL.

Two compare paths (r04 lesson — the default path alone let a local
green disagree with a driver red):

- default: both sides sorted by DuckDB ORDER BY ALL, cells compared by
  python repr. Fast, but it never exercises pandas row-sorting, so it
  cannot catch the failure class where the DRIVER's compare crashes or
  orders rows differently.
- --driver: both sides loaded into pandas (the Spark dump via pyarrow,
  the oracle via duckdb .df()), columns sorted by name, rows via
  DataFrame.sort_values over all columns — the exact call shape in the
  driver's q110 crash trace, so an array/struct column that would kill
  the driver's compare kills this one too — then every cell hashed by
  VALUE BITS (float64 via struct.pack, ints width-normalized, NaN
  canonicalized). A one-ulp float difference or a -0.0/+0.0 flip fails
  this mode even where repr-based spot checks pass.

Run BOTH before claiming a query green.
"""
import json
import math
import os
import struct
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


def bitkey(v):
    """Value-bit normalization: distinguishes every float bit pattern
    (except NaN payloads, canonicalized like the driver's hash) and
    erases container-width differences (int32 vs int64)."""
    import numpy as np
    if v is None or v is pd_NA or (isinstance(v, float) and math.isnan(v)):
        return b"\x00NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return b"f" + struct.pack("<d", f)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return b"i" + str(int(v)).encode()
    if isinstance(v, (np.bool_, bool)):
        return b"b1" if v else b"b0"
    if isinstance(v, bytes):
        return b"y" + v
    return b"s" + str(v).encode()


pd_NA = None  # replaced once pandas is imported in driver mode


def driver_compare(name, out_dir, con, sql):
    """The driver-faithful path: pandas row sort + value-bit compare.
    Returns None on PASS, else a failure message."""
    global pd_NA
    import pandas as pd
    pd_NA = pd.NA
    got = pd.read_parquet(f"{out_dir}/{name}")
    exp = con.sql(sql).df()
    got_cols, exp_cols = sorted(got.columns), sorted(exp.columns)
    if got_cols != exp_cols:
        return f"columns {got_cols} != {exp_cols}"
    if len(got) != len(exp):
        return f"rowcount {len(got)} != {len(exp)}"
    try:
        # the exact driver call shape: lexsort over all columns — an
        # array-valued column raises TypeError here, as it did for the
        # driver on r04's q110 dump
        got = got[got_cols].sort_values(by=got_cols, ignore_index=True)
        exp = exp[exp_cols].sort_values(by=exp_cols, ignore_index=True)
    except TypeError as e:
        return f"driver-sort crash: {e}"
    # column-wise, DTYPE-PRESERVED: a per-row iloc walk upcasts an
    # all-numeric row to float64 and MASKS int-vs-float skew (exactly
    # how the r02–r04 local mimic called driver-red q95/q109 green —
    # DuckDB HUGEINT sums surface as float64, Spark longs as int64)
    for c in got_cols:
        gv, ev = got[c].tolist(), exp[c].tolist()
        for i in range(len(gv)):
            if bitkey(gv[i]) != bitkey(ev[i]):
                return (f"col '{c}' row {i} differs bitwise: "
                        f"got {gv[i]!r} ({got[c].dtype}) "
                        f"exp {ev[i]!r} ({exp[c].dtype})")
    return None


def main(out_dir, sf_dir, only=None, driver_mode=False):
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
        if driver_mode:
            try:
                msg = driver_compare(name, out_dir, con, sql)
            except Exception as e:
                msg = f"error: {e}"
            if msg:
                print(f"FAIL {name}: {msg}")
                failures += 1
            else:
                print(f"PASS {name} [driver-hash]")
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
    args = [a for a in sys.argv[1:] if a != "--driver"]
    sys.exit(main(args[0], args[1],
                  args[2] if len(args) > 2 else None,
                  driver_mode="--driver" in sys.argv))
