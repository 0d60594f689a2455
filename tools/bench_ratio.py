#!/usr/bin/env python3
"""Compare two Bench JSON artifacts: per-query ratios, sorted worst-first.

Usage: python3 tools/bench_ratio.py <base.json> <new.json> [--min-sec 0.5]

Each file is either the one-line Bench stdout JSON or a driver
BENCH_r*.json wrapper holding that line in its "stdout_tail"/"output"
field; we parse the last {...} object found that contains "queries".
"""
import json
import re
import sys


def load_bench(path):
    raw = open(path).read()
    # direct JSON first
    try:
        obj = json.loads(raw)
        if isinstance(obj, dict):
            if "queries" in obj:
                return obj
            for v in obj.values():  # driver wrapper: search string fields
                if isinstance(v, str) and '"queries"' in v:
                    raw = v
                    break
    except json.JSONDecodeError:
        pass
    # last embedded {...} containing "queries" (stdout tails may clip the
    # front of the line — recover the queries dict and trailing totals)
    m = re.search(r'"queries":\s*(\{[^{}]*\})', raw)
    if not m:
        sys.exit(f"no queries dict found in {path}")
    queries = json.loads(m.group(1))
    totals = {}
    for key in ("value", "failed", "pass_ratio", "load_flagged",
                "shuffle_write_total", "spill_total"):
        t = re.search(rf'"{key}":\s*([0-9.eE+-]+|true|false)', raw[m.end():])
        if t:
            v = t.group(1)
            totals[key] = (v == "true") if v in ("true", "false") else float(v)
    return {"queries": queries, **totals}


def main():
    base_path, new_path = sys.argv[1], sys.argv[2]
    min_sec = 0.5
    if "--min-sec" in sys.argv:
        min_sec = float(sys.argv[sys.argv.index("--min-sec") + 1])
    base, new = load_bench(base_path), load_bench(new_path)
    bq, nq = base["queries"], new["queries"]
    rows = []
    for q, t in nq.items():
        b = bq.get(q)
        rows.append((t / b if b else None, b, t, q))
    rows.sort(key=lambda r: -(r[0] or 0))
    print(f"{'ratio':>7} {'base_s':>8} {'new_s':>8}  query")
    for ratio, b, t, q in rows:
        if t < min_sec and (b or 0) < min_sec:
            continue
        r = f"{ratio:7.2f}" if ratio else "    new"
        print(f"{r} {b if b is not None else float('nan'):8.2f} {t:8.2f}  {q}")
    only_base = sorted(set(bq) - set(nq))
    if only_base:
        print(f"-- in base only: {', '.join(only_base)}")
    for label, d in (("base", base), ("new", new)):
        tot = {k: v for k, v in d.items() if k != "queries"}
        print(f"-- {label} totals: {tot}")


if __name__ == "__main__":
    main()
