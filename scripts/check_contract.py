"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() on the same sf dir,
compare row count, column-name set, and an order-insensitive value hash.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""
from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from knowledgegraphsiqidis_spark.session import get_spark  # noqa: E402


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("contract-check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(rows)} rows, {len(cols)} cols "
                  f"({dt:.1f}s)")
            n_rows_only += 1
            if len(rows) == 0:
                print(f"  WARNING: {name} returned 0 rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} vs {len(orows)}")
        if sorted(cols) != sorted(ocols):
            problems.append(f"cols {sorted(cols)} vs {sorted(ocols)}")
        elif value_hash(rows, cols) != value_hash(orows, ocols):
            problems.append("value hash mismatch")
            so = sorted(("|".join(_norm_cell(r[i]) for i in
                         sorted(range(len(cols)), key=lambda i: cols[i])))
                        for r in rows)
            oo = sorted(("|".join(_norm_cell(r[i]) for i in
                         sorted(range(len(ocols)), key=lambda i: ocols[i])))
                        for r in orows)
            diffs = [(a, b) for a, b in zip(so, oo) if a != b][:3]
            for a, b in diffs:
                problems.append(f"  spark: {a[:120]}")
                problems.append(f"  duck : {b[:120]}")
        if problems:
            print(f"FAIL {name} ({len(rows)} rows, {dt:.1f}s): " +
                  "; ".join(problems[:1]))
            for p in problems[1:]:
                print("   " + p)
            n_fail += 1
        else:
            print(f"PASS {name}: {len(rows)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
