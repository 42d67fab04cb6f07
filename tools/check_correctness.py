"""Local stand-in for the driver's t2 correctness gate: runs every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
given scale factor, compares row counts, column names and
order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # exact — both engines round explicitly in-query
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(norm_cell(row[i]) for i in order))
    return sorted(out), [cols[i] for i in order]


def main():
    argv = [a for a in sys.argv[1:] if a != "--all"]
    use_all = "--all" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entrymod
    from dlx_spark.session import get_spark

    spark = get_spark("correctness", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    if use_all:
        # full fine-grained battery (the merged driver entries are built
        # from these), not just the 52-entry driver registry
        from dlx_spark import contract
        qs, oracles = dict(contract.BENCH), dict(contract.BENCH_ORACLE)
    else:
        qs = entrymod.queries()
        oracles = entrymod.oracle_sql()
    failures = []

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"✗ {name}: SPARK ERROR {str(e)[:200]}")
            continue

        if name not in oracles:
            print(f"~ {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue

        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"✗ {name}: ORACLE ERROR {str(e)[:200]}")
            continue

        s_norm, s_cols = norm_rows(scols, srows)
        o_norm, o_cols = norm_rows(ocols, orows)

        if s_cols != o_cols:
            failures.append((name, f"columns differ: spark={s_cols} oracle={o_cols}"))
            print(f"✗ {name}: COLUMNS spark={s_cols} oracle={o_cols}")
            continue
        if len(s_norm) != len(o_norm):
            failures.append((name, f"row count: spark={len(s_norm)} oracle={len(o_norm)}"))
            print(f"✗ {name}: ROWS spark={len(s_norm)} oracle={len(o_norm)}")
            continue
        if s_norm != o_norm:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b)
            failures.append((name, f"values differ at {diff}"))
            print(f"✗ {name}: VALUES differ, first: {diff}")
            continue
        print(f"✓ {name}: {len(s_norm)} rows match ({time.time()-t0:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg[:300]}")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
