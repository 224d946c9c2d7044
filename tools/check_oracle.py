"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values (strict, plus a float-epsilon
fallback report).

Usage: python tools/check_oracle.py [sf_dir] [only_query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from project_samanvay_a_true_hybrid_htap_database_spark import get_spark
from project_samanvay_a_true_hybrid_htap_database_spark.sources import TABLES


def norm_cell(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 2**53:
            return float(v)
        return v
    if isinstance(v, int):
        return float(v) if abs(v) < 2**53 else v
    return v


def sorted_rows(rows):
    return sorted(
        (tuple(norm_cell(c) for c in r) for r in rows),
        key=lambda t: tuple(("" if c is None else str(c)) for c in t),
    )


def rows_close(a, b, eps=1e-6):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for ca, cb in zip(ra, rb):
            if isinstance(ca, float) and isinstance(cb, float):
                if not (ca == cb or abs(ca - cb) <= eps * max(1.0, abs(ca), abs(cb))):
                    return False
            elif ca != cb:
                return False
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', 8)}]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: SPARK ERROR {type(exc).__name__}: {str(exc)[:200]}")
            n_fail += 1
            continue
        spark_s = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle (rows={len(srows)}, {spark_s:.1f}s)")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0].lower() for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: DUCKDB ERROR {type(exc).__name__}: {str(exc)[:200]}")
            n_fail += 1
            continue

        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={scols} duck={ocols}")
        if not problems:
            # align duck columns to spark order
            idx = [ocols.index(c) for c in scols]
            orows2 = [tuple(r[i] for i in idx) for r in orows]
            sa, ob = sorted_rows(srows), sorted_rows(orows2)
            if sa != ob:
                if rows_close(sa, ob):
                    problems.append("values differ only within 1e-6 (hash would MISMATCH)")
                else:
                    diffs = [
                        (x, y) for x, y in zip(sa, ob) if x != y
                    ][:3]
                    problems.append(f"values differ, e.g. {diffs}")
        if problems:
            print(f"FAIL {name} ({len(srows)} rows, {spark_s:.1f}s): " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {spark_s:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
