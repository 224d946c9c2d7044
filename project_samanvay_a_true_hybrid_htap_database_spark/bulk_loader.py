"""Bulk loader: populate the `transactions` table (reference:
StorageEngine/API/bulk_loader.cpp:25-132 — 1M rows, fixed seed 42,
id/region/category/amount/units/status).

Two load paths:

- ``load_transactions_distributed`` (default): the 100-TB path. Rows are
  derived from ``spark.range(1, n+1)`` with hash-based column generators —
  fully distributed, deterministic for a given (seed, n), no driver-side
  loop, no RNG state to coordinate across executors. The result registers as
  the table's Parquet-style base via ``engine.register_base``.
- ``load_transactions_sql``: reference-shaped path — a loop of single-row
  ``INSERT INTO transactions VALUES (...)`` statements through the SQL front
  (bulk_loader.cpp:82-93 drives SQL INSERTs one by one). Use small n; this
  exists for API parity and upsert-semantics testing, not throughput.

Exact value parity with the C++ ``std::mt19937``/distribution stream is not
reproducible from public Python/Spark primitives; determinism here means
"same (seed, n) -> same table", which is what the reference's fixed seed is
for (reproducibility, bulk_loader.cpp:70).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engine import SamanvayEngine

REGIONS = ["North", "South", "East", "West", "Central"]
CATEGORIES = [
    "Electronics",
    "Clothing",
    "Food",
    "Services",
    "Support",
    "Logistics",
    "Marketing",
    "Finance",
]
STATUSES = ["completed", "pending", "refunded", "processing", "shipped"]

_CREATE_SQL = (
    "CREATE TABLE transactions (id INT PRIMARY KEY, region VARCHAR(50), "
    "category VARCHAR(50), amount DOUBLE, units INT, status VARCHAR(20))"
)


def _pick(h, options: list[str]):
    """Deterministic array pick by hash value — JVM-side, no UDF."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(h, F.lit(len(options))) + 1).cast("int"))


def transactions_df(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic distributed generator for the transactions table."""
    ids = spark.range(1, n + 1).select(F.col("id").cast("int").alias("id"))
    h = lambda tag: F.xxhash64(F.col("id"), F.lit(seed), F.lit(tag))  # noqa: E731
    return ids.select(
        "id",
        _pick(h("region"), REGIONS).alias("region"),
        _pick(h("category"), CATEGORIES).alias("category"),
        # amount in [5.0, 9999.99] (bulk_loader.cpp:76), 2 decimals
        F.round(
            F.lit(5.0)
            + (F.pmod(h("amount"), F.lit(999499)) / F.lit(999499.0)) * F.lit(9994.99),
            2,
        ).alias("amount"),
        # units in [1, 500] (bulk_loader.cpp:75)
        (F.pmod(h("units"), F.lit(500)) + 1).cast("int").alias("units"),
        _pick(h("status"), STATUSES).alias("status"),
    )


def load_transactions_distributed(
    engine: SamanvayEngine, n: int = 1_000_000, seed: int = 42
) -> int:
    """Create `transactions` and register the generated rows as its base."""
    rs = engine.execute(_CREATE_SQL)
    if not rs.ok and "already exists" not in (rs.error_message or ""):
        raise RuntimeError(rs.error_message)
    df = transactions_df(engine.spark, n, seed=seed)
    engine.register_base("transactions", df, pk="id")
    # Re-attach DDL metadata lost by register_base (pk + not-null)
    engine.tables["transactions"].not_null = {"id"}
    return n


def load_transactions_sql(
    engine: SamanvayEngine, n: int = 1000, seed: int = 42, progress: bool = False
) -> dict:
    """Reference-shaped per-row INSERT loop (bulk_loader.cpp:82-116)."""
    import random

    rng = random.Random(seed)
    rs = engine.execute(_CREATE_SQL)
    if not rs.ok and "already exists" not in (rs.error_message or ""):
        raise RuntimeError(rs.error_message)
    ok = fail = 0
    start = time.perf_counter()
    for i in range(1, n + 1):
        region = rng.choice(REGIONS)
        category = rng.choice(CATEGORIES)
        status = rng.choice(STATUSES)
        units = rng.randint(1, 500)
        amount = round(rng.uniform(5.0, 9999.99), 2)
        sql = (
            f"INSERT INTO transactions VALUES ({i}, '{region}', '{category}', "
            f"{amount}, {units}, '{status}')"
        )
        if engine.execute(sql).ok:
            ok += 1
        else:
            fail += 1
        if progress and (i % max(1, n // 20) == 0 or i == n):
            rate = i / (time.perf_counter() - start)
            print(f"  [{i * 100 // n:3d}%] {i}/{n} rows | {rate:.0f} rows/sec")
    elapsed = time.perf_counter() - start
    return {"inserted": ok, "failed": fail, "seconds": elapsed}


def main() -> None:
    import argparse

    from .session import get_spark

    ap = argparse.ArgumentParser(description="Samanvay bulk loader")
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--sql", action="store_true", help="per-row INSERTs through the SQL front"
    )
    args = ap.parse_args()

    engine = SamanvayEngine(get_spark(app_name="samanvay-bulk-loader"))
    print(f"Loading {args.rows} transactions (seed {args.seed})...")
    start = time.perf_counter()
    if args.sql:
        stats = load_transactions_sql(
            engine, n=args.rows, seed=args.seed, progress=True
        )
        print(f"Inserted {stats['inserted']} rows in {stats['seconds']:.2f}s")
    else:
        load_transactions_distributed(engine, n=args.rows, seed=args.seed)
        count = engine.table_df("transactions").count()
        print(f"Registered {count} rows in {time.perf_counter() - start:.2f}s")


if __name__ == "__main__":
    main()
