"""Isolate declared queries with the noop sink (guide §1.4): for each named
query, time min-of-N the split into
  build = Python/py4j DataFrame construction (fn(spark, sf_dir) returns)
  exec  = noop write of the built DataFrame (plan + execute)
plus a one-shot `.explain("formatted")` dump if --plans DIR is given.

Usage: python tools/isolate_query.py [--sf DIR] [--reps N] [--plans DIR] q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir to write <q>_<suffix>.txt plans")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from project_samanvay_a_true_hybrid_htap_database_spark import get_spark
    from project_samanvay_a_true_hybrid_htap_database_spark.sources import load_table

    spark = get_spark(app_name="isolate-query")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for t in ["orders", "lineitem", "customer", "documents", "embeddings", "events"]:
        load_table(spark, args.sf, t).count()

    for name in args.names:
        fn = qs[name]
        # warm-up: codegen + JIT + any idempotent index builds off the timed path
        df = fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        if args.plans:
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            os.makedirs(args.plans, exist_ok=True)
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        build = execu = total = float("inf")
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"isolate:{name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            build = min(build, t1 - t0)
            execu = min(execu, t2 - t1)
            total = min(total, t2 - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name:36s} total={total:7.3f}  build={build:7.3f}  exec={execu:7.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
