"""Vector math over ``array<float>`` embedding columns — pure Spark SQL
higher-order functions (zip_with / aggregate), JVM-side with whole-stage
codegen, no Python UDF in the hot path.

Accumulation is sequential over the array in both Spark and DuckDB, and both
compute in double, so results agree to the ulp; operators still round before
comparing against the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def lit_doubles(vals) -> Column:
    """Literal array<double> in ONE py4j round trip (r15, guide §1.2 "per-
    task work" applied to the DRIVER): ``F.array(*[F.lit(v) ...])`` costs
    one py4j call per element — measured ~35 ms per 64-dim vector, and the
    centroid/query/plane builders construct dozens of these per query, so
    literal-heavy plans paid ~0.3-1.2 s of pure Python/py4j DataFrame
    construction per invocation. A single ``F.expr("array(1.0D, ...)")``
    parses JVM-side in ~0.5 ms and optimizes to the IDENTICAL folded
    Literal (plan-equal, value-equal: repr() is shortest-round-trip and
    Spark parses double literals with Java parseDouble). The 'D' suffix is
    load-bearing — bare decimal text parses as DECIMAL, not DOUBLE."""
    import math

    def one(v: float) -> str:
        v = float(v)
        if math.isnan(v):
            return "double('NaN')"
        if math.isinf(v):
            return f"double('{'Infinity' if v > 0 else '-Infinity'}')"
        return repr(v) + "D"

    return F.expr("array(" + ",".join(one(v) for v in vals) + ")")


def lit_longs(vals) -> Column:
    """Literal array<bigint> in one py4j round trip (see lit_doubles)."""
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in vals) + ")")
