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
