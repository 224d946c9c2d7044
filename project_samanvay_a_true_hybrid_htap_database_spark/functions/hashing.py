"""Portable deterministic hashing helpers.

Every hash here is defined so the DuckDB oracle can compute the *identical*
integer with plain SQL: md5 hex digits reinterpreted as an integer, then
affine permutations ``(a*h + b) mod p`` in 64-bit-safe ranges. We deliberately
avoid engine-native hash functions (Spark xxhash64 / DuckDB hash) because
their values differ across engines.

The reference uses a double-hash bloom filter (h1*31, h2*37 —
reference: StorageEngine/include/sstable.hpp:28-96) and md5-free row keys; for
us hashing is only used by the dedup/fingerprint/LSH operators, so
cross-engine determinism matters more than speed-per-hash (md5 is still
JVM-side codegen, no Python in the loop).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Modulus for affine MinHash permutations: largest prime < 2^31, so that
# a*h+b stays < 2^62 and never overflows a signed 64-bit integer in either
# engine (a, h < 2^31).
MERSENNE31 = 2147483647

# Deterministic permutation parameters derived from a fixed seed (LCG), NOT
# from Python's random module, so the DuckDB oracle SQL can embed the same
# literal values.
def permutation_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    params = []
    state = seed
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        a = (state % (MERSENNE31 - 2)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        b = state % MERSENNE31
        params.append((a, b))
    return params


def md5_long32(col: Column | str) -> Column:
    """First 8 hex digits of md5 as a bigint in [0, 2^32).

    DuckDB equivalent: ``('0x' || substr(md5(x),1,8))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def md5_long60(col: Column | str) -> Column:
    """First 15 hex digits of md5 as a bigint in [0, 2^60) — used as the
    SimHash word hash so 60 independent bits exist.

    DuckDB equivalent: ``('0x' || substr(md5(x),1,15))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def minhash_expr(hash_col: str, a: int, b: int) -> Column:
    """One affine permutation of a 32-bit hash: (a*h + b) mod p."""
    return (F.col(hash_col) * F.lit(a) + F.lit(b)) % F.lit(MERSENNE31)


def hyperplanes(k: int, dim: int, seed: int = 7) -> list[list[float]]:
    """k pseudo-random hyperplanes in `dim` dims for sign-LSH, derived from
    the fixed-seed LCG and rounded to 6 decimals — both engines parse the
    same decimal literals to identical doubles, so the sign of the same
    sequential dot product agrees bit-for-bit."""
    planes = []
    state = seed
    for _ in range(k):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
            row.append(round((state / float(2**63)) * 2.0 - 1.0, 6))
        planes.append(row)
    return planes
