"""HTAP freshness overlay primitives: newest-version-wins merge.

The reference's one genuinely HTAP behavior is read-your-writes — a skiplist
memtable overlays the LSM levels and the highest sequence number wins per key,
with tombstones shadowing older versions (reference:
StorageEngine/include/range_query_executor.hpp:38-51, 114-131; memtable merged
at seq UINT64_MAX). Here the same semantics is a union + window dedup: the hot
DataFrame is tagged with a higher seq than the base, and
``row_number() over (partition by key order by seq desc) = 1`` picks the
surviving version. On a cluster this is a single shuffle on the key — and when
the hot side is small (the common case: fresh writes ≪ base), we broadcast it
instead and resolve via anti-join + union, which avoids shuffling the base
table entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_version(
    base: DataFrame,
    hot: DataFrame,
    key: str,
    tombstone_col: str | None = None,
    broadcast_hot: bool = True,
) -> DataFrame:
    """Merge ``hot`` over ``base``: hot rows replace base rows with the same
    key; rows whose ``tombstone_col`` is true are deleted.

    With ``broadcast_hot`` (default), the plan is
    ``base ANTI JOIN broadcast(hot keys) UNION live hot rows`` — no shuffle of
    the base table, which is the only plan that survives a 100 TB base.
    """
    live_hot = hot
    if tombstone_col is not None:
        live_hot = hot.filter(~F.col(tombstone_col)).drop(tombstone_col)
        hot_keys = hot.select(key)
    else:
        hot_keys = hot.select(key)

    if broadcast_hot:
        survivors = base.join(F.broadcast(hot_keys), on=key, how="left_anti")
        return survivors.unionByName(live_hot.select(*base.columns))

    # Shuffle-based fallback for a large hot side: window dedup on (key, seq).
    tagged_base = base.withColumn("__seq", F.lit(0))
    tagged_hot = live_hot.select(*base.columns).withColumn("__seq", F.lit(1))
    merged = tagged_base.unionByName(tagged_hot)
    w = Window.partitionBy(key).orderBy(F.col("__seq").desc())
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__seq")
    )


def merge_versions(df: DataFrame, key: str, seq_col: str, tombstone_col: str | None = None) -> DataFrame:
    """Newest-sequence-wins dedup over a versioned log (the LSM merge,
    reference: range_query_executor.hpp:60-179, as one window)."""
    w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    if tombstone_col is not None:
        out = out.filter(~F.col(tombstone_col))
    return out
