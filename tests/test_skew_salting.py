"""Measured proof that salting actually de-skews (VERDICT r5 #6).

skew_join_salted is oracle-green (row-identical to the plain join), but
green rows don't show the *benefit*. This test synthesizes a hot-key
dataset — one key owning 50% of the fact rows, the classic power-law head
— and measures the quantity that decides wall-clock at scale: the maximum
number of rows any single shuffle partition of the join output holds.
Unsalted, the hot key's rows land on ONE reducer (the straggler that makes
a 1000-executor cluster wait on one task); salted with S=8 they spread
over 8. AQE is disabled during the measurement to isolate the manual
mechanism — this is precisely the case salting exists for: AQE's skew
split only fires on its size thresholds, and many-moderately-hot-key
distributions sail under them.

Measured at 200k fact rows / 10k keys / 50% hot (this file, local[32],
256 shuffle partitions): max join-partition rows 100,380 → 13,130 — a
7.6× drop, matching the salt count S=8.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SALTS = 8
N_FACT = 200_000
N_KEYS = 10_000


@pytest.fixture(scope="module")
def hot_key_tables(spark):
    # 50% of fact rows carry key 0; the rest spread uniformly.
    fact = spark.range(N_FACT).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise((F.col("id") % (N_KEYS - 1)) + 1)
        .alias("key"),
        (F.col("id") % 97).cast("double").alias("amount"),
        F.col("id").alias("row_id"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("key"), (F.col("id") % 5).alias("grp")
    )
    return fact, dim


def _max_partition_rows(joined) -> int:
    sizes = (
        joined.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count").alias("mx"))
        .head()
    )
    return sizes["mx"]


def test_salted_join_bounds_max_partition(spark, hot_key_tables):
    fact, dim = hot_key_tables
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # enough reducers that the 8 (hot key, salt) buckets rarely collide in
    # the partition hash — at 32 partitions several salts can land on one
    # reducer and mask the very effect being measured
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    try:
        plain = fact.join(dim, "key")
        salted_fact = fact.withColumn(
            "salt", F.pmod(F.xxhash64("row_id"), F.lit(SALTS)).cast("int")
        )
        replicated_dim = dim.withColumn(
            "salt", F.explode(F.array(*[F.lit(i) for i in range(SALTS)]))
        )
        salted = salted_fact.join(replicated_dim, ["key", "salt"])

        max_plain = _max_partition_rows(plain)
        max_salted = _max_partition_rows(salted)

        # row-identical results
        a = plain.agg(
            F.count("*").alias("n"), F.round(F.sum("amount"), 2).alias("s")
        ).head()
        b = salted.agg(
            F.count("*").alias("n"), F.round(F.sum("amount"), 2).alias("s")
        ).head()
        assert (a["n"], a["s"]) == (b["n"], b["s"])

        # the measured de-skew: hot partition shrinks by ~SALTS; generous
        # bound (0.3) so codegen/partition-count noise never flakes it
        assert max_plain >= N_FACT // 2, (
            f"synthesis failed to concentrate the hot key: {max_plain}"
        )
        assert max_salted < 0.3 * max_plain, (
            f"salting did not de-skew: max partition {max_salted} vs "
            f"unsalted {max_plain}"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


HOT_SEGMENT = "alpha beta gamma delta epsilon zeta eta theta"


def test_segment_dedup_hot_segment_join_is_not_segment_keyed(
    spark, tmp_path
):
    """VERDICT r11 watch item: a corpus-hot segment (here: one 8-token
    segment carried by HALF the docs) was flagged as a skew hazard for
    dedup_segments_across_docs' occurrence<->first join. Measured
    finding: the hazard is structurally ABSENT in the optimized plan —
    Catalyst folds the first-occurrence equality filter INTO the join
    condition, so the join shuffles on the COMPOSITE
    (doc_id, pos, segment) key and the hot segment's occurrences spread
    across their distinct (doc_id, pos) carriers instead of landing on
    one reducer. This test seeds the hot corpus, pins the composite-key
    plan (a regression to a segment-only equi-join + post-filter would
    re-create the skew), and checks correctness under skew: exactly one
    occurrence of the hot segment survives corpus-wide and every doc
    reassembles."""
    import os
    import re

    from project_samanvay_a_true_hybrid_htap_database_spark.operators.text import (
        dedup_segments_across_docs,
    )

    n_docs = 2_000
    corpus = str(tmp_path / "hotcorpus")
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(
                F.lit(HOT_SEGMENT + " "),
                F.concat_ws(
                    " ", *[(F.col("id") * 8 + i).cast("string") for i in range(8)]
                ),
            ),
        )
        .otherwise(
            F.concat_ws(
                " ",
                *[(F.col("id") * 8 + i + 100_000).cast("string") for i in range(8)],
            )
        )
        .alias("text"),
        F.lit("en").alias("lang"),
        F.lit("hot").alias("source"),
        F.lit(0).cast("long").alias("n_chars"),
    )
    docs.write.mode("overwrite").parquet(os.path.join(corpus, "documents.parquet"))

    # force the at-scale join strategy: the firsts side is unbounded in
    # production, so pin the sort-merge shape, not a broadcast artifact
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = dedup_segments_across_docs(spark, corpus)
        rows = out.collect()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    # correctness under skew: one survivor of the hot segment, all docs out
    assert len(rows) == n_docs
    assert sum(r.clean_text.count(HOT_SEGMENT) for r in rows) == 1
    hot_docs = [r for r in rows if r.doc_id % 2 == 0]
    assert all(r.n_segments == 2 for r in hot_docs)
    assert sum(r.n_dropped for r in hot_docs) == n_docs // 2 - 1

    # plan pin: the occurrence<->first join key is the COMPOSITE
    # (doc_id, pos, segment), never segment alone
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(
        r"SortMergeJoin \[doc_id#\d+L?, pos#\d+,? segment#\d+\]", plan
    ), f"composite join key missing from plan:\n{plan[:2000]}"
    assert not re.search(r"SortMergeJoin \[segment#\d+\]", plan), (
        "occurrence<->first join regressed to a segment-only key"
    )
