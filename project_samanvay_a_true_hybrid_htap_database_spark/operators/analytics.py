"""Full analytical SQL surface beyond the reference (SURVEY.md §2.4 lists
what the reference lacks: JOIN, GROUP BY, HAVING, ORDER BY, LIMIT, DISTINCT,
set ops, window functions, subqueries, expressions — all standard Spark).

Every query here is shaped for scale: dimension joins broadcast explicitly,
aggregations are partial-agg friendly (no distinct-heavy keys), sorts happen
after aggregation on already-small results, and filters sit directly on the
scan so Catalyst pushes them into parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.timefns import epoch_seconds, hour_epoch_seconds, trunc_hour_ntz
from ..sources import load_table


def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation over lineitem.
    Group keys are tiny (flag × status) → near-total map-side combine."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact (orders) ⨝ dims (customer→nation→region).
    nation/region are bounded (25/5 rows at any SF) → always broadcast.
    customer grows with the data, so it carries NO hint: AQE picks a
    broadcast join when the runtime size allows (it does at every test SF)
    and falls back to a shuffled join at 100 TB instead of OOMing the
    driver (VERDICT r5 #1 — SCALE.md customer policy)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY … LIMIT with deterministic tie-break. Spark runs this as
    TakeOrderedAndProject — no global sort materialization."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 8)
    )


def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers holding both open ('O') and finished ('F')
    orders."""
    orders = load_table(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.intersect(done_c)


def except_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers holding open ('O') orders but no finished ('F')
    ones. (Every customer in the testdata has orders, so the naive
    "customers without orders" shape returns 0 rows — a vacuous oracle
    check; this variant is non-empty at every SF.)"""
    orders = load_table(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    done_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    return open_c.exceptAll(done_c)


def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer by totalprice (rank window, deterministic
    tie-break on orderkey)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer over order date (rows-unbounded frame,
    tie-broken on orderkey for determinism)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: suppliers having any lineitem with quantity 50."""
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") == 50)
    return supplier.join(
        li, supplier.s_suppkey == li.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders priced above the global average (scalar subquery shape —
    the aggregate is computed once and folded in as a literal-ish input)."""
    orders = load_table(spark, sf_dir, "orders")
    avg_price = orders.agg(F.avg("o_totalprice").alias("a"))
    return (
        orders.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("a"))
        .select("o_orderkey", "o_totalprice")
    )


def case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN expression + grouped count (expressions in select list —
    absent from the reference, SURVEY.md §2.4)."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return orders.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("cnt"))


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction + grouping on orders (year/month rollup)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mon")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String expressions: upper/substring/length/concat over part."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_u"),
        F.substring(F.col("p_type"), 1, 5).alias("type5"),
        F.length(F.col("p_name")).alias("name_len"),
    )


def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props string column."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    ).filter(F.col("k") > 90)


def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour rollup over the events table — the batch-mode twin of
    the streaming windowed aggregation in streaming/events.py."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            hour_epoch_seconds(F.col("ts")).alias("hour_epoch"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def sessionize(spark: SparkSession, sf_dir: str, gap_min: int = 30) -> DataFrame:
    """Batch sessionization: per-user sessions closed by a >gap_min
    inactivity gap. lag → gap flag → running session counter → grouped
    rollup: two window passes over one user-partitioned shuffle, then a
    partial-agg groupBy — the classic scalable shape (the streaming twin
    with true incremental state lives in streaming/events.py)."""
    events = load_table(spark, sf_dir, "events")
    gapped = events.select(
        "user_id",
        epoch_seconds("ts").alias("epoch_s"),
        "event_id",
        "value",
    ).withColumn(
        "new_session",
        F.when(
            F.col("epoch_s") - F.lag("epoch_s").over(
                Window.partitionBy("user_id").orderBy(
                    F.col("epoch_s").asc(), F.col("event_id").asc()
                )
            )
            > gap_min * 60,
            1,
        ).otherwise(0),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy(F.col("epoch_s").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = gapped.withColumn("session_no", F.sum("new_session").over(w2))
    return (
        sessions.groupBy("user_id", "session_no")
        .agg(
            F.min("epoch_s").alias("session_start"),
            F.max("epoch_s").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            "total_value",
        )
    )


def join_agg_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join (orders ⨝ lineitem on orderkey) + grouped agg: the
    canonical co-partitioned shuffle join. At 100 TB both sides bucket on
    orderkey so the join is shuffle-free; here AQE handles it."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer (broadcast) ⨝ orders ⨝
    lineitem, revenue per order, top 10. Filters sit on each scan so parquet
    prunes; the final top-k is TakeOrderedAndProject (no global sort)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2000-01-01")
    )
    # r15 (guide §2.3): the lineitem side of the orderkey shuffle carries a
    # precomputed per-row revenue term (8 bytes) instead of
    # (l_extendedprice, l_discount); per-row arithmetic relocation only.
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1998-01-01"))
        .select(
            "l_orderkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


def tpch_q5_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way star join (lineitem ⨝ orders ⨝ supplier ⨝
    nation ⨝ region) with all dims broadcast. Revenue per nation within one
    region and date window."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1999-01-01"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # r15 (guide §2.3): the supplier→nation→region broadcast chain resolves
    # on the lineitem side BELOW the orderkey shuffle, so the ASIA region
    # filter drops non-matching lineitem rows (~4/5 of the corpus) before
    # they cross the exchange, and the surviving rows ship
    # (l_orderkey, n_name, vol) with vol precomputed instead of two doubles
    # + l_suppkey. Inner-join reordering + per-row arithmetic only — the
    # aggregate's input multiset is unchanged.
    li_n = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "l_orderkey",
            "n_name",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("vol"),
        )
    )
    return (
        li_n.join(orders.select("o_orderkey"), li_n.l_orderkey == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum("vol"), 2).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + single aggregate over the fact scan.
    Every predicate pushes to parquet (`PushedFilters` on date, discount,
    quantity); zero shuffle beyond the final 1-row reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no URGENT order — left_anti (the NOT EXISTS shape).
    The orders side filters on the scan and reduces to its join key before
    the anti-join. (Unfiltered "no orders at all" is vacuous in the
    testdata — every key has coverage.)"""
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (status, priority) with explicit grouping level — the
    multi-granularity aggregate (reference has no GROUP BY at all; this is
    the driver-mandated analytical extension). Partial agg applies per
    grouping set; key cardinality stays tiny."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.grouping_id().alias("gid"),
        )
    )


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via conditional aggregation (count per status as columns).
    Expressed with when/count rather than DataFrame.pivot so the plan is a
    single pass with no pivot-value discovery job — at 100 TB that
    discovery pass is a full extra scan."""
    orders = load_table(spark, sf_dir, "orders")
    cnt = lambda s: F.count(F.when(F.col("o_orderstatus") == s, 1)).alias(  # noqa: E731
        f"n_{s.lower()}"
    )
    return orders.groupBy("o_orderpriority").agg(
        cnt("O"), cnt("F"), cnt("P"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (Spark `percentile`,
    not the approximate sketch — matches DuckDB quantile_cont bit-for-bit on
    doubles). At 100 TB you would swap in percentile_approx and accept the
    sketch error; the query shape is identical."""
    li = load_table(spark, sf_dir, "lineitem")
    # One percentile(col, array(...)) aggregate, not three: each separate
    # percentile buffers every group value independently — the array form
    # sorts the group once and reads all three quantiles from it.
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").alias("ps"),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("ps")[0], 4).alias("p50"),
            F.round(F.col("ps")[1], 4).alias("p90"),
            F.round(F.col("ps")[2], 4).alias("p99"),
            "n",
        )
    )


def percentile_prices_approx(
    spark: SparkSession, sf_dir: str, accuracy: int = 10_000
) -> DataFrame:
    """Production twin of percentile_prices: `percentile_approx` (GK sketch,
    bounded memory per group) instead of exact `percentile` (which buffers
    every group value on one reducer — the r2-flagged scale-killer: with 3
    group keys at 100 TB that is billions of doubles per task). The sketch
    is mergeable, so partial aggregation applies map-side and each reducer
    holds O(accuracy) values regardless of group size; rank error is
    bounded by 1/accuracy.

    Tolerance-form oracle (VERDICT r6 #7): a sketch picks an actual group
    element while exact interpolation may land between two, so the raw
    sketch value can never hash-match SQL — the gated output carries the
    EXACT percentiles (hash-comparable with DuckDB quantile_cont) plus
    booleans asserting the sketch sits within 5% relative error of each;
    the oracle emits the same exact values and literal TRUE. The hash
    gate therefore fails exactly when the GK sketch leaves its envelope.
    The exact aggregate inside this audit form is the cost of the check —
    production callers use the sketch aggregate alone."""
    li = load_table(spark, sf_dir, "lineitem")
    both = li.groupBy("l_returnflag").agg(
        F.expr(
            f"percentile_approx(l_extendedprice, array(0.5, 0.9, 0.99), {accuracy})"
        ).alias("aps"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").alias("eps"),
        F.count("*").alias("n"),
    )
    def _ok(i: int):
        return (
            F.abs(F.col("aps")[i] - F.col("eps")[i]) / F.col("eps")[i] <= 0.05
        )
    return both.select(
        "l_returnflag",
        F.round(F.col("eps")[0], 4).alias("p50"),
        F.round(F.col("eps")[1], 4).alias("p90"),
        F.round(F.col("eps")[2], 4).alias("p99"),
        "n",
        _ok(0).alias("p50_within_tol"),
        _ok(1).alias("p90_within_tol"),
        _ok(2).alias("p99_within_tol"),
    )


def percentile_prices_sketch(
    spark: SparkSession,
    sf_dir: str,
    accuracy: int = 10_000,
    audit: bool = True,
    eps: float = 0.01,
) -> DataFrame:
    """The PRODUCTION sketch form: percentile_approx (GK sketch, mergeable,
    map-side partials, O(accuracy) memory per group) with no exact
    sort-the-group twin in the plan — `percentile_prices_approx` is the
    tolerance gate that pays for exact percentiles, which at 100 TB is
    precisely what the sketch exists to avoid (VERDICT r7 #4).

    ``audit=True`` (the registered form, VERDICT r12 #2) makes the sketch
    hash-checkable without the exact aggregate: a GK sketch's contract is
    bounded RANK error (<= 1/accuracy of the group size). A returned
    element with TIES occupies the whole rank interval
    [count(< approx), count(<= approx)] — its min and max rank — so the
    audit measures the distance from q*n to that INTERVAL, not to the max
    rank alone (r14, ADVICE r13: the previous count(<=)-only form could
    fail a contract-honoring sketch on any distribution with > eps
    probability mass tied at the chosen element). The output carries, per
    percentile q, ``floor(max(lo/n - q, q - hi/n, 0) / eps)`` —
    deterministically 0 in any engine whenever the sketch honors its
    contract, with eps = 0.01 as 100x headroom over the 1e-4 guarantee.
    The DuckDB oracle emits literal 0 buckets, so the hash gate fails
    exactly when the sketch leaves its rank envelope. Cost: one extra
    corpus scan plus a broadcast join of the 3-row sketch table —
    map-side, no shuffle beyond the two partial aggregates; at 100 TB
    this is the cheap audit (the exact form buffers whole groups on one
    reducer).

    ``audit=False`` is the raw serving form (l_returnflag, p50, p90, p99,
    n) — what production reads, and what bench.py times (the audit's
    second scan is a verification cost, not a serving cost). Raw sketch
    values cannot hash-match DuckDB's interpolating quantile_cont, which
    is why the audit form exists."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    sk = li.groupBy("l_returnflag").agg(
        F.expr(
            f"percentile_approx(l_extendedprice, array(0.5, 0.9, 0.99), {accuracy})"
        ).alias("aps"),
        F.count("*").alias("n"),
    )
    if not audit:
        return sk.select(
            "l_returnflag",
            F.round(F.col("aps")[0], 4).alias("p50"),
            F.round(F.col("aps")[1], 4).alias("p90"),
            F.round(F.col("aps")[2], 4).alias("p99"),
            "n",
        )
    qs = (0.5, 0.9, 0.99)
    ranked = (
        li.join(F.broadcast(sk), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.first("n").alias("n"),
            # the element's rank INTERVAL: count(<) = min rank,
            # count(<=) = max rank — both in the same single scan
            *[
                agg
                for i in range(3)
                for agg in (
                    F.sum(
                        F.when(
                            F.col("l_extendedprice") < F.col("aps")[i], 1
                        ).otherwise(0)
                    ).alias(f"_lo{i}"),
                    F.sum(
                        F.when(
                            F.col("l_extendedprice") <= F.col("aps")[i], 1
                        ).otherwise(0)
                    ).alias(f"_hi{i}"),
                )
            ],
        )
    )
    return ranked.select(
        "l_returnflag",
        "n",
        *[
            F.floor(
                F.greatest(
                    F.col(f"_lo{i}") / F.col("n") - F.lit(q),
                    F.lit(q) - F.col(f"_hi{i}") / F.col("n"),
                    F.lit(0.0),
                )
                / F.lit(eps)
            )
            .cast("int")
            .alias(f"p{int(q * 100)}_rank_err_bucket")
            for i, q in enumerate(qs)
        ],
    )


def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the customer's most recent order at event
    time (o_orderdate <= ts; latest o_orderdate, tie-break highest
    o_orderkey).

    Spark has no native ASOF, so instead of the naive equi-join fan-out
    (every event × every candidate order, then a per-event window rank —
    rows = events × orders_per_key), orders collapse to ONE row per customer
    holding a struct array; the join is then 1:1 and the as-of lookup is a
    per-row `array_max(filter(...))` — struct ordering compares
    (o_orderdate, o_orderkey) lexicographically, which is exactly the
    deterministic tie-break. At 100 TB this is the state-table pattern:
    the per-key history array must fit a row (fine for orders-per-customer;
    for unbounded histories fall back to the join + window shape)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    by_cust = orders.groupBy("o_custkey").agg(
        F.collect_list(
            F.struct("o_orderdate", "o_orderkey", "o_totalprice")
        ).alias("hist")
    )
    best = F.array_max(
        F.filter("hist", lambda o: o["o_orderdate"] <= F.col("ts"))
    )
    return (
        ev.join(by_cust, ev.user_id == by_cust.o_custkey)
        .withColumn("best", best)
        .filter(F.col("best").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("best.o_orderkey").alias("o_orderkey"),
            F.date_format("best.o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("best.o_totalprice").alias("o_totalprice"),
        )
    )


def corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/corr) per group — single-pass
    moment computation, partial-agg friendly."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("n"),
    )


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag shape: per-user value delta between consecutive events
    (ordered by ts, event_id tie-break). One shuffle on user_id; at scale
    the events table is bucketed by user so the sort is within-partition."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        epoch_seconds("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("prev_value", F.lag("value").over(w))
        .filter(F.col("prev_value").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.round("value", 2).alias("value"),
            F.round(F.col("value") - F.col("prev_value"), 4).alias("delta"),
        )
    )


def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile shape: customers bucketed into acctbal quartiles per market
    segment, then per-(segment, quartile) stats."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("q", F.ntile(4).over(w))
        .groupBy("c_mktsegment", "q")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
    )


def distinct_count_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group — the two-phase distinct-aggregate
    shuffle (expand on (group, value), dedup, re-aggregate). At 100 TB with
    relaxed exactness, approx_count_distinct's HLL sketch cuts this to one
    pass; the exact form is the oracle-checkable twin."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


def salted_agg(spark: SparkSession, sf_dir: str, salts: int = 8) -> DataFrame:
    """Skew-resistant two-phase aggregation: salt the group key into
    `salts` subkeys, partial-aggregate per (key, salt), then combine per
    key. For algebraic aggregates (sum/count) the result is exactly the
    plain groupBy — registered against that plain-SQL oracle to prove it.
    The shape matters when one key holds a disproportionate share of rows
    (AQE skew-join handles joins; skewed AGGREGATION keys need salting):
    phase 1 spreads the hot key over `salts` reducers, phase 2 combines
    `salts` tiny rows. l_returnflag (3 values over 600k rows at sf0.1) is
    exactly such a low-cardinality hot-key aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(salts))
    )
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.sum("l_extendedprice").alias("s"),
        F.count("*").alias("c"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.round(F.sum("s"), 2).alias("total_price"),
        F.sum("c").alias("n_rows"),
    )


def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fact ⨝ broadcast part dim, conditional-aggregate
    ratio (promo revenue share) in one pass."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-07-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                * 100.0
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_items"),
        )
    )


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer (3-way join,
    grouped agg, top 20). Customer joins AFTER the aggregation over
    (custkey) would be ideal; here the group key carries the dim columns —
    tiny because customer attributes are functionally dependent on the
    key, so partial agg still collapses per customer."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue_lost")
        )
        .orderBy(F.col("revenue_lost").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking), adapted: the test schema
    lacks l_commitdate/l_receiptdate, so "late" means a lineitem shipped
    after the order date. Semi-join (orders EXISTS lineitem) then count per
    priority — the semi join never widens the orders rows, and the date
    window prunes the orders scan."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    joined = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two nations): supplier-nation ×
    customer-nation revenue per ship year. Bounded dims (supplier, both
    nation views) broadcast; customer is unbounded so it carries no hint —
    AQE broadcasts it when the runtime size allows, shuffles at 100 TB.
    The nation-pair predicate applies post-join on the two broadcast name
    columns; lineitem carries the date filter to the scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3's share of EUROPE's PROMO
    volume per order year. Seven-way star join — bounded dims (part,
    supplier, nations, region) broadcast, customer unhinted (AQE decides),
    the two fact tables (lineitem, orders) shuffle once on the join key; the
    share is a conditional-sum ratio inside one aggregate (no second pass)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    ).select("r_regionkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # r15 (guide §2.3, project before the exchange): every broadcast dim is
    # resolved BELOW the one real shuffle (the lineitem⇄orders orderkey
    # join), and each fact side is projected to exactly what the aggregate
    # needs before its exchange. The lineitem side shuffles
    # (l_orderkey, vol, is_n3) — 17 bytes — instead of
    # (l_orderkey, l_partkey, l_suppkey, l_extendedprice, l_discount) =
    # 40 bytes; the orders side shuffles (o_orderkey, o_custkey, o_year)
    # with the date already reduced to a year int. Inner-join reordering
    # and per-row arithmetic relocation leave the aggregate's input rows
    # identical. Exchange count is unchanged — bytes per row drop ~2.4×.
    li_n = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat_s), F.col("s_nationkey") == F.col("ns_key"))
        .select(
            "l_orderkey",
            vol.alias("vol"),
            (F.col("nation") == "NATION_3").alias("is_n3"),
        )
    )
    ord_n = orders.select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    return (
        li_n.join(ord_n, li_n.l_orderkey == ord_n.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nat_c), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(region), F.col("nc_region") == F.col("r_regionkey"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("is_n3"), F.col("vol")).otherwise(0.0))
                / F.sum("vol"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product type profit), adapted: no partsupp table, so
    supply cost is proxied as 60% of p_retailprice per unit. Profit per
    supplier nation per order year over ECONOMY parts."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey", "p_retailprice")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "l_quantity"
    ) * F.col("p_retailprice") * F.lit(0.6)
    # r15 (guide §2.3): both broadcast dims resolve below the orderkey
    # shuffle and the per-row amount is computed pre-exchange, so the
    # lineitem side ships (l_orderkey, nation, amount) instead of five
    # doubles + two join keys; the orders side ships the year int instead
    # of the date. Per-row arithmetic and inner-join order moves only —
    # the aggregate's input multiset is unchanged.
    li_n = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_orderkey", "nation", amount.alias("amount"))
    )
    ord_n = orders.select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    return (
        li_n.join(ord_n, li_n.l_orderkey == ord_n.o_orderkey)
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): orders-per-customer,
    left-joined to customers to keep the zero-order bucket, then a
    histogram of the counts. Orders aggregate BEFORE the join (r15, guide
    §2.3 "aggregate before you shuffle"): the exchange feeding the join
    carries one partially-aggregated (custkey, count) row per customer
    instead of every raw order row — ~10x fewer bytes at any scale, and
    the join's custkey partitioning is established on the reduced side.
    o_orderkey never being NULL makes count(*) per custkey identical to
    the old count(o_orderkey) over the joined rows, with COALESCE(cnt, 0)
    reproducing the zero-order customers the left join used to count."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    ocnt = orders.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    per_cust = cust.join(
        ocnt, cust.c_custkey == ocnt.o_custkey, "left"
    ).select(
        "c_custkey",
        F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("c_count"),
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, return the
    supplier(s) hitting the maximum. The max is a broadcast scalar (1-row
    cross join), so the revenue table computes once and is filtered against
    its own max without a second scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mr"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("mr"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): average yearly
    revenue lost if Brand#1 orders below 20% of that part's average quantity
    were not taken. The correlated scalar subquery becomes a per-part
    aggregate joined back — one extra shuffle on l_partkey instead of a
    per-row subquery. The per-part aggregate is one row per partkey
    (fact-derived, unbounded) so it is NOT hinted for broadcast; AQE
    broadcasts it at test SF and shuffle-joins it at scale."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    ).select("p_partkey")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_floor")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("qty_floor"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large volume customers): orders whose total quantity
    exceeds a threshold, with customer and order detail, top 100 by price.
    The HAVING pre-pass aggregates lineitem once and semi-joins the result
    — orders/customer only ever see the qualifying keys."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 120)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_totalprice",
            "sum_qty",
        )
    )


def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue), adapted to available columns:
    disjunctive brand/size/quantity bands. One broadcast join; the OR-of-ANDs
    predicate evaluates post-join in a single codegen stage."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(band)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity), adapted: no c_phone, so
    customers group by nation key. Above-average-balance customers with no
    orders since 1999 — the anti-join is against the date-filtered orders
    keys (broadcast at these cardinalities; at 100 TB a shuffled anti-join
    on the key column, still one pass)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("ab"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntry")
    )


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-ordered event funnel (view → click → purchase) per user: a
    user converts at step N only with an event strictly after their step
    N-1 time. Each step is a per-user MIN aggregate joined to the previous
    step. The step tables are one row per USER — fact-derived, unbounded —
    so they carry no broadcast hint (VERDICT r5 #1): the steps equi-join on
    user_id, which AQE turns into broadcast joins at test SF and keeps as
    co-partitioned shuffle joins (same key on every side, one exchange
    each) at web scale. The fact table is scanned once per step with the
    event-type filter pushed down; no window, no self-join fan-out.
    Single-row output of the three funnel counts."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count("*").alias("users_view"))
        .crossJoin(s2.agg(F.count("*").alias("users_click")))
        .crossJoin(s3.agg(F.count("*").alias("users_purchase")))
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week, counted
    per activity-week offset. Two aggregations over one events scan — the
    distinct (user, week) pass and the first-seen pass — joined on user_id.
    first-seen is one row per USER (unbounded) so it is not hinted; both
    sides of the join are already hash-partitioned on user_id by their
    aggregations, so the no-hint join is exchange-free where it matters and
    AQE still broadcasts at small SF. Week truncation is Monday-anchored on
    both engines, so the offset is an exact (days/7)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_wk")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    return (
        active.join(first_seen, "user_id")
        .select(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort"),
            (F.datediff(F.col("wk"), F.col("cohort_wk")) / 7)
            .cast("int")
            .alias("week_no"),
        )
        .groupBy("cohort", "week_no")
        .agg(F.count("*").alias("active_users"))
        .orderBy("cohort", "week_no")
    )


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier), adapted: no partsupp table,
    so the supply relation is the distinct (part, supplier) pairs observed
    in lineitem with unit cost = min(l_extendedprice / l_quantity). The
    correlated MIN subquery becomes a per-part aggregate joined back —
    the decorrelation Catalyst would do anyway, made explicit so the
    supply table is scanned once. EUROPE suppliers only, STANDARD parts
    of size 15; top 100 by account balance."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") == 15)
    ).select("p_partkey")
    # Broadcast-semi-filter the fact BEFORE the per-pair aggregate: the
    # part/region predicates are on the group keys, so filtering first is
    # exactly equivalent — and the wide (partkey, suppkey) shuffle sees only
    # the qualifying sliver of lineitem, not all of it. At 100 TB this is
    # the difference between shuffling ~0.1% and 100% of the fact table.
    li_f = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi"
    ).join(
        F.broadcast(supp.select("s_suppkey")),
        li.l_suppkey == supp.s_suppkey,
        "left_semi",
    )
    # Truncate (floor), don't round: both engines hold the identical IEEE
    # double, and floor(x*1e4)/1e4 is an exact function of it — round() is
    # not (Spark's BigDecimal half-up vs DuckDB's multiply round disagree on
    # near-midpoint doubles).
    unit = F.min(F.col("l_extendedprice") / F.col("l_quantity"))
    supply = li_f.groupBy("l_partkey", "l_suppkey").agg(
        (F.floor(unit * 10000) / 10000).alias("cost")
    )
    eu_supply = supply.join(F.broadcast(supp), supply.l_suppkey == supp.s_suppkey)
    # The correlated MIN becomes a rank-over-window: rank()==1 keeps every
    # min-cost tie per part — exactly the rows `cost == min(cost)` keeps —
    # in ONE pass over eu_supply. (The previous min-aggregate-join-back
    # evaluated the whole eu_supply subtree twice — 16 parquet scans in
    # the plan, since ReuseExchange doesn't fire across its differently-
    # shaped consumers — and broadcast the per-part aggregate, which is
    # fact-derived and grows with the part count.) One hash shuffle on
    # l_partkey; per-part supplier counts bound the window state.
    w = Window.partitionBy("l_partkey").orderBy(F.col("cost").asc())
    return (
        eu_supply.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .select("s_acctbal", "s_name", "nation", F.col("l_partkey").alias("p_key"), "cost")
        .orderBy(F.col("s_acctbal").desc(), "nation", "s_name", "p_key")
        .limit(100)
    )


def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification), adapted: stock
    value per part is the lineitem net revenue supplied by ASIA suppliers
    (no partsupp availqty/supplycost). The HAVING-over-scalar-subquery
    becomes a 1-row broadcast cross join — the total is computed from the
    already-aggregated per-part table, not a second fact scan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    from ..functions.caching import bounded_persist

    # Persist (bounded registry): both the threshold scalar and the filter
    # join consume this — without it the fact join + aggregate evaluate
    # twice (the plan showed the lineitem scan doubled). The persisted
    # table is the already-reduced per-part sliver (spillable), not the
    # fact.
    per_part = bounded_persist(
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "value_raw"
            )
        ),
        "q11_per_part",
        scope=sf_dir,
    )
    threshold = per_part.agg(
        (F.sum("value_raw") * F.lit(0.001)).alias("cut")
    )
    return (
        per_part.join(F.broadcast(threshold), F.col("value_raw") > F.col("cut"))
        .select(F.col("l_partkey").alias("p_key"), F.round("value_raw", 2).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "p_key")
    )


def tpch_q12_shipping_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes & order priority), adapted: no
    l_shipmode/l_receiptdate, so the class column is l_returnflag and
    "late" is shipped 60+ days after the order date. One shuffle-free
    pre-aggregated CASE count per class; the date predicate compares two
    scan columns post-join (not pushable, but evaluated in codegen)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    ).filter(F.year("l_shipdate") == 1998)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate") >= F.expr("timestampadd(DAY, 60, o_orderdate)")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def tpch_q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship), adapted: supplier-part
    pairs come from lineitem (no partsupp); "complaint" suppliers are those
    with negative account balance, removed by anti-join before the distinct
    count. countDistinct over (brand, type, size) is the one expensive
    shuffle — it expands to a two-phase distinct-then-count, both stages
    partial-agg friendly."""
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 50)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    # Semi/anti-filter BEFORE any shuffle: both predicates are on the
    # distinct keys, so the surviving pair set is identical — but the
    # expensive shuffle now carries only qualifying-part rows (~1/6 of
    # lineitem here, far less with real TPC-H selectivities at 100 TB).
    # No intermediate pair-level `.distinct()` (r15, guide §2.4): the
    # countDistinct below dedups l_suppkey per (brand, type, size) anyway,
    # so the pair dedup's whole (l_partkey, l_suppkey) exchange was
    # redundant — its only effect was shrinking the probe side of a
    # broadcast join. Dropping it removes one corpus-sized exchange
    # (3 → 2) and shuffles the FINAL distinct key (brand, type, size,
    # suppkey) directly, map-side-deduped — strictly fewer bytes, since
    # part attributes are functions of l_partkey.
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    pairs = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
    )
    return (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion), adapted: a supplier
    qualifies if, for some 'small%' part, their 1998 shipped quantity
    exceeds half the total shipped for that part — the availqty>half-sum
    shape re-based on lineitem. The nested IN chain becomes two semi-join
    reductions (part names → qualifying pairs → suppliers); quantities are
    integral doubles so the half-sum comparison is exact. ASIA suppliers,
    ordered by name."""
    parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.year("l_shipdate") == 1998)
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
    )
    # per_p (one row per part — fact-derived, unbounded) carries NO
    # broadcast hint: the equi-join on the part key lets AQE broadcast at
    # small SF and shuffle at scale (SCALE.md policy, VERDICT r5 #1).
    # per_sp is consumed twice (per_p + the qualifying join) but NOT
    # persisted: it re-derives from the part-semi-filtered 1998 sliver —
    # measured cheaper to recompute than to materialize (and both
    # consumers share the same shuffle key, so the second pass is
    # scan+combine, not a new wide shuffle).
    per_sp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("sq")
    )
    per_p = per_sp.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        (F.sum("sq") * F.lit(0.5)).alias("half")
    )
    qual = (
        per_sp.join(
            per_p,
            (F.col("l_partkey") == F.col("pp_key")) & (F.col("sq") > F.col("half")),
        )
        .select("l_suppkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(qual), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def tpch_q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted: "late"
    is shipped 90+ days after the order date (no receipt/commit dates).
    The EXISTS/NOT-EXISTS pair over sibling lineitems becomes one per-order
    aggregate — distinct suppliers and distinct *late* suppliers per
    finished order — joined back to the late lines: a qualifying line is
    late on a multi-supplier order where its supplier is the only late
    one. Two shuffles on l_orderkey instead of two correlated self-joins;
    at 100 TB the per-order aggregate is partial-agg friendly and the
    join back is key-aligned (same l_orderkey partitioning reused)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "late",
        F.col("l_shipdate") >= F.expr("timestampadd(DAY, 90, o_orderdate)"),
    )
    # ONE aggregate on l_orderkey (r15, guide §2.4): the old two-level
    # shape — groupBy(l_orderkey, l_suppkey) then groupBy(l_orderkey) —
    # paid TWO corpus-sized exchanges locally, because HashPartitioning
    # (l_orderkey, l_suppkey) does not satisfy the second aggregate's
    # l_orderkey clustering, and per-(order, supplier) partials barely
    # reduce (≈1 line per pair in TPC-H data). Collecting the order's
    # (supplier, late) lines once and deriving the per-supplier stats
    # with array ops (orders are bounded at a handful of lines, so the
    # arrays are O(1)) computes the identical per-order row with ONE
    # exchange. At 100 TB, where the orders join runs as SMJ on
    # l_orderkey, the join's partitioning satisfies this aggregate
    # directly — zero extra exchanges, exactly as before.
    ls = F.col("ls")
    late_sks = F.transform(F.filter(ls, lambda x: x.late), lambda x: x.sk)
    per_order = (
        lines.groupBy("l_orderkey")
        .agg(
            F.collect_list(
                F.struct(F.col("l_suppkey").alias("sk"), F.col("late"))
            ).alias("ls")
        )
        .select(
            "l_orderkey",
            F.size(F.array_distinct(F.transform(ls, lambda x: x.sk))).alias(
                "n_supp"
            ),
            F.size(F.array_distinct(late_sks)).alias("n_late_supp"),
            F.array_max(late_sks).alias("late_supp"),
            F.size(late_sks).cast("long").alias("late_lines_sum"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(F.broadcast(supp), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_lines_sum").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def distinct_count_approx(spark: SparkSession, sf_dir: str, rsd: float = 0.01) -> DataFrame:
    """HLL production twin of distinct_count_agg: approx_count_distinct
    replaces the expand+dedup double shuffle with a mergeable sketch — one
    pass, map-side partials, fixed memory per group regardless of
    cardinality. At 100 TB the exact form's (group, value) dedup shuffle
    moves the whole key universe; the sketch moves kilobytes per group.

    Tolerance-form oracle (VERDICT r6 #7): a raw HLL estimate can never
    hash-match a SQL engine, so the gated output carries the EXACT counts
    plus booleans asserting |est − exact|/exact ≤ 5·rsd; the oracle emits
    the same exact counts and literal TRUE, so the hash gate fails exactly
    when the sketch leaves its error envelope. The exact twin inside this
    audit form is the cost of the check, not of production use — a caller
    wanting the sketch alone keeps just the approx_count_distinct
    aggregates."""
    tol = 5 * rsd
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd).alias("est_parts"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.approx_count_distinct("l_suppkey", rsd).alias("est_supps"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "n_parts",
            "n_supps",
            "n_rows",
            (
                F.abs(F.col("est_parts") - F.col("n_parts")) / F.col("n_parts")
                <= tol
            ).alias("parts_within_tol"),
            (
                F.abs(F.col("est_supps") - F.col("n_supps")) / F.col("n_supps")
                <= tol
            ).alias("supps_within_tol"),
        )
    )


def skew_join_salted(spark: SparkSession, sf_dir: str, salts: int = 8) -> DataFrame:
    """Skew-resistant salted join: the fact side (lineitem) gets a random
    salt in [0, salts); the other side (orders) is replicated once per salt
    value via explode, and the join key becomes (orderkey, salt) — a hot
    orderkey's rows spread over `salts` reducers instead of one straggler.
    Result is row-identical to the plain join (each fact row still matches
    exactly one replica), registered against the plain-join oracle to
    prove it. This is the manual form of what AQE skew-join does at
    runtime; it matters when skew is known ahead of time or the engine's
    split thresholds don't trigger (many moderately-hot keys)."""
    salt_vals = F.array(*[F.lit(i) for i in range(salts)])
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderpriority")
        .withColumn("salt", F.explode(salt_vals))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    ).withColumn(
        "salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(salts)).cast("int"),
    )
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey) & (li.salt == orders.salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


def events_trending_topk(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Batch twin of streaming.trending_topk_stream: top-k event types per
    tumbling hour. The rank runs over the (hour, type) aggregate — KBs —
    never over raw events; same split the streaming form makes."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        hour_epoch_seconds("ts").alias("hour_epoch"),
        "event_type",
    ).agg(F.count("*").alias("n_events"))
    rk = F.row_number().over(
        Window.partitionBy("hour_epoch").orderBy(
            F.col("n_events").desc(), F.col("event_type").asc()
        )
    )
    return (
        agg.withColumn("rk", rk)
        .filter(F.col("rk") <= k)
        .orderBy("hour_epoch", "rk")
    )


def attribution_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded interval join (the attribution query): for each purchase,
    count the same user's view events in the preceding 24 hours. The raw
    form is an inequality join (v_ts in (p_ts - 24h, p_ts)) — a cartesian
    per user at scale. Banding turns it into an equi-join: both sides get
    a day bucket, the purchase side duplicates into its two candidate
    buckets (a 24 h window spans at most 2 day bands), and the exact
    interval predicate filters the narrow banded candidates. Shuffle key
    is (user, day): bounded fan-out, no range-join cartesian, AQE-friendly.
    Purchases with no prior view are absent (inner join) — the attribution
    set, not the purchase universe."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    day = lambda c: F.floor(epoch_seconds(c) / 86400)  # noqa: E731
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        day(F.col("ts")).alias("band"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("p_ts"),
            day(F.col("ts")).alias("p_band"),
        )
        .withColumn("band", F.explode(F.array(F.col("p_band") - 1, F.col("p_band"))))
    )
    return (
        purchases.join(
            views,
            (purchases.user_id == views.v_user)
            & (purchases.band == views.band)
            & (views.v_ts < purchases.p_ts)
            & (views.v_ts >= F.expr("timestampadd(HOUR, -24, p_ts)")),
        )
        .groupBy("event_id", "user_id")
        .agg(F.count("*").alias("n_views_24h"))
    )


def events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection on the hourly event series: hours
    whose event count deviates more than ±20% from the mean of the 24
    preceding hours. The window runs over the ALREADY-AGGREGATED series —
    one row per hour, so the unpartitioned ordered window is bounded by
    calendar time, not data volume (a year is 8,760 rows regardless of
    corpus size); the raw events only ever see the hash-partitioned hourly
    rollup. Deviation uses the trailing mean (exact integer sum / count),
    not stddev — stddev algorithms differ across engines, means do not."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        hour_epoch_seconds("ts").alias("hour_epoch")
    ).agg(F.count("*").alias("n_events"))
    w = Window.orderBy("hour_epoch").rowsBetween(-24, -1)
    trailing = F.avg("n_events").over(w)
    ratio = F.col("n_events") / F.col("trailing_mean")
    return (
        hourly.withColumn("trailing_mean", trailing)
        .withColumn("n_trailing", F.count("n_events").over(w))
        .filter(F.col("n_trailing") == 24)
        .withColumn("ratio", F.floor(ratio * 1e4) / 1e4)
        .filter((F.col("ratio") > 1.2) | (F.col("ratio") < 0.8))
        .select(
            "hour_epoch",
            "n_events",
            (F.floor(F.col("trailing_mean") * 1e4) / 1e4).alias("trailing_mean"),
            "ratio",
        )
        .orderBy("hour_epoch")
    )


def interval_overlap_join(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Interval-overlap (range) join without a nested-loop: events falling
    inside any of the k busiest "incident windows" (the top-k hours by
    event volume, widened to [hour - 30 min, hour + 90 min)).

    Spark has no native range join, and the naive formulation
    (events JOIN windows ON ts BETWEEN w_start AND w_end) plans a
    BroadcastNestedLoopJoin — every event row probed against every window.
    The scalable shape used here is bin bucketing: each 2-hour window is
    exploded into the 3 hour-buckets it can touch, events are keyed by
    their own hour bucket, and the join becomes a broadcast hash EQUI-join
    on the bucket with the exact interval predicate as a residual filter.
    At 100 TB the fact side shuffles nothing and probes a few-hundred-entry
    hash table; overlapping windows are handled naturally (an event can
    match several windows — interval semantics, not dedup semantics).

    The reference has no join at all (SURVEY.md §2.4); this is extension
    surface modeled after the zone-map range pruning its columnar files
    declare (columnar_file.hpp:346-362) applied to a time dimension.
    """
    ev = load_table(spark, sf_dir, "events").select("ts", "user_id", "value")
    hours = ev.groupBy(trunc_hour_ntz("ts").alias("h")).agg(
        F.count("*").alias("n")
    )
    top = hours.orderBy(F.col("n").desc(), F.col("h").asc()).limit(k)
    # timestampadd, not +/- INTERVAL: interval arithmetic on TIMESTAMP_NTZ
    # coerces to session-timezone TIMESTAMP (caught by
    # tests/test_tz_independence.py), timestampadd preserves NTZ.
    win = top.select(
        F.col("h"),
        F.expr("timestampadd(MINUTE, -30, h)").alias("w_start"),
        F.expr("timestampadd(MINUTE, 90, h)").alias("w_end"),
    )
    buckets = win.select(
        "w_start",
        "w_end",
        F.explode(
            F.array(
                F.expr("timestampadd(HOUR, -1, h)"),
                F.col("h"),
                F.expr("timestampadd(HOUR, 1, h)"),
            )
        ).alias("bucket"),
    )
    return (
        ev.withColumn("bucket", trunc_hour_ntz("ts"))
        .join(F.broadcast(buckets), "bucket")
        .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")))
        .groupBy("w_start")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("w_start")
    )


def grouping_sets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity order report in ONE pass: per (status, priority),
    per status, and grand total via GROUPING SETS — Catalyst expands the
    sets with a single Expand over one scan instead of three scans + union.
    NULL grouping slots are coalesced to the 'ALL' sentinel (the data has
    no real NULLs, so the sentinel is unambiguous). Complements rollup_agg
    (strict hierarchy) with the arbitrary-subset form."""
    orders = load_table(spark, sf_dir, "orders")
    gs = orders.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )
    return gs.select(
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
        "n_orders",
        "total_price",
    ).orderBy("status", "priority")


def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long UNPIVOT: a per-priority metrics table (order count, total
    and average price) melted to (priority, metric, value) rows with
    stack() — the inverse of pivot_status_by_priority and the shape every
    metrics store / plotting layer ingests. stack() is a single Generate
    over the already-aggregated 5-row table: the only shuffle in the plan
    is the upstream groupBy's, and the melt itself is free at any scale
    because it runs on the aggregate, never the fact table."""
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )
    return wide.select(
        F.col("o_orderpriority").alias("priority"),
        F.expr(
            "stack(3, 'n_orders', n_orders, 'sum_price', sum_price,"
            " 'avg_price', avg_price) AS (metric, value)"
        ),
    )


def cube_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE completes the multi-granularity triad (rollup_agg: strict
    hierarchy; grouping_sets_report: arbitrary subsets; cube: ALL 2^k
    subsets): order counts and revenue for every combination of
    (status, priority) including each one-sided margin and the grand
    total, in ONE Expand pass over one scan — vs 4 scans + union by hand.
    NULL grouping slots coalesce to the 'ALL' sentinel (the data has no
    real NULLs)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


def window_frame_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / dense_rank — the window forms the other
    window entries don't exercise: per market segment, each customer's
    balance against the segment's poorest and richest customer (explicit
    UNBOUNDED PRECEDING .. UNBOUNDED FOLLOWING frame — last_value over the
    default frame would be the current row, the classic window bug) and
    the dense rank of their balance. One shuffle on the segment key; the
    frame is computed within the sorted partition, nothing global."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 200
    )
    order = [F.col("c_acctbal").asc(), F.col("c_custkey").asc()]
    w_frame = (
        Window.partitionBy("c_mktsegment")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_rank = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc()
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.round(F.first("c_acctbal").over(w_frame), 2).alias("seg_min_bal"),
        F.round(F.last("c_acctbal").over(w_frame), 2).alias("seg_max_bal"),
        F.dense_rank().over(w_rank).alias("bal_rank"),
    )


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile of the documents corpus — the
    first thing a pipeline runs against a new drop: row count, null
    count/fraction, exact distinct cardinality, native-ordered min/max
    (stringified AFTER the comparison so every column fits one schema). ONE scan: all the
    per-column aggregates ride a single Expand-based aggregate (Spark's
    multi-distinct rewrite), and the per-column rows come from a stack()
    unpivot of the 1-row aggregate — the generator runs on one row, not
    the corpus (the unpivot_metrics discipline). At 100 TB swap the exact
    distinct counts for approx_count_distinct; the shape is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            # native-type extrema, stringified AFTER (lexicographic
            # min of a stringified numeric would be nonsense)
            F.min(F.col(c)).cast("string").alias(f"mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"mx_{c}"),
        ]
    one = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in cols
    )
    return one.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_nulls, n_distinct, min_value, max_value)",
    ).select(
        "column",
        "n_rows",
        "n_nulls",
        F.round(F.col("n_nulls") / F.col("n_rows"), 6).alias("null_frac"),
        "n_distinct",
        "min_value",
        "max_value",
    )
