"""Relational operator surface over the driver testdata (SURVEY.md §2).

Each query exercises one operator family: scans, filters, every join
shape, hash/sort aggregates, rollup/cube, window functions, set ops,
scalar string/date/math/JSON functions, and top-k.  Plans are left to
Catalyst — predicates and projections are expressed early so pushdown
and pruning reach the parquet scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_spark.ops.text import floor_round
from etl_spark.queries import load, register

# exact-decimal casts for the 2-decimal money/quantity columns
_PRICE = "decimal(12,2)"
_RATE = "decimal(4,2)"


def _d(col: str, typ: str = _PRICE):
    return F.col(col).cast(typ)


# --------------------------------------------------------------------------
# aggregations
# --------------------------------------------------------------------------


@register(
    "agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
           floor((CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) * 10000) / 10000 AS avg_qty,
           floor((CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) * 10000) / 10000 AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: filtered scan -> hash aggregate (map-side partial)."""
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    disc_price = _d("l_extendedprice") * (1 - _d("l_discount", _RATE))
    charge = disc_price * (1 + _d("l_tax", _RATE))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(_d("l_quantity")), 2).cast("double").alias("sum_qty"),
        F.round(F.sum(_d("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
        F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
        floor_round(F.sum(_d("l_quantity")).cast("double") / F.count("*"), 4).alias(
            "avg_qty"
        ),
        floor_round(F.sum(_d("l_extendedprice")).cast("double") / F.count("*"), 4).alias(
            "avg_price"
        ),
        F.count("*").alias("count_order"),
    )


@register(
    "agg_rollup_flags",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    # local-only: the grouping-sets family is driver-verified by
    # agg_cube_orders (CUBE) and docs_corpus_summary (ROLLUP)
    export=False,
)
def agg_rollup_flags(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(_d("l_quantity")), 2).cast("double").alias("sum_qty"),
        )
    )


@register(
    "agg_cube_orders",
    """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders
    FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
    """,
)
def agg_cube_orders(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "agg_distinct_global",
    """
    SELECT (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_active_customers,
           (SELECT COUNT(DISTINCT l_partkey) FROM lineitem) AS n_parts_ordered,
           (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem) AS n_suppliers_used
    """,
    # local-only: distinct/dedup is driver-verified by cdc_dedup_redelivery
    # and dedup_exact_docs
    export=False,
)
def agg_distinct_global(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").agg(
        F.count_distinct("o_custkey").alias("n_active_customers")
    )
    li = load(spark, sf, "lineitem").agg(
        F.count_distinct("l_partkey").alias("n_parts_ordered"),
        F.count_distinct("l_suppkey").alias("n_suppliers_used"),
    )
    return o.crossJoin(li)


@register(
    "agg_percentiles_orders",
    """
    SELECT o_orderpriority,
           floor(quantile_cont(o_totalprice, 0.50) * 10000) / 10000 AS p50,
           floor(quantile_cont(o_totalprice, 0.95) * 10000) / 10000 AS p95,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_percentiles_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Exact (interpolated) percentiles — percentile_approx would not
    reproduce across engines; the exact form does."""
    return (
        load(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            floor_round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
            floor_round(F.percentile("o_totalprice", F.lit(0.95)), 4).alias("p95"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "agg_event_type_stats",
    """
    SELECT event_type, COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value,
           MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM events GROUP BY event_type
    """,
    # local-only since r4: shares its coverage row (counts/exact-decimal
    # sums) with the exported agg_pricing_summary; its driver-window slot
    # went to cdc_changelog_revisions (a core CDC-out operator that was
    # previously pytest-only).  Still oracle-verified by the parity suite.
    export=False,
)
def agg_event_type_stats(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(_d("value")), 2).cast("double").alias("sum_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------


@register(
    "join_topk_revenue",
    """
    SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS order_date,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
    ORDER BY revenue DESC, o.o_orderkey LIMIT 10
    """,
)
def join_topk_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: dim-filtered broadcast join -> agg -> global top-k
    (TakeOrderedAndProject — no full sort)."""
    c = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    rev = _d("l_extendedprice") * (1 - _d("l_discount", _RATE))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("order_date"))
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "join_region_revenue",
    """
    SELECT r.r_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
                  JOIN customer c ON c.c_nationkey = n.n_nationkey
                  JOIN orders o ON o.o_custkey = c.c_custkey
                  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY r.r_name
    """,
    # local-only: broadcast-dim star joins are driver-verified by
    # join_topk_revenue; this variant stays plan-asserted in pytest
    export=False,
)
def join_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-way star join: three broadcast dims + one fact-fact join."""
    r = load(spark, sf, "region")
    n = load(spark, sf, "nation")
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    rev = _d("l_extendedprice") * (1 - _d("l_discount", _RATE))
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "r_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "join_anti_idle_customers",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_idle_customers(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_semi_segment_counts",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def join_semi_segment_counts(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "join_full_outer_nation_activity",
    """
    WITH cc AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers FROM customer GROUP BY 1),
         ss AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1)
    SELECT COALESCE(cc.nk, ss.nk) AS nationkey,
           COALESCE(cc.n_customers, 0) AS n_customers,
           COALESCE(ss.n_suppliers, 0) AS n_suppliers
    FROM cc FULL OUTER JOIN ss ON cc.nk = ss.nk
    """,
)
def join_full_outer_nation_activity(spark: SparkSession, sf: str) -> DataFrame:
    cc = (
        load(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.count("*").alias("n_customers"))
    )
    ss = (
        load(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return cc.join(ss, cc.nk_c == ss.nk_s, "full_outer").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


# --------------------------------------------------------------------------
# window functions
# --------------------------------------------------------------------------


@register(
    "window_top3_orders",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def window_top3_orders(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_order_gaps",
    """
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS gap_days
    FROM orders
    """,
)
def window_order_gaps(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return load(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias("gap_days"),
    )


@register(
    "window_running_revenue",
    """
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
           AS running_spend
    FROM orders
    """,
)
def window_running_revenue(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(_d("o_totalprice")).over(w), 2).cast("double").alias("running_spend"),
    )


# --------------------------------------------------------------------------
# set operations
# --------------------------------------------------------------------------


# export=False: EXCEPT-distinct is subsumed by setop_except_all_multiset
# in the 50-entry driver window (VERDICT r3 item 5) — the slot went to
# ann_pq_adc_topk; still oracle-verified by the local parity replica
@register(
    "setop_open_not_finished",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    export=False,
)
def setop_open_not_finished(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.subtract(fin)  # EXCEPT (distinct) semantics


@register(
    "setop_parts_both_flags",
    """
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def setop_parts_both_flags(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return r.intersect(a)


@register(
    "setop_union_kinds",
    """
    SELECT 'customer' AS kind, COUNT(*) AS n FROM customer
    UNION ALL
    SELECT 'supplier' AS kind, COUNT(*) AS n FROM supplier
    """,
)
def setop_union_kinds(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").agg(F.count("*").alias("n")).select(
        F.lit("customer").alias("kind"), "n"
    )
    s = load(spark, sf, "supplier").agg(F.count("*").alias("n")).select(
        F.lit("supplier").alias("kind"), "n"
    )
    return c.unionByName(s)


# --------------------------------------------------------------------------
# scalar functions: string / date / math / json / conditional
# --------------------------------------------------------------------------


@register(
    "setop_except_all_multiset",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_except_all_multiset(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT ALL: multiset difference (per-occurrence, not distinct)."""
    o = load(spark, sf, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.exceptAll(fin)


@register(
    "scalar_null_safe_gaps",
    """
    WITH g AS (
      SELECT o_custkey,
             date_diff('day',
               LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS gap
      FROM orders)
    SELECT o_custkey,
           CAST(SUM(CASE WHEN gap IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS first_orders,
           CAST(SUM(CASE WHEN gap IS NOT DISTINCT FROM 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS same_day_repeats
    FROM g GROUP BY o_custkey
    """,
)
def scalar_null_safe_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM) over a column
    that is genuinely null for each customer's first order."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
    g = load(spark, sf, "orders").select("o_custkey", gap.alias("gap"))
    return g.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("gap").eqNullSafe(F.lit(None)), 1).otherwise(0))
        .cast("long")
        .alias("first_orders"),
        F.sum(F.when(F.col("gap").eqNullSafe(F.lit(0)), 1).otherwise(0))
        .cast("long")
        .alias("same_day_repeats"),
    )


@register(
    "scalar_part_catalog",
    """
    SELECT p_partkey,
           UPPER(p_brand) AS brand_u,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           regexp_extract(p_name, '^[a-z]+') AS first_word,
           CONCAT(p_brand, '|', p_type) AS brand_type,
           REPLACE(p_type, ' ', '_') AS type_slug
    FROM part
    """,
)
def scalar_part_catalog(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_extract("p_name", "^[a-z]+", 0).alias("first_word"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_type", " ", "_").alias("type_slug"),
    )


@register(
    "scalar_monthly_orders",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS month_revenue
    FROM orders GROUP BY 1
    """,
)
def scalar_monthly_orders(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .groupBy(F.to_date(F.date_trunc("month", "o_orderdate")).alias("order_month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(_d("o_totalprice")), 2).cast("double").alias("month_revenue"),
        )
    )


@register(
    "scalar_json_props",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def scalar_json_props(spark: SparkSession, sf: str) -> DataFrame:
    """JSON extraction (events.props is a JSON string)."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        load(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.sum(k).alias("sum_k"), F.count("*").alias("n"))
    )


@register(
    "scalar_price_buckets",
    """
    SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'large' END AS bucket,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY 1
    """,
)
def scalar_price_buckets(spark: SparkSession, sf: str) -> DataFrame:
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("large")
    )
    return (
        load(spark, sf, "orders")
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@register(
    "scalar_math_returnflag",
    """
    SELECT l_returnflag,
           floor(SUM(sqrt(l_quantity)) * 10000) / 10000 AS sum_sqrt_qty,
           floor(SUM(ln(l_extendedprice)) * 10000) / 10000 AS sum_log_price,
           CAST(SUM(CAST(floor(l_quantity / 10) AS BIGINT)) AS BIGINT) AS sum_qty_decades,
           CAST(SUM(CAST(l_linenumber % 3 AS BIGINT)) AS BIGINT) AS sum_mod
    FROM lineitem GROUP BY l_returnflag
    """,
)
def scalar_math_returnflag(spark: SparkSession, sf: str) -> DataFrame:
    """Math builtins; double sums rounded well inside accumulation noise."""
    return (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            floor_round(F.sum(F.sqrt("l_quantity")), 4).alias("sum_sqrt_qty"),
            floor_round(F.sum(F.log("l_extendedprice")), 4).alias("sum_log_price"),
            F.sum(F.floor(F.col("l_quantity") / 10).cast("long")).alias("sum_qty_decades"),
            F.sum((F.col("l_linenumber") % 3).cast("long")).alias("sum_mod"),
        )
    )


# --------------------------------------------------------------------------
# sorts / limits / top-k
# --------------------------------------------------------------------------


@register(
    "join_range_error_context",
    """
    SELECT e.event_id AS error_event_id,
           COUNT(c.event_id) AS clicks_before,
           CAST(MAX(c.event_id) AS BIGINT) AS last_click_id
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = e.user_id
     AND c.ts >= e.ts - INTERVAL 60 SECOND AND c.ts < e.ts
    GROUP BY e.event_id
    """,
)
def join_range_error_context(spark: SparkSession, sf: str) -> DataFrame:
    """Range / interval join: clicks by the same user in the 60s before
    each error.  Equi key (user_id) + range predicate — Catalyst plans
    an equi-join with the range as a post-join filter (no BNL)."""
    ev = load(spark, sf, "events")
    e = ev.filter(F.col("event_type") == "error").alias("e")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    cond = (
        (F.col("c.user_id") == F.col("e.user_id"))
        & (F.col("c.ts") >= F.col("e.ts") - F.expr("INTERVAL 60 SECONDS"))
        & (F.col("c.ts") < F.col("e.ts"))
    )
    return (
        e.join(c, cond, "left")
        .groupBy(F.col("e.event_id").alias("error_event_id"))
        .agg(
            F.count(F.col("c.event_id")).alias("clicks_before"),
            F.max(F.col("c.event_id")).cast("long").alias("last_click_id"),
        )
    )


@register(
    "topk_expensive_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def topk_expensive_orders(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
