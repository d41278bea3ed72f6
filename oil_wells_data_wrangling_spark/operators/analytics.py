"""Analytics operator family (SURVEY.md §2.B).

The reference serves its tables from MySQL (app.py:21-28), implying the
full analytic SQL surface: grouped aggregation, multi-way joins, top-n,
window functions, pivot, rollup, percentiles. Re-expressed here as
Catalyst-optimized DataFrame plans over the star schema.

Scale notes: every aggregate routes through partial (map-side) aggregation
— one shuffle per groupBy. Dimension joins are explicitly broadcast. Sums
of doubles use exact decimal arithmetic (functions/exact.py) so results
are bit-reproducible across partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oil_wells_data_wrangling_spark.functions.exact import dsum, sql_dsum
from oil_wells_data_wrangling_spark.plans.registry import register
from oil_wells_data_wrangling_spark.sources.readers import load_tables

# ---------------------------------------------------------------- Q1-style

_PRICING_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  {sql_dsum('l_extendedprice * (1.0 - l_discount)', 6)} AS sum_disc_price,
  {sql_dsum('l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)', 6)} AS sum_charge,
  ({sql_dsum('l_quantity')} / COUNT(*)) AS avg_qty,
  ({sql_dsum('l_extendedprice')} / COUNT(*)) AS avg_price,
  ({sql_dsum('l_discount', 6)} / COUNT(*)) AS avg_disc,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("agg_pricing_summary", oracle=_PRICING_ORACLE, headline=True)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: one shuffle, map-side partials.

    Averages derive from the already-computed exact sums in a
    post-aggregation projection (no extra decimal aggregates — BigDecimal
    partials are the dominant cost of this query)."""
    t = load_tables(spark, sf_dir)
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    cnt = F.col("count_order")
    return (
        t.lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, 6).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            dsum("l_discount", 6).alias("sum_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            (F.col("sum_qty") / cnt).alias("avg_qty"),
            (F.col("sum_base_price") / cnt).alias("avg_price"),
            (F.col("sum_disc") / cnt).alias("avg_disc"),
            "count_order",
        )
    )


# ---------------------------------------------------------------- Q3-style

_REVENUE_TOPN_ORACLE = f"""
SELECT
  l_orderkey,
  {sql_dsum('l_extendedprice * (1.0 - l_discount)', 6)} AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("join_revenue_topn", oracle=_REVENUE_TOPN_ORACLE, headline=True)
def join_revenue_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: hint-free filtered customer dim (customer scales
    with SF — AQE broadcasts it when it measures small, shuffle-joins
    at 100 TB), one agg shuffle, top-n via sort-limit (Spark plans
    TakeOrderedAndProject — no full sort)."""
    t = load_tables(spark, sf_dir)
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    cutoff = F.lit("1998-06-30 00:00:00").cast("timestamp")
    return (
        t.orders.filter(F.col("o_orderdate") < cutoff)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t.lineitem.filter(F.col("l_shipdate") > cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 6).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------- Q5-style

_REGION_ROLLUP_ORACLE = f"""
SELECT
  r_name,
  n_name,
  {sql_dsum('l_extendedprice * (1.0 - l_discount)', 6)} AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY r_name, n_name
"""


@register("join_region_rollup", oracle=_REGION_ROLLUP_ORACLE, headline=True)
def join_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact filtered then joined to dims; revenue per
    customer nation/region. nation/region are broadcast by HINT (25/5
    rows at ANY scale factor — threshold-proof); the customer dim is
    deliberately NOT hinted (r14 fix: an explicit broadcast(dim) here
    broadcast a CUSTOMER-sized frame — fine at test SFs, fatal at
    100 TB where customer is billions of rows). Declared hint-free,
    AQE picks broadcast when the dim measures small at runtime and a
    shuffle join when it doesn't — the same code is optimal at both
    scales (A/B at sf0.1: output-identical, 0.91 vs 1.04 min-of-3).
    At 100 TB the shuffles are the custkey join and the final agg."""
    t = load_tables(spark, sf_dir)
    dim = (
        t.customer.join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        t.lineitem.join(
            t.orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(dim, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------- windows

_WINDOW_RANK_ORACLE = """
SELECT n_name, c_custkey, c_name, c_acctbal, rk
FROM (
  SELECT n_name, c_custkey, c_name, c_acctbal,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
         ) AS INTEGER) AS rk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
WHERE rk <= 3
"""


@register("window_rank", oracle=_WINDOW_RANK_ORACLE)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation. Deterministic tie-break on
    c_custkey. One shuffle on the partition key."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        t.customer.join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("n_name", "c_custkey", "c_name", "c_acctbal", "rk")
    )


_WINDOW_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_spend
FROM orders
"""


@register("window_running", oracle=_WINDOW_RUNNING_ORACLE)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend over order time (exact decimal prefix sums
    so the result is partition-order independent)."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(30,2)")).over(w).cast("double").alias("running_spend"),
    )


# ---------------------------------------------------------------- distinct

_DISTINCT_ORACLE = """
SELECT
  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem
"""


@register("distinct_count", oracle=_DISTINCT_ORACLE)
def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct counts (Spark expands to partial
    aggregates; see approx_distinct for the sketch-based scale path)."""
    t = load_tables(spark, sf_dir)
    return t.lineitem.agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count_distinct("l_orderkey").alias("n_orders"),
    )


_APPROX_PCT_ORACLE = """
SELECT o_orderpriority,
       ROUND(QUANTILE_CONT(o_totalprice, 0.5), 2) AS p50_exact,
       ROUND(QUANTILE_CONT(o_totalprice, 0.95), 2) AS p95_exact,
       ROUND(QUANTILE_CONT(o_totalprice, 0.99), 2) AS p99_exact,
       TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
FROM orders
GROUP BY o_orderpriority
"""


@register("approx_percentiles", oracle=_APPROX_PCT_ORACLE)
def approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles — the 100 TB path for `percentiles`:
    bounded-memory partial sketches merge instead of a global sort.

    The sketch estimates are engine-specific, so the self-checking
    contract is: exact percentiles (shared with the oracle) plus
    booleans asserting the t-digest estimate lands within 5% relative
    error of exact — the oracle emits literal TRUEs.
    """
    t = load_tables(spark, sf_dir)
    agg = t.orders.groupBy("o_orderpriority").agg(
        F.expr(
            "approx_percentile(o_totalprice, array(0.5, 0.95, 0.99), 10000)"
        ).alias("ap"),
        F.expr("percentile(o_totalprice, array(0.5, 0.95, 0.99))").alias("ep"),
    )
    cols = [F.col("o_orderpriority")]
    for i, p in enumerate(("p50", "p95", "p99")):
        cols.append(F.round(F.col("ep")[i], 2).alias(f"{p}_exact"))
    for i, p in enumerate(("p50", "p95", "p99")):
        cols.append(
            (F.abs(F.col("ap")[i] - F.col("ep")[i]) / F.col("ep")[i] <= F.lit(0.05))
            .alias(f"{p}_ok")
        )
    return agg.select(*cols)


_APPROX_DISTINCT_ORACLE = """
SELECT
  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts_exact,
  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders_exact,
  TRUE AS parts_within_5pct,
  TRUE AS orders_within_5pct
FROM lineitem
"""


@register("approx_distinct", oracle=_APPROX_DISTINCT_ORACLE)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct estimate — the 100 TB path: no shuffle of the
    distinct values themselves, constant-size sketch per partition.

    HLL estimates are engine-specific, so the contract is exact counts
    plus booleans asserting the lgK=14 Datasketches estimate (RSE
    ~0.8%, the rsd=0.01 accuracy class) lands within 5% of exact — the
    oracle emits the exact counts and literal TRUEs.
    """
    t = load_tables(spark, sf_dir)
    # Datasketches HLL (lgK=14, RSE ~0.8% — the rsd=0.01 accuracy
    # class) instead of approx_count_distinct(x, 0.01): the legacy
    # HLL++ aggregate materializes one Long attribute PER REGISTER
    # WORD, so two rsd=0.01 sketches planned 3,278 aggregate
    # attributes — a megabyte plan string and codegen far past the
    # 64KB method limit (measured 10.8s isolated / 90s mid-sweep at
    # sf0.1; 0.5s after the swap). The sketch agg keeps ONE binary
    # buffer per sketch, same constant-size-per-partition scale story.
    # Two separate aggregates joined on their 1-row outputs: folding
    # the sketches into the count_distinct agg plants them inside the
    # Expand pipeline's per-distinct-key groups, so one buffer pair per
    # GROUP crosses the exchange; split out, the sketch agg ships one
    # buffer pair per map task.
    exact = t.lineitem.agg(
        F.count_distinct("l_partkey").alias("n_parts_exact"),
        F.count_distinct("l_orderkey").alias("n_orders_exact"),
    )
    sketch = t.lineitem.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 14))").alias(
            "ap_parts"
        ),
        F.expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey, 14))").alias(
            "ap_orders"
        ),
    )
    agg = exact.crossJoin(F.broadcast(sketch))
    return agg.select(
        F.col("n_parts_exact"),
        F.col("n_orders_exact"),
        (
            F.abs(F.col("ap_parts") - F.col("n_parts_exact"))
            / F.col("n_parts_exact")
            <= F.lit(0.05)
        ).alias("parts_within_5pct"),
        (
            F.abs(F.col("ap_orders") - F.col("n_orders_exact"))
            / F.col("n_orders_exact")
            <= F.lit(0.05)
        ).alias("orders_within_5pct"),
    )


# ---------------------------------------------------------------- semi/anti

_SEMI_ANTI_ORACLE = """
SELECT c_custkey, 'with_orders' AS order_status FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT c_custkey, 'no_orders' AS order_status FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@register("semi_anti_join", oracle=_SEMI_ANTI_ORACLE)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti join: customers with / without orders."""
    t = load_tables(spark, sf_dir)
    keys = t.orders.select("o_custkey")
    cond = F.col("c_custkey") == F.col("o_custkey")
    semi = t.customer.join(keys, cond, "left_semi").select(
        "c_custkey", F.lit("with_orders").alias("order_status")
    )
    anti = t.customer.join(keys, cond, "left_anti").select(
        "c_custkey", F.lit("no_orders").alias("order_status")
    )
    return semi.unionAll(anti)


# ---------------------------------------------------------------- pivot

_PIVOT_ORACLE = """
SELECT
  CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
  CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
  CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
  CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
FROM orders
GROUP BY 1
"""


@register("pivot_status", oracle=_PIVOT_ORACLE)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per year pivoted by status. Explicit pivot values keep the
    plan a single pass (no extra distinct-values job at scale)."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.withColumn("order_year", F.year("o_orderdate"))
        .groupBy("order_year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )


# ---------------------------------------------------------------- rollup

_ROLLUP_ORACLE = """
SELECT r_name, n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_balance,
       CAST(GROUPING(r_name) AS INTEGER) AS g_region,
       CAST(GROUPING(n_name) AS INTEGER) AS g_nation
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


@register("rollup_cube", oracle=_ROLLUP_ORACLE)
def rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals region → nation → grand total with grouping flags."""
    t = load_tables(spark, sf_dir)
    joined = t.customer.join(
        F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal").alias("total_balance"),
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
    )


# -------------------------------------------------------------- grouping_sets

_GSETS_SQL = """
SELECT r_name, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
"""


@register("grouping_sets", oracle=_GSETS_SQL)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint per-region and per-segment totals
    plus grand total in ONE pass) — the generalization of rollup/cube;
    same SQL text runs on both engines."""
    from oil_wells_data_wrangling_spark.sources.readers import load_tables as _lt

    _lt(spark, sf_dir).register_temp_views()
    return spark.sql(_GSETS_SQL)


# ------------------------------------------------------------ window_lag_delta

_LAG_DELTA_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(o_totalprice AS DOUBLE) - lag(CAST(o_totalprice AS DOUBLE)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS spend_delta
FROM orders
"""


@register("window_lag_delta", oracle=_LAG_DELTA_ORACLE)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-order spend delta per customer (lag) — the
    trend-feature window; first order per customer yields NULL."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = F.col("o_totalprice").cast("double")
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        (price - F.lag(price).over(w)).alias("spend_delta"),
    )


# -------------------------------------------------------------- promo_revenue

_PROMO_ORACLE = f"""
SELECT
  CAST(YEAR(l_shipdate) AS INTEGER) AS ship_year,
  ({sql_dsum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END", 6)}
   * 100.0 / {sql_dsum('l_extendedprice * (1.0 - l_discount)', 6)}) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


@register("promo_revenue", oracle=_PROMO_ORACLE)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo revenue share per ship year: conditional
    aggregation over the part join, LIKE-prefix predicate evaluated
    in the scan stage. The part side carries NO broadcast hint (r14:
    part scales with SF — billions of rows at 100 TB); AQE broadcasts
    it when it measures small and shuffle-joins when it doesn't."""
    t = load_tables(spark, sf_dir)
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(F.lit(0.0))
    return (
        t.lineitem.join(
            t.part.select("p_partkey", "p_type"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            (dsum(promo, 6) * F.lit(100.0) / dsum(disc, 6)).alias("promo_pct")
        )
    )


# ---------------------------------------------------------------- sql_serving

_SQL_SERVING = """
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > 0
GROUP BY n_name
"""


@register("sql_serving", oracle=_SQL_SERVING)
def sql_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's raw-SQL surface (the reference serves ad-hoc SQL from
    MySQL; app.py:21-28): register the tables as views, run the SAME ANSI
    SQL text the oracle runs. Catalyst gives the identical optimized plan
    as the DataFrame form."""
    from oil_wells_data_wrangling_spark.sources.readers import load_tables as _lt

    _lt(spark, sf_dir).register_temp_views()
    return spark.sql(_SQL_SERVING)


# ------------------------------------------------------------ salted_agg_join

_SALTED_ORACLE = f"""
SELECT s_name,
       {sql_dsum('l_extendedprice * (1.0 - l_discount)', 6)} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
"""


@register("salted_agg_join", oracle=_SALTED_ORACLE)
def salted_agg_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant aggregation: supplier cardinality is tiny relative
    to lineitem (hot keys), so a naive groupBy(l_suppkey) concentrates
    partitions. Salt the key 16 ways, pre-aggregate, then collapse —
    two shuffles but each uniform; identical result (exact decimal sums
    are associative). Oracle is the *unsalted* join+group, proving the
    rewrite is semantics-preserving."""
    t = load_tables(spark, sf_dir)
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    salted = (
        t.lineitem.withColumn("salt", F.pmod(F.col("l_orderkey"), F.lit(16)))
        .groupBy("l_suppkey", "salt")
        .agg(
            F.sum(disc.cast("decimal(30,6)")).alias("rev_part"),
            F.count(F.lit(1)).alias("cnt_part"),
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum("rev_part").cast("double").alias("revenue"),
            F.sum("cnt_part").alias("n_items"),
        )
    )
    return salted.join(
        t.supplier.select("s_suppkey", "s_name"),
        F.col("l_suppkey") == F.col("s_suppkey"),
    ).select("s_name", "revenue", "n_items")


# ---------------------------------------------------------------- percentiles

_PERCENTILES_ORACLE = """
SELECT o_orderpriority,
       ROUND(QUANTILE_CONT(o_totalprice, 0.5), 2) AS p50,
       ROUND(QUANTILE_CONT(o_totalprice, 0.95), 2) AS p95,
       ROUND(QUANTILE_CONT(o_totalprice, 0.99), 2) AS p99
FROM orders
GROUP BY o_orderpriority
"""


@register("percentiles", oracle=_PERCENTILES_ORACLE)
def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per priority class. At 100 TB
    swap to approx_percentile (t-digest) — kept exact here to match oracle."""
    t = load_tables(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 2).alias("p95"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 2).alias("p99"),
    )


# ------------------------------------------------------------ bucket_quantiles

_BQ_BUCKETS = 1024
_BQ_LO, _BQ_HI = 0.0, 600000.0  # o_totalprice domain (fixed, not data-scanned)

_BUCKET_QUANTILES_ORACLE = f"""
WITH h AS (
  SELECT o_orderpriority,
         CAST(least({_BQ_BUCKETS - 1}, greatest(0,
           CAST(floor((o_totalprice - {_BQ_LO}) / ({_BQ_HI} - {_BQ_LO})
                      * {_BQ_BUCKETS}) AS BIGINT))) AS BIGINT) AS bucket,
         count(*) AS c
  FROM orders
  GROUP BY 1, 2
),
cum AS (
  SELECT o_orderpriority, bucket, c,
         SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY bucket
                      ROWS UNBOUNDED PRECEDING) AS cumc,
         SUM(c) OVER (PARTITION BY o_orderpriority) AS n
  FROM h
)
SELECT o_orderpriority,
  CAST(MAX(n) AS BIGINT) AS n,
  {_BQ_LO} + (MIN(CASE WHEN cumc >= ceil(0.5 * n) THEN bucket END) + 1)
    * ({_BQ_HI} - {_BQ_LO}) / {_BQ_BUCKETS} AS p50_est,
  {_BQ_LO} + (MIN(CASE WHEN cumc >= ceil(0.95 * n) THEN bucket END) + 1)
    * ({_BQ_HI} - {_BQ_LO}) / {_BQ_BUCKETS} AS p95_est,
  {_BQ_LO} + (MIN(CASE WHEN cumc >= ceil(0.99 * n) THEN bucket END) + 1)
    * ({_BQ_HI} - {_BQ_LO}) / {_BQ_BUCKETS} AS p99_est
FROM cum
GROUP BY o_orderpriority
"""


@register("bucket_quantiles", oracle=_BUCKET_QUANTILES_ORACLE)
def bucket_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-bucket histogram quantiles — the sketch whose
    merge is just integer addition, so partial aggregates combine
    map-side and shuffle 1024 counters per group no matter how many
    rows feed them (the t-digest alternative when the value domain is
    known). Deterministic bucket arithmetic gives it an EXACT oracle,
    unlike approx_percentile's engine-specific t-digest."""
    t = load_tables(spark, sf_dir)
    span = _BQ_HI - _BQ_LO
    bucket = F.least(
        F.lit(_BQ_BUCKETS - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col("o_totalprice") - _BQ_LO) / span * _BQ_BUCKETS),
        ),
    ).cast("bigint")
    h = t.orders.groupBy("o_orderpriority", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("o_orderpriority")
    cum = h.select(
        "o_orderpriority",
        "bucket",
        F.sum("c").over(w_cum).alias("cumc"),
        F.sum("c").over(w_all).alias("n"),
    )

    def est(p: float, name: str):
        hit = F.min(
            F.when(F.col("cumc") >= F.ceil(F.lit(p) * F.col("n")), F.col("bucket"))
        )
        return (F.lit(_BQ_LO) + (hit + 1) * span / _BQ_BUCKETS).alias(name)

    return cum.groupBy("o_orderpriority").agg(
        F.max("n").cast("bigint").alias("n"),
        est(0.5, "p50_est"),
        est(0.95, "p95_est"),
        est(0.99, "p99_est"),
    )


# ------------------------------------------------------------------ range_join

_RANGE_JOIN_ORACLE = f"""
WITH periods AS (
  SELECT i AS period_id,
         TIMESTAMP '1996-01-01 00:00:00' + INTERVAL (i * 30) DAY AS p_start,
         TIMESTAMP '1996-01-01 00:00:00' + INTERVAL (i * 30 + 45) DAY AS p_end
  FROM range(24) t(i)
)
SELECT CAST(period_id AS INTEGER) AS period_id,
       CAST(count(*) AS BIGINT) AS n_orders,
       {sql_dsum('o_totalprice')} AS revenue
FROM periods JOIN orders
  ON o_orderdate >= p_start AND o_orderdate < p_end
GROUP BY period_id
"""


@register("range_join", oracle=_RANGE_JOIN_ORACLE)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: orders against overlapping 45-day promo
    periods. Spark has no native range-join operator, and the naive plan
    is a BroadcastNestedLoopJoin that scans every interval per row. The
    scale shape used here: bucketize time into 30-day buckets, explode
    each interval to the buckets it covers (≤2 here), and equi-join on
    the bucket — a hash join whose probe cost is O(1) per row no matter
    how many intervals exist — then re-check the exact bounds. The
    same trick handles point-in-interval joins with millions of
    intervals (IP-range lookup, sensor maintenance windows)."""
    t = load_tables(spark, sf_dir)
    origin = "timestamp'1996-01-01 00:00:00'"
    periods = (
        spark.range(24)
        .select(
            F.col("id").cast("int").alias("period_id"),
            F.expr(
                f"{origin} + make_interval(0, 0, 0, cast(id * 30 as int))"
            ).alias("p_start"),
            F.expr(
                f"{origin} + make_interval(0, 0, 0, cast(id * 30 + 45 as int))"
            ).alias("p_end"),
        )
        # a 45-day interval on a 30-day grid covers exactly 2 buckets
        .select(
            "*",
            F.explode(
                F.array(F.col("period_id"), F.col("period_id") + 1)
            ).alias("bucket"),
        )
    )
    orders = t.orders.withColumn(
        "bucket",
        F.floor(
            F.datediff(F.col("o_orderdate"), F.lit("1996-01-01").cast("date")) / 30
        ).cast("int"),
    )
    joined = orders.join(
        F.broadcast(periods),
        (orders.bucket == periods.bucket)
        & (F.col("o_orderdate") >= F.col("p_start"))
        & (F.col("o_orderdate") < F.col("p_end")),
    )
    return joined.groupBy("period_id").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


# ------------------------------------------------------------------- winsorize

_WINSORIZE_ORACLE = f"""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
),
bounds AS (
  SELECT o_orderpriority,
         MIN(CASE WHEN rn = greatest(1, n * 5 // 100) THEN o_totalprice END) AS lo,
         MIN(CASE WHEN rn = least(n, (n * 95 + 99) // 100) THEN o_totalprice END) AS hi
  FROM ranked GROUP BY o_orderpriority
)
SELECT r.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(b.lo) AS lo, MIN(b.hi) AS hi,
       CAST(COUNT(*) FILTER (r.o_totalprice < b.lo) AS BIGINT) AS n_clipped_low,
       CAST(COUNT(*) FILTER (r.o_totalprice > b.hi) AS BIGINT) AS n_clipped_high,
       {sql_dsum('least(greatest(r.o_totalprice, b.lo), b.hi)')} AS sum_winsorized
FROM ranked r JOIN bounds b ON r.o_orderpriority = b.o_orderpriority
GROUP BY r.o_orderpriority
"""


@register("winsorize", oracle=_WINSORIZE_ORACLE)
def winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group outlier clipping at the discrete 5th/95th order
    statistics. Integer ranks (n*5 div 100) instead of interpolated
    percentiles on purpose: the bounds are exact data values, so the
    clip comparisons and the winsorized sum are bit-identical across
    engines and partitionings — interpolation would put FP noise right
    on the comparison boundary. One window shuffle + a broadcast-sized
    bounds join."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    ranked = t.orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    # integer division: floor for k_lo, ceil for k_hi
    k_lo = F.greatest(F.lit(1).cast("bigint"), F.expr("n * 5 div 100"))
    k_hi = F.least(F.col("n").cast("bigint"), F.expr("(n * 95 + 99) div 100"))
    bounds = (
        ranked.filter((F.col("rn") == k_lo) | (F.col("rn") == k_hi))
        .groupBy("o_orderpriority")
        .agg(
            F.min(F.when(F.col("rn") == k_lo, F.col("o_totalprice"))).alias("lo"),
            F.min(F.when(F.col("rn") == k_hi, F.col("o_totalprice"))).alias("hi"),
        )
    )
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
    return (
        ranked.join(F.broadcast(bounds), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lo").alias("lo"),
            F.min("hi").alias("hi"),
            F.sum((F.col("o_totalprice") < F.col("lo")).cast("long"))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.sum((F.col("o_totalprice") > F.col("hi")).cast("long"))
            .cast("bigint")
            .alias("n_clipped_high"),
            dsum(clipped).alias("sum_winsorized"),
        )
    )


# ------------------------------------------------------------------ skew_report

_SKEW_ORACLE = """
WITH c AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
),
t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS total FROM c),
r AS (
  SELECT o_custkey, n_orders,
         row_number() OVER (ORDER BY n_orders DESC, o_custkey) AS rk
  FROM c
)
SELECT CAST(rk AS INTEGER) AS rank, o_custkey, n_orders,
       ROUND(CAST(n_orders AS DOUBLE) * 100.0 / total, 6) AS pct
FROM r, t WHERE rk <= 10
"""


@register("skew_report", oracle=_SKEW_ORACLE)
def skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis — what you run BEFORE picking a salting
    factor (salted_agg_join) or trusting AQE's skew-join split: the
    top heavy hitters of a join key and their share of the table.

    Scale shape: the per-key count is one partial-agg shuffle; the
    global top-10 over the aggregated key counts plans as
    TakeOrderedAndProject — each partition keeps its local top-10 and
    only those merge — so the unbounded key space never funnels through
    one sorted task (plan-pinned in tests/test_plan_shapes.py). The
    total is a broadcast scalar."""
    t = load_tables(spark, sf_dir)
    counts = t.orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    total = counts.agg(F.sum("n_orders").alias("total"))
    w = Window.orderBy(F.col("n_orders").desc(), F.col("o_custkey"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            "o_custkey",
            "n_orders",
            F.round(F.col("n_orders") * 100.0 / F.col("total"), 6).alias("pct"),
        )
    )


# ------------------------------------------------------------ integrity_report

_INTEGRITY_ORACLE = """
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_orders,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_lineitems,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
     WHERE NOT EXISTS (SELECT 1 FROM customer c
                       WHERE c.c_custkey = o.o_custkey)) AS orphan_orders,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
     WHERE NOT EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_orderkey = l.l_orderkey)) AS orphan_lineitems,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
     WHERE o_custkey IS NULL) AS null_custkeys
"""


@register("integrity_report", oracle=_INTEGRITY_ORACLE)
def integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — the ingestion gate a lake pipeline
    runs before promoting a batch: row counts, orphan foreign keys
    (anti-joins), NULL key rates, one row out.

    Scale shape: each orphan check is a left-anti join on the foreign
    key — Catalyst broadcasts the small parent here and AQE switches to
    a shuffled anti join when the parent outgrows the threshold; counts
    are partial-agg scalars, so the audit's output is one row no matter
    the table size."""
    t = load_tables(spark, sf_dir)
    orders, lineitem, customer = t.orders, t.lineitem, t.customer
    n_orders = orders.agg(F.count(F.lit(1)).alias("n_orders"))
    n_lineitems = lineitem.agg(F.count(F.lit(1)).alias("n_lineitems"))
    orphan_o = (
        orders.join(
            customer, orders.o_custkey == customer.c_custkey, "left_anti"
        ).agg(F.count(F.lit(1)).alias("orphan_orders"))
    )
    orphan_l = (
        lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"
        ).agg(F.count(F.lit(1)).alias("orphan_lineitems"))
    )
    null_ck = orders.filter(F.col("o_custkey").isNull()).agg(
        F.count(F.lit(1)).alias("null_custkeys")
    )
    return (
        n_orders.crossJoin(n_lineitems)
        .crossJoin(orphan_o)
        .crossJoin(orphan_l)
        .crossJoin(null_ck)
    )


# ------------------------------------------------------------------ cdc_apply

_CDC_ORACLE = """
WITH log AS (
  SELECT o_orderkey AS key, o_orderstatus AS status, u.v AS version,
         CASE WHEN (o_orderkey + u.v) % 11 = 0 THEN 'D' ELSE 'U' END AS op
  FROM orders, UNNEST(generate_series(1, o_orderkey % 3 + 1)) AS u(v)
),
latest AS (
  SELECT key, status, version, op FROM (
    SELECT *, row_number() OVER (
      PARTITION BY key ORDER BY version DESC) AS rk
    FROM log) WHERE rk = 1
),
live AS (
  SELECT * FROM latest WHERE op <> 'D'
)
SELECT status,
       CAST(COUNT(*) AS BIGINT) AS n_live,
       CAST(SUM(version) AS BIGINT) AS version_sum
FROM live GROUP BY status
"""


@register("cdc_apply", oracle=_CDC_ORACLE)
def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture apply: collapse a versioned change log
    (upserts + deletes per key) to the live snapshot — the MERGE a
    lakehouse table format runs on every CDC sync, expressed as a
    query. The log is synthesized deterministically from orders (1-3
    versions per key, every 11th (key+version) a delete); latest
    version wins per key, a terminal delete removes the key.

    Scale shape: the winner pick is a key-partitioned rank window
    (WindowGroupLimit-eligible: rank==1 → per-partition partial top-1
    before the shuffle), then a partial-agg rollup — never a
    whole-table sort or driver-side merge loop; the same plan applies
    a billion-row change log."""
    t = load_tables(spark, sf_dir)
    log = t.orders.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("status"),
        F.explode(
            F.sequence(F.lit(1), (F.col("o_orderkey") % 3 + 1).cast("int"))
        ).alias("version"),
    ).withColumn(
        "op",
        F.when((F.col("key") + F.col("version")) % 11 == 0, "D").otherwise("U"),
    )
    w = Window.partitionBy("key").orderBy(F.col("version").desc())
    live = (
        log.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") == 1) & (F.col("op") != "D"))
    )
    return live.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_live"),
        F.sum("version").cast("bigint").alias("version_sum"),
    )


# ------------------------------------------------------ correlated_avg_filter

_SMALLQTY_ORACLE = f"""
WITH pa AS (
  SELECT l_partkey,
         ({sql_dsum('l_quantity')}) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
       {sql_dsum('l_extendedprice')} AS sum_price,
       ROUND(({sql_dsum('l_extendedprice')}) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa ON pa.l_partkey = lineitem.l_partkey
WHERE p_brand = 'Brand#12'
  AND l_quantity < 0.2 * pa.avg_qty
"""


@register("correlated_avg_filter", oracle=_SMALLQTY_ORACLE)
def correlated_avg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style correlated-aggregate filter: revenue lost to
    small orders — lineitems whose quantity is below 20% of the average
    quantity FOR THAT PART. The correlated scalar subquery decorrelates
    into a per-part aggregate joined back on the part key; Catalyst does
    exactly this rewrite for the subquery form too, but writing the
    decorrelated plan makes the shuffle structure explicit.

    Scale shape: the per-part average is a partial-agg shuffle carrying
    (partkey, scaled-sum, count) — map-side combine collapses the fan-in
    before the exchange. The brand filter is pushed into the part scan
    and that dimension side is hint-free (part scales with SF; AQE
    broadcasts when it fits, shuffle-joins at scale); the avg side joins on the same
    l_partkey hash partitioning. Averages derive from exact scaled-int64
    sums (functions/exact.py) so the 0.2×avg threshold — and therefore
    the row set — is bit-identical across engines; the final rollup is a
    single scalar row."""
    t = load_tables(spark, sf_dir)
    pa = t.lineitem.groupBy("l_partkey").agg(
        (dsum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    brand = t.part.filter(F.col("p_brand") == "Brand#12").select("p_partkey")
    return (
        t.lineitem.join(
            brand, F.col("l_partkey") == F.col("p_partkey")
        )
        .join(pa, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            dsum("l_extendedprice").alias("sum_price"),
        )
        .select(
            "n_small",
            "sum_price",
            F.round(F.col("sum_price") / 7.0, 2).alias("avg_yearly"),
        )
    )


# ------------------------------------------------------- top_supplier_revenue

_TOPSUPP_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
  GROUP BY l_suppkey
),
m AS (SELECT MAX(rev_cents) AS best FROM rev)
SELECT s_suppkey, s_name, rev_cents / 100.0 AS total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey CROSS JOIN m
WHERE rev_cents = m.best
"""


@register("top_supplier_revenue", oracle=_TOPSUPP_ORACLE)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style view-max query: the supplier(s) with the highest
    revenue in a quarter — max-equality selection, not top-1, so ties
    all surface (the spec's CREATE VIEW + MAX subquery shape).

    Scale shape: revenue per supplier is one partial-agg shuffle over
    the date-pruned lineitem scan (the predicate reaches the parquet
    reader); the global max is a scalar broadcast back onto the bounded
    per-supplier aggregate, and the name lookup is a hint-free dimension
    join (supplier scales with SF, so AQE decides broadcast-vs-shuffle)
    join. Revenue accumulates as exact bigint cents so the max-equality
    predicate cannot be split by FP addition order — the one failure
    mode a double-summed Q15 has at scale."""
    t = load_tables(spark, sf_dir)
    cents = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("bigint")
    rev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(cents).cast("bigint").alias("rev_cents"))
    )
    best = rev.agg(F.max("rev_cents").alias("best"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("rev_cents") == F.col("best"))
        .join(
            t.supplier.select("s_suppkey", "s_name"),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_cents") / 100.0).alias("total_revenue"),
        )
    )


# ---------------------------------------------------- late_shipment_priority

_LATESHIP_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 30 DAY
)
GROUP BY o_orderpriority
"""


@register("late_shipment_priority", oracle=_LATESHIP_ORACLE)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style EXISTS rollup: orders counted by priority when at
    least one of their lineitems shipped more than 30 days after the
    order date — the late-fulfilment SLA report.

    Scale shape: the EXISTS is a LEFT SEMI join on the order key with
    the lateness predicate as a join-side condition, so each order
    contributes at most one row downstream no matter how many late
    lineitems it has (no DISTINCT repair step, no row explosion). The
    semi join shuffles (orderkey, shipdate) against (orderkey,
    orderdate, priority) — both sides pruned to join columns in their
    scans — and the rollup is a bounded partial agg on priority."""
    t = load_tables(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_shipdate")
    late = t.orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


# -------------------------------------------------------------------- custdist

_CUSTDIST_ORACLE = """
WITH co AS (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM co GROUP BY c_count
"""


@register("custdist", oracle=_CUSTDIST_ORACLE)
def custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style customer order-count distribution: how many
    customers placed 0, 1, 2, … orders — the double-aggregation shape
    (outer join → per-customer count → histogram of counts) that SQL
    engines use to exercise outer-join + re-aggregation planning.

    Scale shape: the LEFT join shuffles both sides on the customer key
    (orders pruned to o_custkey+o_orderkey in the scan); the per-key
    count reuses that partitioning (no second exchange), and the final
    histogram is a bounded partial agg on the count value. COUNT of the
    nullable right key — not COUNT(*) — keeps order-less customers at 0
    instead of 1, the classic Q13 outer-join trap."""
    t = load_tables(spark, sf_dir)
    co = (
        t.customer.select("c_custkey")
        .join(
            t.orders.select("o_custkey", "o_orderkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------- idle_rich_customers

_IDLERICH_ORACLE = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer WHERE c_acctbal > 0.0
),
idle AS (
  SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
  FROM customer c CROSS JOIN avg_bal
  WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * avg_bal.n > avg_bal.s
    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS totacctbal_cents
FROM idle JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name
"""


@register("idle_rich_customers", oracle=_IDLERICH_ORACLE)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style lost-opportunity report: customers with an
    above-average account balance who have never placed an order,
    rolled up by nation — scalar subquery + NOT EXISTS in one plan.

    Scale shape: the global average is a one-row broadcast (computed
    over the positive-balance scan with the filter pushed down); the
    NOT EXISTS is a LEFT ANTI join on the customer key against orders
    pruned to o_custkey in its scan; the nation name is a broadcast
    dimension join and the rollup is bounded by nation count. The
    above-average test is the cross-multiplied integer form
    ``cents(bal) * n > sum_cents`` — no FP division, no partial-sum
    accumulation order, so the qualifying set is bit-identical across
    engines and cluster layouts (the avg-threshold analog of the
    winsorize/percentile integer-rank rule)."""
    t = load_tables(spark, sf_dir)
    avg_bal = t.customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
        .cast("bigint")
        .alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    idle = (
        t.customer.select("c_custkey", "c_nationkey", "c_acctbal")
        .crossJoin(F.broadcast(avg_bal))
        .filter(
            F.round(F.col("c_acctbal") * 100).cast("bigint") * F.col("n")
            > F.col("s")
        )
        .join(
            t.orders.select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_anti",
        )
    )
    return (
        idle.join(
            F.broadcast(
                t.nation.select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_name"
                )
            ),
            "c_nationkey",
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
            .cast("bigint")
            .alias("totacctbal_cents"),
        )
    )


# ------------------------------------------------- disjunctive_filter_revenue

_DISJ_ORACLE = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       {sql_dsum('l_extendedprice * (1.0 - l_discount)', 6)} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size <= 10
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size <= 20
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size <= 30
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register("disjunctive_filter_revenue", oracle=_DISJ_ORACLE)
def disjunctive_filter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style OR-of-ANDs revenue: three disjoint brand/size/
    quantity branches combined in one predicate — the disjunctive-
    pushdown stress test. Catalyst's constraint propagation derives the
    single-side implications (``p_size <= 30``, ``l_quantity BETWEEN 1
    AND 30``, brand IN-list) and pushes them into both scans, so the
    join sees pre-filtered inputs even though no single branch predicate
    is one-sided; the residual OR evaluates post-join.

    Scale shape: the filtered part side broadcasts; one scalar row out.
    Revenue routes through exact scaled-int64 sums."""
    t = load_tables(spark, sf_dir)
    j = t.lineitem.join(
        t.part, F.col("p_partkey") == F.col("l_partkey")
    ).filter(
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size") <= 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size") <= 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & (F.col("p_size") <= 30)
            & F.col("l_quantity").between(20, 30)
        )
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return j.agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(disc_price, 6).alias("revenue"),
    )


# --------------------------------------------------------------- snapshot_diff

_SNAPDIFF_ORACLE = f"""
WITH v1 AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 11 <> 3
),
v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 13 <> 7
),
d AS (
  SELECT CASE WHEN v1.o_orderkey IS NULL THEN 'added'
              WHEN v2.o_orderkey IS NULL THEN 'removed'
              WHEN v1.o_totalprice <> v2.o_totalprice THEN 'changed'
              ELSE 'unchanged' END AS change,
         COALESCE(v2.o_totalprice, 0.0) - COALESCE(v1.o_totalprice, 0.0)
           AS delta
  FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
)
SELECT change, CAST(COUNT(*) AS BIGINT) AS n_keys,
       {sql_dsum('delta', 2)} AS price_delta
FROM d GROUP BY change
"""


@register("snapshot_diff", oracle=_SNAPDIFF_ORACLE)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: diff two versions of the orders table
    by primary key into added / removed / changed / unchanged, with the
    net price delta per class — the audit a lakehouse runs after a CDC
    backfill or a migration to prove the new snapshot is the old one
    plus the intended changes (``cdc_apply`` builds snapshots; this is
    the operator that CHECKS one). Versions are derived
    deterministically from orders: v1 is missing the keys a later
    backfill added, v2 reprices every 5th key and drops the keys a
    retention pass removed.

    Scale shape: one full-outer sort-merge join on the primary key —
    both sides hash-partition on the SAME key so there is exactly one
    exchange each and no fan-out (keys are unique per side); the
    classifier is a projection and the rollup is a 4-group partial
    agg. At 100 TB the join is the floor for an exact diff; the
    storage-layer shortcut (comparing partition/file-level min-max or
    content hashes first and joining only dirty partitions) drops out
    of the same plan when snapshots share file lineage — zorder_stats
    documents the file-stat side of that."""
    t = load_tables(spark, sf_dir)
    base = t.orders.select("o_orderkey", "o_totalprice")
    v1 = base.filter(F.col("o_orderkey") % 11 != 3).withColumnRenamed(
        "o_totalprice", "p1"
    )
    v2 = (
        base.filter(F.col("o_orderkey") % 13 != 7)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.0
            )
            .otherwise(F.col("o_totalprice"))
            .alias("p2"),
        )
    )
    d = v1.join(v2, "o_orderkey", "full_outer").select(
        F.when(F.col("p1").isNull(), "added")
        .when(F.col("p2").isNull(), "removed")
        .when(F.col("p1") != F.col("p2"), "changed")
        .otherwise("unchanged")
        .alias("change"),
        (
            F.coalesce("p2", F.lit(0.0)) - F.coalesce("p1", F.lit(0.0))
        ).alias("delta"),
    )
    return d.groupBy("change").agg(
        F.count(F.lit(1)).alias("n_keys"),
        dsum("delta", 2).alias("price_delta"),
    )


# --------------------------------------------------------------- basket_lift

_BASKET_LIFT_ORACLE = """
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
  FROM read_parquet_lineitem l JOIN read_parquet_part p
    ON l.l_partkey = p.p_partkey
),
n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM baskets),
brand_n AS (SELECT brand, COUNT(*) AS n FROM baskets GROUP BY brand),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS n_co
  FROM baskets a JOIN baskets b
    ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY 1, 2
)
SELECT brand_a, brand_b,
       CAST(n_co AS BIGINT) AS n_co,
       CAST(ca.n AS BIGINT) AS n_a,
       CAST(cb.n AS BIGINT) AS n_b,
       CAST(n_orders AS BIGINT) AS n_orders,
       (CAST(n_co AS DOUBLE) * n_orders) / (CAST(ca.n AS DOUBLE) * cb.n)
         AS lift
FROM pairs
JOIN brand_n ca ON pairs.brand_a = ca.brand
JOIN brand_n cb ON pairs.brand_b = cb.brand
CROSS JOIN n
WHERE n_co >= 5
"""


@register(
    "basket_lift",
    oracle=_BASKET_LIFT_ORACLE.replace(
        "read_parquet_lineitem", "lineitem"
    ).replace("read_parquet_part", "part"),
)
def basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair lift over order lines: for every pair of part
    brands co-purchased in one order, lift = P(a,b) / (P(a)·P(b)) —
    the association-rule signal behind "frequently bought together"
    (and, on a corpus, behind bigram_lift, its text twin).

    Scale shape: ONE lineitem⋈part pass collapses each order to its
    sorted distinct-brand ARRAY (≤ min(25, lines/order) elements), and
    the pair "join" is a per-row nested transform over that array —
    per-order work bounded by (brands per order choose 2), ~7
    lines/order means ≤21 pairs, so pair volume grows LINEARLY in
    orders with NO self-join and no second scan (the naive bucket
    self-join re-computed the join+distinct for both sides and
    measured 30× at the 100× spot-check; this shape measures ~5×).
    Brand totals and the order count are tiny aggregates off the same
    basket frame, broadcast back onto the pair counts; support floor
    n_co ≥ 5 bounds output noise. Lift is one double multiply/divide
    chain per pair (exact same IEEE op order as the oracle:
    double(n_co)·N / (double(n_a)·n_b) — deterministic, no FP
    accumulation anywhere); all counts stay int64."""
    t = load_tables(spark, sf_dir)
    baskets = (
        t.lineitem.select("l_orderkey", "l_partkey")
        .join(t.part.select("p_partkey", "p_brand"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.sort_array(F.collect_set("p_brand")).alias("bs"))
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    brand_n = (
        baskets.select(F.explode("bs").alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pair_expr = (
        "flatten(transform(bs, (a, i) -> "
        "transform(slice(bs, i + 2, size(bs)), b -> struct(a, b))))"
    )
    pairs = (
        baskets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select(F.col("p.a").alias("brand_a"), F.col("p.b").alias("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= 5)
    )
    ca = brand_n.select(
        F.col("brand").alias("brand_a"), F.col("n").alias("n_a")
    )
    cb = brand_n.select(
        F.col("brand").alias("brand_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "n_co",
            "n_a",
            "n_b",
            "n_orders",
            (
                F.col("n_co").cast("double")
                * F.col("n_orders")
                / (F.col("n_a").cast("double") * F.col("n_b"))
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------- rfm_segments

_RFM_LIM = float(2**62 // 100)

_RFM_ORACLE = f"""
WITH ref AS (SELECT MAX(o_orderdate) AS ref_d FROM orders),
cust AS (
  SELECT o_custkey,
         date_diff('day', MAX(o_orderdate), MAX(ref_d)) AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(round((CASE WHEN o_totalprice
                BETWEEN -{_RFM_LIM} AND {_RFM_LIM}
                THEN o_totalprice END) * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders CROSS JOIN ref
  GROUP BY o_custkey
),
scored AS (
  SELECT *,
    CASE WHEN recency_days <= 180 THEN 3
         WHEN recency_days <= 540 THEN 2 ELSE 1 END AS r,
    CASE WHEN frequency >= 15 THEN 3
         WHEN frequency >= 8 THEN 2 ELSE 1 END AS f,
    CASE WHEN cents >= 200000000 THEN 3
         WHEN cents >= 100000000 THEN 2 ELSE 1 END AS m
  FROM cust
)
SELECT CASE WHEN r = 3 AND f = 3 AND m = 3 THEN 'champion'
            WHEN r = 3 AND f >= 2 THEN 'loyal'
            WHEN r = 1 AND m = 3 THEN 'lapsed_big_spender'
            WHEN r = 1 THEN 'at_risk'
            ELSE 'regular' END AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(frequency) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) / 100.0 AS total_monetary
FROM scored GROUP BY 1
"""


@register("rfm_segments", oracle=_RFM_ORACLE)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-value rollup
    (recency / frequency / monetary scored 1-3 on fixed ladders, then
    named segments): the serving-tier aggregate behind retention
    dashboards, and the relational cousin of mix_balance's per-domain
    corpus audit.

    Determinism: recency is integer day arithmetic off a data-derived
    reference date (the max order date, broadcast as a 1-row
    aggregate); monetary stays a scaled-int64 CENTS column through
    BOTH aggregation levels — per-customer and per-segment sums are
    int64 (associative, partition-order-proof), divided back to double
    exactly once at the end. Score ladders are integer comparisons, so
    every segment boundary is bit-exact cross-engine.

    Scale shape: one shuffle to per-customer aggregates (the natural
    key), then a 15-way segment rollup AQE coalesces; the reference
    date is a broadcast scalar, never a window. No row carries more
    than four int64s after the first aggregate."""
    from oil_wells_data_wrangling_spark.functions.exact import (
        _finite_in_window,
    )

    t = load_tables(spark, sf_dir)
    ref = t.orders.agg(F.max("o_orderdate").alias("ref_d"))
    cents_addend = F.round(
        _finite_in_window(F.col("o_totalprice"), 100) * 100
    ).cast("bigint")
    cust = (
        t.orders.crossJoin(F.broadcast(ref))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("ref_d"), F.max("o_orderdate")).alias(
                "recency_days"
            ),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(cents_addend).alias("cents"),
        )
    )
    r = (
        F.when(F.col("recency_days") <= 180, 3)
        .when(F.col("recency_days") <= 540, 2)
        .otherwise(1)
    )
    f_ = (
        F.when(F.col("frequency") >= 15, 3)
        .when(F.col("frequency") >= 8, 2)
        .otherwise(1)
    )
    m = (
        F.when(F.col("cents") >= 200_000_000, 3)
        .when(F.col("cents") >= 100_000_000, 2)
        .otherwise(1)
    )
    scored = cust.select("frequency", "cents", r.alias("r"), f_.alias("f"), m.alias("m"))
    segment = (
        F.when((F.col("r") == 3) & (F.col("f") == 3) & (F.col("m") == 3), "champion")
        .when((F.col("r") == 3) & (F.col("f") >= 2), "loyal")
        .when((F.col("r") == 1) & (F.col("m") == 3), "lapsed_big_spender")
        .when(F.col("r") == 1, "at_risk")
        .otherwise("regular")
    )
    return (
        scored.select(segment.alias("segment"), "frequency", "cents")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("frequency").alias("n_orders"),
            (F.sum("cents") / F.lit(100.0)).alias("total_monetary"),
        )
    )


# ===================================================================
# TPC-H-style coverage completion (round 7, second half): the classic
# query shapes the registry had not yet exercised — multi-dim equality
# joins (Q5/Q7/Q8), cost-model profit (Q9), returned-item CRM (Q10),
# scalar-threshold scans (Q6/Q11), distinct-count grids (Q16), HAVING
# rollups (Q18) and the multi-stage "who blocked the order" report
# (Q21). The testdata has no partsupp table and lineitem carries no
# commitdate/shipmode, so Q2/Q9/Q11/Q16/Q21 are adapted to the columns
# that exist (noted per operator); the join/agg shapes are the point.
# ===================================================================

# ------------------------------------------------------ local_supplier_volume

_LOCALVOL_ORACLE = f"""
SELECT n_name,
       {sql_dsum('l_extendedprice * (1.0 - l_discount)', 6)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


@register("local_supplier_volume", oracle=_LOCALVOL_ORACLE)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style local-supplier volume: revenue by nation where the
    ordering customer and the shipping supplier share a nation inside
    one region — the five-way join with a cross-table equality
    (c_nationkey = s_nationkey) that join reordering has to get right.

    Scale shape: supplier ⋈ nation ⋈ region (region-filtered) collapses
    to one dim (nation/region hinted — schema-bounded; the
    supplier-sized result hint-free, AQE decides), so the only shuffles are
    lineitem ⋈ orders on the order key and the subsequent customer join
    on the customer key; the date filter sits on the orders scan
    (pushed) and prunes before the first shuffle. The
    customer-nation = supplier-nation test rides the customer join as a
    join condition — no post-join filter pass — and the final rollup is
    bounded by nations-per-region."""
    t = load_tables(spark, sf_dir)
    asia_nation = (
        t.nation.join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    supp = (
        t.supplier.select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(asia_nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    return (
        t.lineitem.select(
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t.customer.select("c_custkey", "c_nationkey"),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                6,
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------- forecast_revenue

_FORECAST_ORACLE = f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 6)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24.0
"""


@register("forecast_revenue", oracle=_FORECAST_ORACLE)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style what-if scan: revenue that would be recovered by
    dropping small-quantity mid-discount discounts for one ship year —
    the pure filter-and-sum query whose entire cost is the scan.

    Scale shape: zero joins, zero wide shuffles — all three predicates
    push to the parquet scan (date range + discount range + quantity
    bound all appear in PushedFilters), the projection prunes to the
    two price columns, and the aggregate is a partial-combine into a
    single scalar exchange. This is the query that proves filters and
    pruning reach the source; at 100 TB it is I/O-bound by design."""
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        ).agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------- nation_volume_shipping

_NATVOL_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
       {sql_dsum('l_extendedprice * (1.0 - l_discount)', 6)} AS volume
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_5' AND n2.n_name = 'NATION_12')
    OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_5'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
"""


@register("nation_volume_shipping", oracle=_NATVOL_ORACLE)
def nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style bilateral trade volume: shipped revenue between two
    nations, both directions, per ship year — the query whose WHERE is
    a disjunction over a PAIR of dimension attributes.

    Scale shape: both nation lookups are broadcast (schema-bounded);
    the supplier side is collapsed to a hint-free (suppkey → nation)
    map filtered to the two nations of interest (supplier-sized:
    AQE decides broadcast-vs-shuffle), which prunes lineitem rows at the first
    join. The customer side filters to the same two nations before its
    shuffle join, so the pair-disjunction residual runs on rows already
    restricted to 2×2 nation combinations. Two wide shuffles total
    (order key, customer key); the rollup output is bounded at
    2 directions × years."""
    t = load_tables(spark, sf_dir)
    pair = ("NATION_5", "NATION_12")
    n = t.nation.filter(F.col("n_name").isin(*pair)).select(
        "n_nationkey", "n_name"
    )
    supp = (
        t.supplier.join(
            F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
        ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t.customer.join(
            F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
        ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                6,
            ).alias("volume")
        )
    )


# --------------------------------------------------------------- market_share

_MKTSHARE_ORACLE = f"""
SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
       ({sql_dsum("CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END", 6)}
        / {sql_dsum('l_extendedprice * (1.0 - l_discount)', 6)}) AS mkt_share
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA'
  AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
"""


@register("market_share", oracle=_MKTSHARE_ORACLE)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style national market share: one supplier nation's slice
    of a region's revenue for one part type, per order year — the
    conditional-numerator / unconditional-denominator ratio rollup.

    Scale shape: part (type-filtered), supplier ⋈ nation (the
    numerator tag), and the region-restricted customer-nation dim are
    all hint-free (each scales with SF; AQE broadcasts what fits);
    the part filter prunes lineitem at its first join so the two wide shuffles — order key, then
    customer key — move only qualifying rows. Numerator and
    denominator are computed in ONE aggregation pass as a conditional
    and an unconditional exact scaled-int64 sum; the share is a single
    IEEE division of two partition-order-proof values, so the ratio is
    bit-identical across engines and cluster layouts."""
    t = load_tables(spark, sf_dir)
    part = t.part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    amer_nation = (
        t.nation.join(
            F.broadcast(t.region.filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("cn_key"))
    )
    cust = t.customer.join(
        F.broadcast(amer_nation), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    supp = (
        t.supplier.join(
            F.broadcast(t.nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    tagged = F.when(F.col("supp_nation") == "NATION_3", disc).otherwise(
        F.lit(0.0)
    )
    return (
        t.lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((dsum(tagged, 6) / dsum(disc, 6)).alias("mkt_share"))
    )


# -------------------------------------------------------- product_type_profit

_PROFIT_ORACLE = f"""
SELECT n_name AS nation,
       CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
       {sql_dsum('l_extendedprice * (1.0 - l_discount) - 0.6 * p_retailprice * l_quantity', 4)} AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


@register("product_type_profit", oracle=_PROFIT_ORACLE)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product-line profit by supplier nation and order
    year. The testdata has no partsupp/ps_supplycost, so unit cost is
    modelled as 60% of p_retailprice — the join/agg shape (substring
    part filter, per-row revenue-minus-cost, two-dim rollup) is Q9's.

    Scale shape: part is filtered by the LIKE in its scan and
    broadcast with p_retailprice riding along (so cost needs no second
    part join); supplier → nation collapses to one broadcast map. The
    single wide shuffle is lineitem ⋈ orders on the order key; the
    profit addend is computed per-row in one codegen stage and
    aggregated as an exact scaled-int64 sum, making the rollup
    partition-order-proof. Output is bounded by nations × years."""
    t = load_tables(spark, sf_dir)
    part = t.part.filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    supp = (
        t.supplier.join(
            F.broadcast(t.nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey", F.col("n_name").alias("nation"))
    )
    amount = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        t.lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_discount", "l_quantity",
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(amount, 4).alias("profit"))
    )


# ------------------------------------------------------- returned_item_report

_RETURNED_ORACLE = f"""
SELECT c_custkey, c_name,
       {sql_dsum('l_extendedprice * (1.0 - l_discount)', 6)} AS revenue,
       CAST(c_acctbal AS DOUBLE) AS c_acctbal,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("returned_item_report", oracle=_RETURNED_ORACLE)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item report: the top customers by revenue
    lost to returns in one quarter — the CRM escalation list.

    Scale shape: the return flag and the quarter filter are both pushed
    into their scans before the lineitem ⋈ orders shuffle; the
    customer join shuffles only qualifying order rows, the nation name
    is a broadcast lookup, and the top-20 is a
    TakeOrderedAndProject (per-partition heap + driver merge of 20-row
    heads — no global sort) with the customer key as the total-order
    tie-break so the cut is deterministic."""
    t = load_tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t.lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t.customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                t.nation.select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_name"
                )
            ),
            "c_nationkey",
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                6,
            ).alias("revenue")
        )
        .select(
            "c_custkey", "c_name", "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"), "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ------------------------------------------------------------ important_parts

_IMPPARTS_ORACLE = """
WITH pv AS (
  SELECT l_partkey,
         CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
), tot AS (
  SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents FROM pv
)
SELECT l_partkey,
       CAST(value_cents AS DOUBLE) / 100.0 AS part_value
FROM pv, tot
WHERE value_cents * 10000 > total_cents
ORDER BY value_cents DESC, l_partkey
LIMIT 100
"""


@register("important_parts", oracle=_IMPPARTS_ORACLE)
def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style important-stock scan, adapted to the columns that
    exist (no partsupp: "inventory value" is one nation's shipped
    discounted revenue per part): parts whose value exceeds 1/10000 of
    that nation's total — the scalar-threshold-over-aggregate shape.

    Scale shape: the nation's suppliers collapse to a broadcast key
    set that prunes lineitem before its single wide shuffle (the
    per-part agg); the grand total is a one-row broadcast re-derived
    from the per-part partials, NOT a second scan. The threshold test
    is the cross-multiplied integer form value·10⁴ > total (cents stay
    int64 end-to-end; no FP division), so the qualifying set is
    bit-identical regardless of partitioning; top-100 by value with
    the part key as tie-break keeps the emitted slice deterministic."""
    t = load_tables(spark, sf_dir)
    supp = (
        t.supplier.join(
            F.broadcast(t.nation.filter(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey")
    )
    cents = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("bigint")
    pv = (
        t.lineitem.select(
            "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(cents).cast("bigint").alias("value_cents"))
    )
    tot = pv.agg(F.sum("value_cents").cast("bigint").alias("total_cents"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 10000 > F.col("total_cents"))
        .select(
            "l_partkey",
            (F.col("value_cents").cast("double") / 100.0).alias("part_value"),
            "value_cents",
        )
        .orderBy(F.col("value_cents").desc(), F.col("l_partkey"))
        .limit(100)
        .select("l_partkey", "part_value")
    )


# --------------------------------------------------------- supplier_part_scope

_PARTSCOPE_ORACLE = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_size IN (1, 4, 9, 14, 19, 23)
GROUP BY p_brand, p_type, p_size
"""


@register("supplier_part_scope", oracle=_PARTSCOPE_ORACLE)
def supplier_part_scope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier-diversity grid, adapted (no partsupp:
    who actually shipped a part, from lineitem): distinct supplier
    count per brand/type/size cell, excluding one brand.

    Scale shape: the part dim is filtered in its scan (brand inequality
    + size IN-list both pushed) and broadcast; Spark plans the distinct
    count as the standard two-phase expand — partial dedup of
    (cell, suppkey) map-side, then one shuffle keyed on the cell — so
    repeated (part, supplier) pairs collapse before the wire. Output
    is bounded by the brand × type × size grid, not by lineitem."""
    t = load_tables(spark, sf_dir)
    part = t.part.filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        t.lineitem.select("l_partkey", "l_suppkey")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ------------------------------------------------------ large_volume_customers

_BIGVOL_ORACLE = """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 150
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice, total_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("large_volume_customers", oracle=_BIGVOL_ORACLE)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume customers: orders whose total line
    quantity clears a threshold, with their customers — the
    HAVING-on-aggregate join-back shape.

    Scale shape: quantities are rounded to int64 BEFORE summing (the
    values are integral; rounding first makes Spark's truncating cast
    and DuckDB's rounding cast agree by construction), so the HAVING
    filter is exact and partition-order-proof. The per-order agg is
    the one lineitem-wide shuffle and the HAVING prunes it to a tiny
    key set, so the orders join-back and customer lookup move almost
    nothing; top-20 by order value is a TakeOrderedAndProject with
    the order key as tie-break."""
    t = load_tables(spark, sf_dir)
    qty = F.round(F.col("l_quantity")).cast("bigint")
    big = (
        t.lineitem.select("l_orderkey", qty.alias("q"))
        .groupBy("l_orderkey")
        .agg(F.sum("q").cast("bigint").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(
            t.orders.select(
                "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            t.customer.select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# ----------------------------------------------------- waiting_supplier_report

_WAITSUPP_ORACLE = """
WITH om AS (
  SELECT l_orderkey,
         MAX(l_shipdate) AS max_ship,
         CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp
  FROM lineitem
  GROUP BY l_orderkey
  HAVING COUNT(DISTINCT l_suppkey) >= 2
), winners AS (
  SELECT li.l_orderkey, li.l_suppkey
  FROM lineitem li
  JOIN om ON li.l_orderkey = om.l_orderkey
  WHERE li.l_shipdate = om.max_ship
  GROUP BY li.l_orderkey, li.l_suppkey
), sole AS (
  SELECT l_orderkey, MIN(l_suppkey) AS l_suppkey
  FROM winners
  GROUP BY l_orderkey
  HAVING COUNT(*) = 1
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM sole
JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@register("waiting_supplier_report", oracle=_WAITSUPP_ORACLE)
def waiting_supplier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style "who held up the order" report, adapted to the
    columns that exist (no commitdate: the blocker on a multi-supplier
    order is the UNIQUE supplier whose line shipped last): suppliers
    ranked by how many multi-supplier orders they alone closed out.

    Scale shape: two wide shuffles before the bounded tally — the
    per-(order, supplier) max-shipdate agg (which also dedups repeated
    pairs, so nothing downstream re-scans lineitem), then ONE
    order-keyed exchange shared by two stacked Window passes over the
    identical partition spec (per-order max/count, then the
    count-at-max that needs the max from pass one — Spark sorts once
    and runs both windows on the same partitioning, no second
    exchange, no join-back). The sole-winner filter emits ≤1 row per
    multi-supplier order; only the final per-supplier tally — bounded
    by supplier count — changes key, and the name lookup is
    broadcast."""
    t = load_tables(spark, sf_dir)
    per = (
        t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("smax"))
    )
    w = Window.partitionBy("l_orderkey")
    scored = per.select(
        "l_orderkey",
        "l_suppkey",
        "smax",
        F.max("smax").over(w).alias("max_ship"),
        F.count(F.lit(1)).over(w).alias("n_supp"),
    )
    sole = (
        scored.withColumn(
            "n_at_max",
            F.sum(
                F.when(F.col("smax") == F.col("max_ship"), 1).otherwise(0)
            ).over(w),
        )
        .filter(
            (F.col("n_supp") >= 2)
            & (F.col("smax") == F.col("max_ship"))
            & (F.col("n_at_max") == 1)
        )
        .select(F.col("l_suppkey").alias("w_suppkey"))
    )
    return (
        sole.join(
            t.supplier.select("s_suppkey", "s_name"),
            F.col("w_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


# ---------------------------------------------------------- min_cost_supplier

_MINCOST_ORACLE = """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(round(l_extendedprice * (1.0 - l_discount) / l_quantity * 100) AS BIGINT)) AS unit_cents
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'STANDARD' AND p_size <= 10
  GROUP BY l_partkey, l_suppkey
)
SELECT o.l_partkey AS p_partkey, s_name, n_name,
       CAST(o.unit_cents AS DOUBLE) / 100.0 AS best_unit_price
FROM offers o
JOIN (
  SELECT l_partkey, MIN(unit_cents) AS min_cents
  FROM offers GROUP BY l_partkey
) b ON o.l_partkey = b.l_partkey AND o.unit_cents = b.min_cents
JOIN supplier ON s_suppkey = o.l_suppkey
JOIN nation ON s_nationkey = n_nationkey
ORDER BY best_unit_price DESC, p_partkey, s_name
LIMIT 100
"""


@register("min_cost_supplier", oracle=_MINCOST_ORACLE)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style min-cost sourcing, adapted to the columns that
    exist (no partsupp/ps_supplycost: a supplier's offer for a part is
    the minimum OBSERVED discounted unit price across its shipped
    lines): for each part in a size/type class, the in-region
    supplier(s) whose offer matches the part's minimum, ties kept as
    Q2 keeps them.

    Scale shape: part (type/size-filtered) and the region-restricted
    supplier⋈nation dim are both broadcast, pruning lineitem before
    its ONE wide shuffle — the (part, supplier) offer agg. The
    per-part minimum is a second Window pass over the same
    l_partkey-prefixed partitioning (min over partition, then the
    equality filter), not a self-join — no second scan of offers, no
    extra exchange beyond the window's. Unit price is rounded to
    integer cents per row BEFORE the min ((e·(1−d)/q)·100 — one IEEE
    op sequence, identical both engines), so min and tie-set are
    exact; the top-100 cut carries part key + supplier name
    tie-breaks."""
    t = load_tables(spark, sf_dir)
    part = t.part.filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    ).select("p_partkey")
    eur_supp = (
        t.supplier.select("s_suppkey", "s_name", "s_nationkey")
        .join(
            F.broadcast(
                t.nation.join(
                    F.broadcast(t.region.filter(F.col("r_name") == "EUROPE")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    unit_cents = F.round(
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        / F.col("l_quantity")
        * 100
    ).cast("bigint")
    offers = (
        t.lineitem.select(
            "l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_quantity"
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(eur_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "s_name", "n_name")
        .agg(F.min(unit_cents).alias("unit_cents"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        offers.withColumn("min_cents", F.min("unit_cents").over(w))
        .filter(F.col("unit_cents") == F.col("min_cents"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "n_name",
            (F.col("unit_cents").cast("double") / 100.0).alias(
                "best_unit_price"
            ),
        )
        .orderBy(
            F.col("best_unit_price").desc(), F.col("p_partkey"), F.col("s_name")
        )
        .limit(100)
    )


# ------------------------------------------------- excess_inventory_suppliers

_EXCESSINV_ORACLE = """
WITH red_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
),
sq AS (
  SELECT l_suppkey, l_partkey,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty,
         CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                        AND l_shipdate <  TIMESTAMP '1997-01-01'
                   THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS qty_1996
  FROM lineitem
  JOIN red_parts ON l_partkey = p_partkey
  GROUP BY l_suppkey, l_partkey
),
hot AS (
  SELECT DISTINCT l_suppkey FROM sq WHERE qty_1996 * 2 > total_qty
)
SELECT s_name, n_name
FROM hot
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_3', 'NATION_11', 'NATION_19')
ORDER BY s_name
"""


@register("excess_inventory_suppliers", oracle=_EXCESSINV_ORACLE)
def excess_inventory_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style excess-inventory probe, adapted to the columns
    that exist (no partsupp/ps_availqty: a supplier "holds excess" of a
    part when more than half its ALL-TIME shipped quantity of that part
    moved in one year — the same half-of-demand threshold shape Q20
    applies to availqty): suppliers in a nation set who hold excess of
    any red part. Completes the last of the 22 classic TPC-H query
    shapes in the registry (reference pdf_to_db.py:1 stores an
    analytics-ready MySQL schema; this is the sourcing-audit surface
    that schema implies at engine grade).

    Scale shape: the name-filtered part keys broadcast and prune
    lineitem before its ONE wide shuffle — the (supplier, part)
    quantity agg, with the year split computed as a conditional sum in
    the SAME pass (no second scan, no self-join). The half-threshold is
    the cross-multiplied integer form qty·2 > total (quantities are
    integral by construction; round+cast makes that explicit), so the
    qualifying set is partition-invariant. The surviving supplier keys
    collapse by distinct to at most |supplier| rows before the final
    broadcast joins against the supplier/nation dims — fact-side data
    never touches the output join."""
    t = load_tables(spark, sf_dir)
    red = t.part.filter(F.col("p_name").like("red%")).select("p_partkey")
    qty = F.round(F.col("l_quantity")).cast("bigint")
    in_1996 = (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")
    )
    sq = (
        t.lineitem.select("l_suppkey", "l_partkey", "l_quantity", "l_shipdate")
        .join(red, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(qty).cast("bigint").alias("total_qty"),
            F.sum(F.when(in_1996, qty).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("qty_1996"),
        )
    )
    hot = (
        sq.filter(F.col("qty_1996") * 2 > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    nations = t.nation.filter(
        F.col("n_name").isin("NATION_3", "NATION_11", "NATION_19")
    ).select("n_nationkey", "n_name")
    return (
        hot.join(
            t.supplier.select("s_suppkey", "s_name", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# ------------------------------------------------------------ stream_cdc_apply


@register("stream_cdc_apply", oracle=_CDC_ORACLE)
def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming form of ``cdc_apply``, driven end-to-end: the change
    log arrives as THREE micro-batches (one per version wave — CDC
    shipping order) and ``foreachBatch`` maintains a parquet snapshot
    store by merging each batch against the previous snapshot
    (latest version per key wins, tombstones retained in-store so a
    later version can resurrect a deleted key, filtered only at read
    time). After the last batch the live snapshot must equal batch
    ``cdc_apply``'s — the same oracle checks both, which is the
    exactly-incremental property (max-version merge is
    order-insensitive, so late batches cannot corrupt the snapshot).

    Scale shape: the snapshot store is an ``append_merge_parquet``
    MERGE-ON-READ table — each batch APPENDS its delta (write cost ∝
    batch, never the snapshot; the pre-r12 whole-snapshot rewrite was
    O(snapshot) per batch, quadratic over a long stream), the live
    view applies the keep-latest window over base + deltas, and every
    2nd append compacts the log (exercised LIVE here: three batches →
    one mid-stream compaction), bounding read amplification at the
    amortized LSM trade. Partition-scoped copy-on-write was measured
    first and REJECTED for this workload: CDC keys spray every
    key-hash bucket each wave, so scoped overwrite degenerated to the
    full rewrite plus pruning overhead (1.4–2.7× slower at every
    scale — see sinks.append_merge_parquet; merge_parquet_partitioned
    remains the right tool when change keys cluster by date/region).
    Each merge is one key-ranked window over rows of 4 scalars
    (documents-free); snapshot state is one row per live key, never
    the log history."""
    import os
    import shutil
    import tempfile

    from oil_wells_data_wrangling_spark.sources.sinks import (
        append_merge_parquet,
        dedupe_latest,
        read_merged,
    )

    t = load_tables(spark, sf_dir)
    log = t.orders.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("status"),
        F.explode(
            F.sequence(F.lit(1), (F.col("o_orderkey") % 3 + 1).cast("int"))
        ).alias("version"),
    ).withColumn(
        "op",
        F.when((F.col("key") + F.col("version")) % 11 == 0, "D").otherwise("U"),
    )
    work = tempfile.mkdtemp(prefix="stream_cdc_")
    src = os.path.join(work, "src")
    for v in (1, 2, 3):
        log.filter(F.col("version") == v).coalesce(1).write.parquet(
            os.path.join(src, f"batch{v}")
        )
    store = os.path.join(work, "snapshot")

    def _keep_latest(merged: DataFrame) -> DataFrame:
        return dedupe_latest(merged, ["key"], "version")

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        append_merge_parquet(
            # compact_every=2 is DEMO cadence (forces a live mid-stream
            # compaction within 3 batches); long streams keep the
            # measured default 8 — see append_merge_parquet's docstring
            batch_df, store, _keep_latest, compact_every=2, batch_id=batch_id
        )

    stream = (
        spark.readStream.schema(
            spark.read.parquet(os.path.join(src, "batch1")).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "batch*"))
    )
    q = (
        stream.writeStream.foreachBatch(_merge)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    live = read_merged(spark, store, _keep_latest).filter(F.col("op") != "D")
    res = (
        live.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_live"),
            F.sum("version").cast("bigint").alias("version_sum"),
        )
        .localCheckpoint(eager=True)  # sever lineage so the dir can go
    )
    shutil.rmtree(work, ignore_errors=True)
    return res
