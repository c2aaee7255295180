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

from pyspark.sql import DataFrame
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
    customer(filtered) broadcasts; lineitem⨝orders shuffles on orderkey.
    orderBy+limit compiles to TakeOrderedAndProject (per-partition top-10,
    no global sort). Deterministic tie-break on l_orderkey."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING")
    ords = t.orders.filter(F.col("o_orderdate") < cutoff)
    li = t.lineitem.filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
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
    """TPC-H Q5 shape: 6-way join rollup. region/nation/supplier broadcast
    (small dims); the only real shuffle co-locates lineitem with orders on
    orderkey. Region filter prunes before any join work."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    ords = t.orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    return (
        t.lineitem.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t.supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )
