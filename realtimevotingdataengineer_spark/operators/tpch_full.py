"""TPC-H query-shape closure (q4..q22) over the driver star schema.

Complements operators/tpch.py (q1/q2/q3/q5/q7/q10): every remaining
TPC-H shape, adapted to this schema's reduced column set (no partsupp,
no commit/receipt dates, no phone/comment columns — each adaptation is
noted per query). These are the "capability closure at fact scale" of
the reference's tally/rank analytics (SURVEY.md §2.4-§2.5): existential
joins, scalar-subquery thresholds, conditional aggregation, disjunctive
predicates, group-count histograms, argmax-by-group.

Exactness rules (see functions.dec): all money math in DECIMAL, ratios
as a single double division of exact decimal sums, every ORDER BY fully
tie-broken.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import dec, disc_price
from ..registry import register
from ..sources.tables import Tables

# mirror operators/tpch.py digit-for-digit
_DP = (
    "CAST(l_extendedprice AS DECIMAL(15,2)) * "
    "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


@register(
    "q4_order_priority",
    "SELECT o_orderpriority, count(*) AS order_count FROM orders "
    "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' "
    "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
    "AND l_shipdate > o_orderdate) "
    "GROUP BY o_orderpriority ORDER BY o_orderpriority",
)
def q4_order_priority(t: Tables) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-correlated semi-join + agg. (Adapted: the
    lateness predicate is l_shipdate > o_orderdate since this schema has
    no commit/receipt dates.) The semi-join shuffles once on orderkey and
    emits each order at most once — no fact-side row multiplication."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    ords = t.orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    return (
        ords.join(t.lineitem, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q6_forecast_revenue",
    "SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)) * "
    "CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue "
    "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
    "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24",
)
def q6_forecast_revenue(t: Tables) -> DataFrame:
    """TPC-H Q6: pure scan-filter-agg — the minimal bandwidth-bound plan.
    All three predicates push into the parquet scan (PushedFilters); the
    agg is a single partial+final sum with no group keys. At 100 TB this
    is the query that proves the scan path is not the bottleneck."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= lo)
        & (F.col("l_shipdate") < hi)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(dec("l_extendedprice", 15, 2) * dec("l_discount", 4, 2))
        .cast("double")
        .alias("revenue")
    )


@register(
    "q8_market_share",
    "SELECT o_year, CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume "
    "ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE) / "
    "CAST(sum(volume) AS DOUBLE) AS mkt_share FROM ("
    "SELECT CAST(year(o_orderdate) AS INT) AS o_year, "
    f"{_DP} AS volume, n2.n_name AS nation "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "JOIN supplier ON s_suppkey = l_suppkey "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation n1 ON c_nationkey = n1.n_nationkey "
    "JOIN region ON n1.n_regionkey = r_regionkey "
    "JOIN nation n2 ON s_nationkey = n2.n_nationkey "
    "WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY') "
    "GROUP BY o_year ORDER BY o_year",
)
def q8_market_share(t: Tables) -> DataFrame:
    """TPC-H Q8 shape: a supplier nation's market share inside one
    customer region, by year — conditional-sum ÷ total-sum over an
    8-table join. nation/region carry broadcast hints (SF-invariant,
    25/5 rows); part and supplier are SF-proportional so they carry NO
    hint — the threshold auto-broadcasts them at bench SF (identical
    physical plan) and AQE shuffles them at the 100 TB design point.
    The ratio is one double division of two exact decimal sums."""
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    joined = (
        t.lineitem.join(
            t.part.filter(F.col("p_type") == "ECONOMY"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(t.region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .filter(F.col("r_name") == "AMERICA")
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            disc_price().alias("volume"),
            "nation",
        )
    )
    num = F.sum(
        F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
            dec(F.lit(0), 4, 2)
        )
    ).cast("double")
    den = F.sum("volume").cast("double")
    return (
        joined.groupBy("o_year")
        .agg((num / den).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    "SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit FROM ("
    "SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year, "
    f"CAST({_DP} AS DECIMAL(25,4)) - "
    "CAST(CAST(p_retailprice AS DECIMAL(15,2)) * CAST(l_quantity AS DECIMAL(15,2)) "
    "* CAST(0.5 AS DECIMAL(2,1)) AS DECIMAL(25,4)) AS amount "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "JOIN supplier ON s_suppkey = l_suppkey "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE p_name LIKE '%red%') "
    "GROUP BY nation, o_year ORDER BY nation, o_year",
)
def q9_product_profit(t: Tables) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × year for parts whose
    name matches a pattern. (Adapted: cost is 0.5×p_retailprice×quantity
    since this schema has no partsupp.ps_supplycost.) part and supplier
    are SF-proportional — no broadcast hints; threshold/AQE decide.
    Profit stays exact DECIMAL until the final cast."""
    amount = dec(disc_price(), 25, 4) - dec(
        dec("p_retailprice", 15, 2) * dec("l_quantity", 15, 2) * dec(F.lit(0.5), 2, 1),
        25,
        4,
    )
    return (
        t.lineitem.join(
            t.part.filter(F.col("p_name").like("%red%")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


@register(
    "q11_important_stock",
    "WITH val AS (SELECT l_partkey, "
    "sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS v "
    "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE n_name IN ('NATION_1', 'NATION_2') GROUP BY l_partkey) "
    "SELECT l_partkey, CAST(v AS DOUBLE) AS part_value FROM val "
    "WHERE CAST(v AS DOUBLE) > (SELECT CAST(sum(v) AS DOUBLE) * 0.001 FROM val) "
    "ORDER BY part_value DESC, l_partkey",
)
def q11_important_stock(t: Tables) -> DataFrame:
    """TPC-H Q11 shape: per-part value vs a global-total threshold — a
    scalar subquery realized as a 1-row broadcast cross-join (no driver
    collect). (Adapted: value is lineitem revenue restricted to two
    supplier nations; no partsupp.) Threshold compare is double-vs-double
    with the scale-2 decimal sums converted once each."""
    val = (
        t.lineitem.join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice", 18, 2)).alias("v"))
        .localCheckpoint(eager=True)  # reused by both the threshold and the filter
    )
    threshold = val.agg((F.sum("v").cast("double") * F.lit(0.001)).alias("thr"))
    return (
        val.crossJoin(F.broadcast(threshold))
        .filter(F.col("v").cast("double") > F.col("thr"))
        .select("l_partkey", F.col("v").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


@register(
    "q12_priority_shipping",
    "SELECT l_linestatus, "
    # CAST AS BIGINT: uncast DuckDB sums are HUGEINT → float64 via
    # fetch_df vs Spark's bigint (same dtype divergence that failed
    # corpus_domain_stats / events_error_rate_daily in round 2).
    "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
    "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
    "CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
    "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
    "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
    "GROUP BY l_linestatus ORDER BY l_linestatus",
)
def q12_priority_shipping(t: Tables) -> DataFrame:
    """TPC-H Q12 shape: conditional counts of urgent vs non-urgent order
    priorities per line status. (Adapted: grouped by l_linestatus — this
    schema has no l_shipmode.) One orderkey shuffle; the CASE sums fold
    map-side."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    li = t.lineitem.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q13_customer_distribution",
    "SELECT c_count, count(*) AS custdist FROM ("
    "SELECT c_custkey, count(o_orderkey) AS c_count FROM customer "
    "LEFT JOIN orders ON c_custkey = o_custkey "
    "AND o_orderpriority <> '5-LOW' GROUP BY c_custkey) "
    "GROUP BY c_count ORDER BY custdist DESC, c_count DESC",
)
def q13_customer_distribution(t: Tables) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer histogram via LEFT OUTER with
    an extra join predicate (so zero-order customers survive with count
    0), then a second tiny agg over the counts. (Adapted: the excluded
    class is o_orderpriority='5-LOW'; no o_comment.)"""
    per_cust = (
        t.customer.join(
            t.orders.filter(F.col("o_orderpriority") != "5-LOW"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q14_promo_revenue",
    "SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN "
    f"{_DP} ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE) / "
    f"CAST(sum({_DP}) AS DOUBLE) AS promo_revenue "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00' "
    "AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'",
)
def q14_promo_revenue(t: Tables) -> DataFrame:
    """TPC-H Q14: promo revenue share in one month. part broadcasts; the
    month filter prunes the fact scan. Ratio = (100·num)/den computed
    left-assoc in double on both engines."""
    lo = F.lit("1996-09-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-10-01 00:00:00").cast("timestamp")
    li = t.lineitem.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
    num = F.sum(
        F.when(F.col("p_type") == "PROMO", disc_price()).otherwise(dec(F.lit(0), 4, 2))
    ).cast("double")
    den = F.sum(disc_price()).cast("double")
    return (
        li.join(t.part, F.col("p_partkey") == F.col("l_partkey"))
        .agg((F.lit(100.0) * num / den).alias("promo_revenue"))
    )


@register(
    "q15_top_supplier",
    "WITH revenue AS (SELECT l_suppkey AS supplier_no, "
    f"sum({_DP}) AS total_rev FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' GROUP BY l_suppkey) "
    "SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue "
    "FROM supplier JOIN revenue ON s_suppkey = supplier_no "
    "WHERE total_rev = (SELECT max(total_rev) FROM revenue) ORDER BY s_suppkey",
)
def q15_top_supplier(t: Tables) -> DataFrame:
    """TPC-H Q15: supplier(s) with the quarter's max revenue — argmax via
    a 1-row broadcast of max(total_rev) joined back on exact DECIMAL
    equality (double equality would be a correctness bug here)."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    revenue = (
        t.lineitem.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(disc_price()).alias("total_rev"))
        .localCheckpoint(eager=True)  # reused for the max and the equality probe
    )
    top = revenue.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(t.supplier, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@register(
    "q16_parts_supplier_count",
    "SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt "
    "FROM part JOIN lineitem ON p_partkey = l_partkey "
    "WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO' "
    "AND p_size IN (1, 4, 7, 10, 15, 23, 45, 49) "
    "GROUP BY p_brand, p_type, p_size "
    "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size",
)
def q16_parts_supplier_count(t: Tables) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size).
    (Adapted: lineitem is the part↔supplier bridge — no partsupp — and
    the exclusions drop one brand and the PROMO type.) count(DISTINCT)
    expands to a two-phase agg; the part filter broadcasts."""
    p = t.part.filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 49))
    )
    return (
        t.lineitem.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    "WITH avgq AS (SELECT l_partkey AS ap, "
    "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS aq "
    "FROM lineitem GROUP BY l_partkey) "
    "SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 "
    "AS avg_yearly FROM lineitem JOIN part ON p_partkey = l_partkey "
    "JOIN avgq ON ap = l_partkey "
    "WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * aq",
)
def q17_small_quantity_revenue(t: Tables) -> DataFrame:
    """TPC-H Q17: revenue from unusually-small orders of one brand's
    parts — the correlated per-part average realized as a join against a
    per-partkey agg (both engines compute avg as exact-sum/count in
    double, so the 0.2·avg threshold compares identically)."""
    avgq = t.lineitem.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.sum(dec("l_quantity", 18, 2)).cast("double") / F.count(F.lit(1))).alias("aq")
    )
    return (
        t.lineitem.join(
            t.part.filter(F.col("p_brand") == "Brand#23"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(avgq, F.col("ap") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("aq"))
        .agg(
            (F.sum(dec("l_extendedprice", 18, 2)).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q18_large_orders",
    "SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, "
    "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON o_orderkey = l_orderkey "
    "GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice "
    "HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 200 "
    "ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100",
)
def q18_large_orders(t: Tables) -> DataFrame:
    """TPC-H Q18: large-volume orders (Σqty > 200) with their customers,
    top-100 by price. The HAVING filter runs on the exact decimal sum
    BEFORE the customer join, so only qualifying orders join; top-k is
    TakeOrderedAndProject with full tie-breaks."""
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", 18, 2)).alias("qty"))
        .filter(F.col("qty") > 200)
    )
    return (
        big.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_discounted_revenue",
    f"SELECT CAST(sum({_DP}) AS DOUBLE) AS revenue "
    "FROM lineitem JOIN part ON p_partkey = l_partkey WHERE "
    "(p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 "
    "AND l_quantity >= 1 AND l_quantity <= 11) "
    "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 "
    "AND l_quantity >= 10 AND l_quantity <= 20) "
    "OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 "
    "AND l_quantity >= 20 AND l_quantity <= 30)",
)
def q19_discounted_revenue(t: Tables) -> DataFrame:
    """TPC-H Q19: disjunctive (OR-of-ANDs) predicate across both join
    sides. The brand/size arms prune the part side (SF-proportional — no
    broadcast hint; threshold/AQE decide the strategy); the mixed
    arms evaluate post-join — Catalyst splits the conjuncts it can push."""
    arm = lambda brand, size_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, size_hi)
        & (F.col("l_quantity") >= q_lo)
        & (F.col("l_quantity") <= q_hi)
    )
    return (
        t.lineitem.join(t.part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(arm("Brand#12", 5, 1, 11) | arm("Brand#23", 10, 10, 20) | arm("Brand#34", 15, 20, 30))
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q20_potential_promotion",
    "SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN ("
    "SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE p_name LIKE 'red%' "
    "AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
    "GROUP BY l_suppkey "
    "HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 100) ORDER BY s_suppkey",
)
def q20_potential_promotion(t: Tables) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved >100 units of 'red%' parts in
    a year — IN-subquery-with-HAVING as agg → semi-join. (Adapted: volume
    from lineitem; no partsupp availability check.)"""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    movers = (
        t.lineitem.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(
            t.part.filter(F.col("p_name").like("red%")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity", 18, 2)).alias("qty"))
        .filter(F.col("qty") > 100)
    )
    return (
        t.supplier.join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_supplier",
    "SELECT s_name, count(*) AS numwait FROM supplier "
    "JOIN lineitem l1 ON s_suppkey = l1.l_suppkey "
    "JOIN orders ON o_orderkey = l1.l_orderkey "
    "WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' "
    "AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey "
    "AND l2.l_suppkey <> l1.l_suppkey) "
    "AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey "
    "AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R') "
    "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100",
)
def q21_waiting_supplier(t: Tables) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS against the same fact — the
    supplier solely responsible for returns in multi-supplier finalized
    orders. (Adapted: 'fault' = l_returnflag='R'; no receipt/commit
    dates.) Realized as semi-join then anti-join on (orderkey, suppkey≠)
    — two orderkey-partitioned shuffles, no row explosion."""
    l1 = (
        t.lineitem.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("l1_orderkey"),
            F.col("l_suppkey").alias("l1_suppkey"),
        )
    )
    others = t.lineitem.select(
        F.col("l_orderkey").alias("lo_key"),
        F.col("l_suppkey").alias("lo_supp"),
        F.col("l_returnflag").alias("lo_flag"),
    )
    has_other = (F.col("lo_key") == F.col("l1_orderkey")) & (
        F.col("lo_supp") != F.col("l1_suppkey")
    )
    other_fault = has_other & (F.col("lo_flag") == "R")
    return (
        l1.join(others, has_other, "left_semi")
        .join(others, other_fault, "left_anti")
        .join(
            t.orders.filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l1_orderkey"),
        )
        .join(t.supplier, F.col("s_suppkey") == F.col("l1_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


@register(
    "q22_global_sales_opportunity",
    "WITH pool AS (SELECT c_custkey, c_nationkey, c_acctbal FROM customer "
    "WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)), "
    "avgbal AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) "
    "/ count(*) AS ab FROM pool WHERE c_acctbal > 0.0) "
    "SELECT c_nationkey, count(*) AS numcust, "
    "CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal "
    "FROM pool, avgbal WHERE c_acctbal > ab "
    "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) "
    "GROUP BY c_nationkey ORDER BY c_nationkey",
)
def q22_global_sales_opportunity(t: Tables) -> DataFrame:
    """TPC-H Q22 shape: wealthy-but-inactive customers per nation —
    scalar-average threshold (1-row broadcast), NOT EXISTS anti-join
    against orders, tiny final agg. (Adapted: the country cohort is a
    c_nationkey in-list; no phone prefixes in this schema.)"""
    pool = t.customer.filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avgbal = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal", 18, 2)).cast("double") / F.count(F.lit(1))).alias("ab")
    )
    return (
        pool.crossJoin(F.broadcast(avgbal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(t.orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal", 18, 2)).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


#: Refresh-function slices (deterministic stand-ins for TPC-H's
#: refresh files): RF2 deletes orderkeys ≡ 0 mod RF_DEL_MOD, RF1
#: inserts a shifted copy of orderkeys ≡ 0 mod RF_INS_MOD.
RF_DEL_MOD, RF_INS_MOD = 997, 991

_RF_SQL = (
    "WITH mx AS (SELECT max(o_orderkey) + 1 AS off FROM orders), "
    f"del AS (SELECT o_orderkey FROM orders WHERE o_orderkey % {RF_DEL_MOD} = 0), "
    "ins AS (SELECT o.o_orderkey + mx.off AS o_orderkey, o_custkey, "
    "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
    f"FROM orders o, mx WHERE o.o_orderkey % {RF_INS_MOD} = 0), "
    "kept AS (SELECT o.* FROM orders o LEFT JOIN del d "
    "ON o.o_orderkey = d.o_orderkey WHERE d.o_orderkey IS NULL), "
    "aft AS (SELECT * FROM kept UNION ALL SELECT * FROM ins) "
    "SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_before, "
    "(SELECT CAST(count(*) AS BIGINT) FROM del) AS n_deleted, "
    "(SELECT CAST(count(*) AS BIGINT) FROM ins) AS n_inserted, "
    "CAST(count(*) AS BIGINT) AS n_after, "
    "CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) "
    "AS total_after FROM aft"
)


@register("orders_refresh_rf1_rf2", _RF_SQL)
def orders_refresh_rf1_rf2(t: Tables) -> DataFrame:
    """TPC-H's refresh functions, completing the benchmark's shape
    beyond the 22 queries: RF2 deletes a deterministic orderkey slice
    (≡ 0 mod 997 — the stand-in for the delete file), RF1 inserts a
    key-shifted copy of another slice (≡ 0 mod 991, keys offset past
    max — the insert file), and the audit row proves the ledger:
    n_after = n_before − n_deleted + n_inserted plus the exact-decimal
    price checksum of the refreshed table.

    Plan — the maintenance shape, not a rewrite: the delete is a
    LEFT ANTI join on the key (broadcastable delete set at real refresh
    sizes; at 100 TB this is the MERGE DELETE half of
    batch_merge_upsert), the insert a narrow key-shift map unioned in,
    and the audit one map-side-combinable aggregate over the result.
    Nothing sorts; the fact table is scanned twice (once kept, once
    audit) — a real implementation writes `aft` out and audits the
    write, same plan."""
    mx = t.orders.agg((F.max("o_orderkey") + 1).alias("off"))
    dele = t.orders.filter(F.col("o_orderkey") % RF_DEL_MOD == 0).select("o_orderkey")
    ins = (
        t.orders.filter(F.col("o_orderkey") % RF_INS_MOD == 0)
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("o_orderkey") + F.col("off")).alias("o_orderkey"),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
    )
    kept = t.orders.join(dele, "o_orderkey", "left_anti")
    aft = kept.unionByName(ins)
    n_before = t.orders.agg(F.count(F.lit(1)).cast("bigint").alias("n_before"))
    n_deleted = dele.agg(F.count(F.lit(1)).cast("bigint").alias("n_deleted"))
    n_inserted = ins.agg(F.count(F.lit(1)).cast("bigint").alias("n_inserted"))
    audit = aft.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_after"),
        F.sum(dec("o_totalprice", 18, 2)).cast("double").alias("total_after"),
    )
    return (
        n_before.crossJoin(F.broadcast(n_deleted))
        .crossJoin(F.broadcast(n_inserted))
        .crossJoin(F.broadcast(audit))
        .select("n_before", "n_deleted", "n_inserted", "n_after", "total_after")
    )
