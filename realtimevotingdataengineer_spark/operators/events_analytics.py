"""Event-stream analytics over the ``events`` table: funnel conversion
and retention cohorts — the batch twins of the reference's "observer
l'évolution au fur et à mesure" intent (Note...txt:37) at product-
analytics shape, and the standard queries any event pipeline must run.

Both are single-pass-per-stage DataFrame plans: per-user aggregates
shuffle once on user_id (uniform key), then tiny result-space joins.
At 100 TB the user_id shuffle is the only heavy exchange and is
co-partitionable across stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import local_rows_df
from ..registry import register
from ..sources.tables import Tables


@register(
    "events_funnel_conversion",
    "WITH v AS (SELECT user_id, min(ts) AS vt FROM events "
    "WHERE event_type = 'view' GROUP BY user_id), "
    "c AS (SELECT e.user_id, min(e.ts) AS ct FROM events e "
    "JOIN v ON e.user_id = v.user_id AND e.ts > v.vt "
    "WHERE e.event_type = 'click' GROUP BY e.user_id), "
    "p AS (SELECT e.user_id, min(e.ts) AS pt FROM events e "
    "JOIN c ON e.user_id = c.user_id AND e.ts > c.ct "
    "WHERE e.event_type = 'purchase' GROUP BY e.user_id) "
    "SELECT (SELECT count(*) FROM v) AS n_view, "
    "(SELECT count(*) FROM c) AS n_click_after_view, "
    "(SELECT count(*) FROM p) AS n_purchase_after_click",
)
def events_funnel_conversion(t: Tables) -> DataFrame:
    """Ordered funnel view → click → purchase: users whose first click
    follows their first view, and whose first purchase follows that
    click. Each stage is a per-user min over a filtered scan joined to
    the previous stage's result — strictly-ordered funnel semantics
    (not mere event presence). Three user_id shuffles over shrinking
    sets; the final counts are single-row."""
    ev = t.events
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after_click")))
    )


@register(
    "events_error_rate_daily",
    "SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, "
    "count(*) AS n_events, "
    # CAST AS BIGINT: DuckDB's uncast sum() yields HUGEINT, which surfaces
    # as float64 through fetch_df while Spark emits bigint (dtype-only
    # hash mismatch in CORRECTNESS_r02).
    "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_errors, "
    "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) "
    "/ count(*) AS error_rate "
    "FROM events GROUP BY CAST(ts AS DATE) ORDER BY day",
)
def events_error_rate_daily(t: Tables) -> DataFrame:
    """Daily error-rate monitor: conditional count over total per day —
    the ops-dashboard staple. One date-bucketed shuffle; the ratio is a
    single double division of exact integer counts."""
    day = F.to_date("ts")
    errors = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    return (
        t.events.groupBy(day.alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            errors.alias("n_errors"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n_events",
            "n_errors",
            (F.col("n_errors").cast("double") / F.col("n_events")).alias("error_rate"),
        )
        .orderBy("day")
    )


@register(
    "events_rolling_active_users",
    "WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events), "
    "user_days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS ud FROM events) "
    "SELECT strftime(d, '%Y-%m-%d') AS day, "
    "count(DISTINCT user_id) AS wau FROM days JOIN user_days "
    "ON ud BETWEEN d - 6 AND d GROUP BY d ORDER BY day",
)
def events_rolling_active_users(t: Tables) -> DataFrame:
    """Exact rolling 7-day active users (WAU) per day: distinct (user,
    day) pairs range-joined to the day spine, then distinct-count per
    day. A rolling DISTINCT cannot be a window frame (frames aggregate
    rows, not sets) — the range join over the deduplicated per-user-day
    relation is the exact formulation, and its input is |users|·|days|,
    not raw events. At extreme scale the approximate path is an HLL
    sketch per (user, day) bucket merged over the window."""
    ev = t.events.select("user_id", F.to_date("ts").alias("ud")).distinct()
    days = ev.select(F.col("ud").alias("d")).distinct()
    return (
        days.join(ev, F.col("ud").between(F.date_sub(F.col("d"), 6), F.col("d")))
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("wau"))
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"), "wau")
        .orderBy("day")
    )


def partitioned_events_path(sf_dir: str) -> str:
    """Repo-local location of the date-partitioned events copy for one
    scale-factor directory (same keying convention as the persisted IVF
    index — built once per corpus, reused by every query)."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    safe = sf_dir.strip("/").replace("/", "_")
    return os.path.join(repo, "spark-warehouse", "events_by_day", safe)


def partitioned_events(t: Tables) -> DataFrame:
    """The events fact as date-partitioned parquet, built on first use
    (sources.formats.to_parquet_partitioned layout: one directory per
    event_date). At 100 TB this IS the table — the writer lands each day
    in its own directory and every date-predicated query prunes at the
    source instead of scanning the full history. Falls back to an
    in-memory derived column if the warehouse dir is unwritable."""
    import os

    from ..sources.formats import to_parquet_partitioned

    path = partitioned_events_path(t.sf_dir)
    try:
        if not os.path.isdir(path):
            to_parquet_partitioned(t.events, path)
        return t.spark.read.parquet(path)
    except Exception:
        return t.events.withColumn("event_date", F.to_date("ts"))


@register(
    "events_partitioned_day",
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
    "CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS total_value "
    "FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15' "
    "GROUP BY event_type ORDER BY event_type",
)
def events_partitioned_day(t: Tables) -> DataFrame:
    """One day's event tallies off the DATE-PARTITIONED layout: the
    day predicate lands in the scan's PartitionFilters (plan-asserted in
    tests/test_plans.py), so only that day's directory is opened — the
    at-scale access pattern for any time-ranged fact query. The oracle
    states the same semantics over the unpartitioned table (partitioning
    must never change results)."""
    from ..functions import money_sum

    ev = partitioned_events(t)
    return (
        ev.filter(F.col("event_date") == F.lit("2024-01-15").cast("date"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value", "total_value", 20, 4),
        )
        .orderBy("event_type")
    )


@register(
    "events_retention_cohort",
    "WITH first AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0 "
    "FROM events GROUP BY user_id), "
    "act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events) "
    # cohort day as an ISO string: DuckDB DATE surfaces as a pandas
    # Timestamp through fetch_df, which would never equal Spark's date
    "SELECT strftime(d0, '%Y-%m-%d') AS cohort_day, "
    "CAST(d - d0 AS INT) AS day_offset, "
    "count(*) AS n_users FROM act JOIN first USING (user_id) "
    "GROUP BY d0, day_offset ORDER BY cohort_day, day_offset",
)
def events_retention_cohort(t: Tables) -> DataFrame:
    """Retention triangle: users grouped by first-active day (cohort),
    counted on each subsequent active day. Two user_id aggs (first-seen,
    distinct active days) and one join — the (cohort × offset) result
    space is tiny regardless of event volume, so the shuffles carry
    per-user rows, never raw events."""
    ev = t.events.select("user_id", F.to_date("ts").alias("d"))
    first = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    act = ev.distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            F.date_format("d0", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "d0").cast("int").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "events_anomaly_zscore",
    "WITH daily AS (SELECT CAST(ts AS DATE) AS d, event_type, count(*) AS n "
    "FROM events GROUP BY 1, 2), "
    "w AS (SELECT d, event_type, n, "
    "sum(n) OVER win AS s, count(*) OVER win AS c, sum(n * n) OVER win AS sq "
    "FROM daily WINDOW win AS (PARTITION BY event_type ORDER BY d "
    "ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)), "
    # mean/variance from EXACT integer window sums; the two double
    # divisions below are the only float ops, in a pinned shape
    "stats AS (SELECT d, event_type, n, "
    "CAST(s AS DOUBLE) / CAST(c AS DOUBLE) AS m, "
    "(CAST(sq AS DOUBLE) - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / CAST(c AS DOUBLE)) "
    "/ CAST(c - 1 AS DOUBLE) AS v "
    "FROM w WHERE c = 7) "
    "SELECT strftime(d, '%Y-%m-%d') AS day, event_type, n, m AS baseline_avg, "
    "CASE WHEN v > 0 THEN (CAST(n AS DOUBLE) - m) / sqrt(v) END AS zscore, "
    "CASE WHEN v > 0 THEN abs((CAST(n AS DOUBLE) - m) / sqrt(v)) > 3.0 "
    "ELSE FALSE END AS is_anomaly "
    "FROM stats ORDER BY day, event_type",
)
def events_anomaly_zscore(t: Tables) -> DataFrame:
    """Volume-anomaly detection: each (day, event_type) count scored
    against the trailing 7 full days' mean/std as a z-score, flagged at
    |z| > 3 — the standard pipeline-monitoring query (late feed, outage,
    bot spike). Variance comes from exact integer window sums
    ((Σx² − (Σx)²/n)/(n−1)), so despite being a float statistic the
    whole operator is bitwise-oracled: the only double ops are two
    divisions in a pinned shape on exactly-equal integers.

    Plan: one groupBy shuffle to |days × types| rows, then a per-type
    window over that tiny frame — event volume only touches the first
    aggregation, which partial-aggregates map-side."""
    from pyspark.sql import Window

    daily = t.events.groupBy(
        F.to_date("ts").alias("d"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    win = (
        Window.partitionBy("event_type").orderBy("d").rowsBetween(-7, -1)
    )
    w = daily.select(
        "d",
        "event_type",
        "n",
        F.sum("n").over(win).alias("s"),
        F.count(F.lit(1)).over(win).alias("c"),
        F.sum(F.col("n") * F.col("n")).over(win).alias("sq"),
    )
    stats = w.filter(F.col("c") == 7).select(
        "d",
        "event_type",
        "n",
        (F.col("s").cast("double") / F.col("c").cast("double")).alias("m"),
        (
            (
                F.col("sq").cast("double")
                - (F.col("s").cast("double") * F.col("s").cast("double"))
                / F.col("c").cast("double")
            )
            / (F.col("c") - 1).cast("double")
        ).alias("v"),
    )
    z = (F.col("n").cast("double") - F.col("m")) / F.sqrt("v")
    return stats.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n",
        F.col("m").alias("baseline_avg"),
        F.when(F.col("v") > 0, z).alias("zscore"),
        F.when(F.col("v") > 0, F.abs(z) > 3.0).otherwise(F.lit(False)).alias(
            "is_anomaly"
        ),
    ).orderBy("day", "event_type")


@register(
    "events_funnel_windowed",
    "WITH v AS (SELECT user_id, min(ts) AS vt FROM events "
    "WHERE event_type = 'view' GROUP BY user_id), "
    "c AS (SELECT e.user_id, min(e.ts) AS ct FROM events e "
    "JOIN v ON e.user_id = v.user_id AND e.ts > v.vt "
    "AND e.ts <= v.vt + INTERVAL 1 HOUR "
    "WHERE e.event_type = 'click' GROUP BY e.user_id), "
    "p AS (SELECT e.user_id, min(e.ts) AS pt FROM events e "
    "JOIN c ON e.user_id = c.user_id AND e.ts > c.ct "
    "AND e.ts <= c.ct + INTERVAL 24 HOUR "
    "WHERE e.event_type = 'purchase' GROUP BY e.user_id) "
    "SELECT (SELECT count(*) FROM v) AS n_view, "
    "(SELECT count(*) FROM c) AS n_click_1h, "
    "(SELECT count(*) FROM p) AS n_purchase_24h",
)
def events_funnel_windowed(t: Tables) -> DataFrame:
    """Conversion-window funnel: click must land within 1 hour of the
    first view, purchase within 24 hours of that click — the
    attribution-window semantics real funnels use (the unbounded
    variant is events_funnel_conversion). Each stage is a range-
    predicated join on user_id + a per-user min; the band predicates
    ride the equi-join, so no extra shuffle over the strict funnel."""
    ev = t.events
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("vt"))
            & (F.col("ts") <= F.col("vt") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("ct"))
            & (F.col("ts") <= F.col("ct") + F.expr("INTERVAL 24 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_1h")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_24h")))
    )


#: Range-join attribution window (seconds) and the bucketization bin
#: width. Bin width == window width, so a right-side row can only land
#: in the left row's bin or the next one — the candidate set per pair
#: is exactly 2 bins, independent of data volume.
RANGE_JOIN_WINDOW_SEC = 300


@register(
    "events_range_join",
    "SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id, "
    "v.ts AS view_ts, c.ts AS click_ts, "
    "date_diff('second', v.ts, c.ts) AS delay_sec "
    "FROM events v JOIN events c ON v.user_id = c.user_id "
    "AND v.event_type = 'view' AND c.event_type = 'click' "
    "AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 300 SECOND",
)
def events_range_join(t: Tables) -> DataFrame:
    """Range join (interval join): every click within 5 minutes AFTER a
    view by the same user — the attribution-pair primitive Spark has no
    native operator for (the reference family's range/interval join).

    Scale shape: a naive formulation is an inequality join — Spark
    plans it as a broadcast nested loop or a sort-merge with a residual
    range filter over the full per-user cross product. Instead the time
    axis is BUCKETIZED: both sides get bin = floor(epoch/W) with the bin
    width W equal to the window, the view side is exploded to
    (bin, bin+1), and the join becomes a plain hash equi-join on
    (user_id, bin) with the exact range predicate as a cheap
    post-filter. Each pair is examined in exactly one bin (the click's
    own), candidates are bounded by 2W of activity per user regardless
    of history length, and the shuffle key (user_id, bin) stays uniform
    even when one user's history is long — the bin dimension shards it."""
    w = RANGE_JOIN_WINDOW_SEC
    ev = t.events.select("event_id", "user_id", "event_type", "ts")
    bin_ = (F.col("ts").cast("long") / F.lit(w)).cast("long")  # floor: epochs are positive
    v = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
            F.explode(F.array(bin_, bin_ + 1)).alias("bin"),
        )
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        bin_.alias("bin"),
    )
    return (
        v.join(c, ["user_id", "bin"])
        .filter(
            (F.col("click_ts") > F.col("view_ts"))
            & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {w} SECONDS"))
        )
        .select(
            "user_id",
            "view_id",
            "click_id",
            "view_ts",
            "click_ts",
            (F.col("click_ts").cast("long") - F.col("view_ts").cast("long")).alias(
                "delay_sec"
            ),
        )
    )


@register(
    "events_rollup_multires",
    "SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, "
    "CAST(count(*) AS BIGINT) AS n_events, "
    "CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS total_value, "
    "max(value) AS max_value, min(value) AS min_value "
    "FROM events GROUP BY CAST(ts AS DATE) ORDER BY day",
)
def events_rollup_multires(t: Tables) -> DataFrame:
    """Hypertable-style multi-resolution rollup: minute partials →
    hourly → daily, each level aggregating the one below it rather than
    the raw facts (the continuous-aggregate pattern). The oracle states
    the same semantics directly over raw events — hierarchical re-
    aggregation must be invisible in the result, which is exactly why
    every partial here is associative: count/min/max trivially, and the
    value sum is DECIMAL (money_sum) so the merge order can't perturb a
    double.

    Scale shape: at 100 TB each level's input is ~60× smaller than the
    one below, so the daily rollup touches minutes of data, not raw
    rows; in production each level would be a materialized table
    incrementally maintained, and this plan is that maintenance query."""
    from ..functions import dec

    m = (
        t.events.groupBy(F.date_trunc("minute", "ts").alias("m"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value", 20, 4)).alias("sv"),
            F.max("value").alias("mx"),
            F.min("value").alias("mn"),
        )
    )
    h = (
        m.groupBy(F.date_trunc("hour", "m").alias("h"))
        .agg(
            F.sum("n").alias("n"),
            F.sum("sv").alias("sv"),
            F.max("mx").alias("mx"),
            F.min("mn").alias("mn"),
        )
    )
    return (
        h.groupBy(F.to_date("h").alias("d"))
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("sv").alias("sv"),
            F.max("mx").alias("max_value"),
            F.min("mn").alias("min_value"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n_events",
            F.col("sv").cast("double").alias("total_value"),
            "max_value",
            "min_value",
        )
        .orderBy("day")
    )


#: Sketch calibration bounds. approx_count_distinct's rsd parameter is a
#: STANDARD DEVIATION, not a hard bound (measured relative error at the
#: three test SFs: 0.000 / 0.007 / 0.067 against rsd=0.05), so the
#: asserted envelope is 2×rsd. percentile_approx's accuracy parameter IS
#: a deterministic Greenwald-Khanna rank-error guarantee (≤ n/accuracy).
HLL_RSD = 0.05
HLL_BOUND = 2 * HLL_RSD
PCT_ACCURACY = 100


@register(
    "agg_approx_distinct",
    "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users, "
    "TRUE AS approx_ok FROM events GROUP BY event_type ORDER BY event_type",
)
def agg_approx_distinct(t: Tables) -> DataFrame:
    """HLL++ calibration: per event_type, the exact distinct-user count
    next to a boolean asserting approx_count_distinct (rsd=HLL_RSD)
    landed within the 2×rsd envelope. The sketch value itself is
    engine-specific (DuckDB's HLL differs from Spark's), so the oracle
    pins the exact side and the bound — the dedup_minhash_estimate
    calibration pattern. At 100 TB the sketch is the plan for
    high-cardinality distincts: fixed-size mergeable state per group
    (map-side partials, no shuffle of distinct values), and this key
    keeps its error measurable against the exact twin."""
    g = t.events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", HLL_RSD).alias("approx_users"),
    )
    ok = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        <= F.lit(HLL_BOUND) * F.col("exact_users")
    )
    return g.select("event_type", "exact_users", ok.alias("approx_ok")).orderBy("event_type")


@register(
    "agg_approx_percentile",
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n, TRUE AS approx_ok "
    "FROM events GROUP BY event_type ORDER BY event_type",
)
def agg_approx_percentile(t: Tables) -> DataFrame:
    """Greenwald-Khanna calibration: percentile_approx(value, 0.5,
    PCT_ACCURACY) returns an element whose RANK is guaranteed within
    n/PCT_ACCURACY of the true median rank — a deterministic bound, so
    the oracle's TRUE is a theorem, not a hope. Verified by re-ranking
    the sketch's answer against the raw data: count(value < p50) must
    sit in the ±ε rank window. The two-pass shape (sketch, then rank
    check via a broadcast join back over the scan) is itself the 100 TB
    validation pattern for any quantile sketch."""
    ap = t.events.groupBy("event_type").agg(
        F.percentile_approx("value", F.lit(0.5), F.lit(PCT_ACCURACY)).alias("p50"),
        F.count(F.lit(1)).alias("n"),
    )
    joined = t.events.select("event_type", "value").join(F.broadcast(ap), "event_type")
    rk = joined.groupBy("event_type").agg(
        F.sum(F.when(F.col("value") <= F.col("p50"), 1).otherwise(0)).alias("n_le"),
        F.sum(F.when(F.col("value") < F.col("p50"), 1).otherwise(0)).alias("n_lt"),
        F.first("n").alias("n"),
    )
    eps = 1.0 / PCT_ACCURACY
    ok = (F.col("n_le") >= (0.5 - eps) * F.col("n")) & (
        F.col("n_lt") <= (0.5 + eps) * F.col("n")
    )
    return rk.select("event_type", "n", ok.alias("approx_ok")).orderBy("event_type")


#: Histogram bin width for the value column (fixed literal so the bin
#: function is a pure stateless expression — no data-dependent pass).
HIST_BIN_WIDTH = 10.0


@register(
    "events_value_histogram",
    f"SELECT CAST(floor(value / {HIST_BIN_WIDTH}) AS BIGINT) AS bin, "
    f"{HIST_BIN_WIDTH} * CAST(floor(value / {HIST_BIN_WIDTH}) AS BIGINT) AS bin_lo, "
    "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY bin ORDER BY bin",
)
def events_value_histogram(t: Tables) -> DataFrame:
    """Fixed-width histogram of the value measure: a stateless bin
    expression + one tiny-result aggregation (map-side combine collapses
    each task to |bins| rows before a single small shuffle) — the
    at-scale histogram plan; a rank-based equi-depth variant would need
    a sort, which is what corpus_length_profile's percentile_disc does."""
    bin_ = F.floor(F.col("value") / F.lit(HIST_BIN_WIDTH)).cast("bigint")
    return (
        t.events.groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(HIST_BIN_WIDTH) * F.col("bin")).alias("bin_lo"),
            "n",
        )
        .orderBy("bin")
    )


@register(
    "profile_table_stats",
    "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
    "CAST(count(*) - count(user_id) AS BIGINT) AS n_null_user, "
    "CAST(count(DISTINCT user_id) AS BIGINT) AS ndv_user, "
    "CAST(count(DISTINCT event_type) AS BIGINT) AS ndv_event_type, "
    "min(value) AS min_value, max(value) AS max_value, "
    "min(ts) AS min_ts, max(ts) AS max_ts, "
    "CAST(min(event_id) AS BIGINT) AS min_event_id, "
    "CAST(max(event_id) AS BIGINT) AS max_event_id FROM events",
)
def profile_table_stats(t: Tables) -> DataFrame:
    """ANALYZE-style table profile in ONE scan: row count, null count,
    distinct counts, and typed min/max for every profiled column as
    parallel aggregates — the statistics a cost-based optimizer (or a
    data-quality monitor) collects. At 100 TB each aggregate is
    map-side-combinable and the scan is shared; the exact NDVs here are
    the oracle-checked twins of agg_approx_distinct's HLL path, which is
    what production would use for high-cardinality columns."""
    return t.events.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("user_id")).alias("n_null_user"),
        F.count_distinct("user_id").alias("ndv_user"),
        F.count_distinct("event_type").alias("ndv_event_type"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )


#: EWMA smoothing factor; the complement is written as the literal 0.8
#: in BOTH engines (never derived as 1 - alpha at runtime — the repo's
#: float-literal discipline).
EWMA_ALPHA = 0.2

_EWMA_SQL = (
    "WITH d AS (SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, "
    "CAST(count(*) AS DOUBLE) AS x FROM events GROUP BY event_type, CAST(ts AS DATE)), "
    "s AS (SELECT event_type, list(x ORDER BY day) AS xs, "
    "list(day ORDER BY day) AS days FROM d GROUP BY event_type), "
    "p AS (SELECT event_type, u.i AS i, days[u.i] AS day, xs[u.i] AS x, "
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), list_slice(xs, 1, u.i)), "
    "(acc, v) -> 0.2 * v + 0.8 * acc) AS ewma "
    "FROM s, LATERAL unnest(range(1, len(xs) + 1)) AS u(i)) "
    "SELECT event_type, day, x, ewma FROM p ORDER BY event_type, day"
)


@register("events_ewma_daily", _EWMA_SQL)
def events_ewma_daily(t: Tables) -> DataFrame:
    """Zero-initialized EWMA (alpha=0.2) of the daily event-count series
    per event_type — the recursive smoother every monitoring pipeline
    runs, expressed as a per-day PREFIX left fold over the day-ordered
    series: ewma_t = fold(0.2*x + 0.8*acc, init 0, x_1..x_t). The
    recursion is inherently sequential per key, so the fold IS the
    operator — bitwise-equal in both engines, partition-invariant.

    Scale shape: series are grouped per key and folded inside the
    group's collected array — per-key state lives in one task (fine:
    series length = days, not events; the events→daily reduction is the
    heavy, map-side-combinable part). The per-day prefix re-fold is
    O(len²) in series length — right for dashboard-length series; a
    single-pass variant would emit only the final smoothed value."""
    d = t.events.groupBy(
        "event_type", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    s = d.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("dx")
    )
    pe = s.select(
        "event_type",
        F.transform("dx", lambda e: e.getField("x")).alias("xs"),
        F.posexplode("dx").alias("i0", "e"),
    )
    prefix = F.slice("xs", F.lit(1), F.col("i0") + F.lit(1))
    ewma = F.aggregate(
        prefix, F.lit(0.0), lambda acc, x: F.lit(0.2) * x + F.lit(0.8) * acc
    )
    return pe.select(
        "event_type",
        F.col("e.day").alias("day"),
        F.col("e.x").alias("x"),
        ewma.alias("ewma"),
    ).orderBy("event_type", "day")


#: Gap-fill user cohort bound (keeps the spine |users|x|days|, not
#: |all users|x|days|, at oracle scale; at 100 TB the spine is
#: date-partitioned and the cohort is the full population).
GAPFILL_USERS = 50

_GAPFILL_SQL = (
    "WITH base AS (SELECT user_id, CAST(ts AS DATE) AS d, "
    f"CAST(count(*) AS BIGINT) AS n FROM events WHERE user_id < {GAPFILL_USERS} "
    "AND event_type = 'purchase' GROUP BY user_id, CAST(ts AS DATE)), "
    "days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events), "
    f"users AS (SELECT DISTINCT user_id FROM events WHERE user_id < {GAPFILL_USERS} "
    "AND event_type = 'purchase'), "
    "spine AS (SELECT u.user_id, dy.d FROM users u CROSS JOIN days dy), "
    "j AS (SELECT s.user_id, s.d, b.n FROM spine s "
    "LEFT JOIN base b ON b.user_id = s.user_id AND b.d = s.d), "
    "g AS (SELECT user_id, d, n, count(n) OVER (PARTITION BY user_id ORDER BY d "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM j) "
    "SELECT user_id, strftime(d, '%Y-%m-%d') AS day, "
    "CAST(coalesce(max(n) OVER (PARTITION BY user_id, grp), 0) AS BIGINT) AS n_filled, "
    "n IS NOT NULL AS was_observed FROM g ORDER BY user_id, day"
)


@register("events_gapfill_daily", _GAPFILL_SQL)
def events_gapfill_daily(t: Tables) -> DataFrame:
    """Dense daily series with last-observation-carried-forward: build
    the user x day spine, left-join the sparse observations (purchase
    days per user — 541 observed of 1500 spine cells at sf0.01), then
    fill gaps with the gap-and-islands LOCF (running count of non-nulls
    forms the island id; the island's max is its one observation) —
    portable to any engine, no IGNORE NULLS dependency. Leading gaps
    fill with 0.

    Scale shape: the spine is a broadcast-able date dimension crossed
    with the key population; the fill is two windows over the spine
    partitioned by user — no self-join, no per-row lookback scan."""
    base = (
        t.events.filter(
            (F.col("user_id") < GAPFILL_USERS) & (F.col("event_type") == "purchase")
        )
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    days = t.events.select(F.to_date("ts").alias("d")).distinct()
    users = (
        t.events.filter(
            (F.col("user_id") < GAPFILL_USERS) & (F.col("event_type") == "purchase")
        )
        .select("user_id")
        .distinct()
    )
    spine = users.crossJoin(F.broadcast(days))
    j = spine.join(base, ["user_id", "d"], "left")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = j.select("user_id", "d", "n", F.count("n").over(w_run).alias("grp"))
    w_isl = Window.partitionBy("user_id", "grp")
    return g.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce(F.max("n").over(w_isl), F.lit(0).cast("bigint")).alias("n_filled"),
        F.col("n").isNotNull().alias("was_observed"),
    ).orderBy("user_id", "day")


@register(
    "events_transition_matrix",
    "WITH seq AS (SELECT user_id, event_type, lead(event_type) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id) AS next_type FROM events), "
    "pairs AS (SELECT event_type AS from_type, next_type AS to_type, "
    "CAST(count(*) AS BIGINT) AS n FROM seq WHERE next_type IS NOT NULL "
    "GROUP BY event_type, next_type), "
    "tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM pairs "
    "GROUP BY from_type) "
    "SELECT p.from_type, p.to_type, p.n, "
    "CAST(p.n AS DOUBLE) / CAST(t.n_from AS BIGINT) AS prob "
    "FROM pairs p JOIN tot t ON t.from_type = p.from_type "
    "ORDER BY p.from_type, p.to_type",
)
def events_transition_matrix(t: Tables) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    ordered pair of consecutive events within a user's timeline (ties
    broken by event_id so the sequence is deterministic), the transition
    count and row-normalized probability — the session-model input for
    next-action prediction and anomaly scoring.

    Scale shape: one user_id shuffle for the lead window (the same
    exchange every per-user sequence op shares — co-partitionable), then
    a |event_types|² aggregation that collapses map-side. The
    probability is integer/integer division — exact-oracled."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    pairs = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return (
        pairs.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n").cast("double") / F.col("n_from")).alias("prob"),
        )
        .orderBy("from_type", "to_type")
    )


#: Datasketches HLL precision for the WAU sketches, passed EXPLICITLY so
#: a Spark-default drift cannot silently change the estimator's accuracy
#: (round-4 ADVICE). lgConfigK=12 ⇒ relative standard error
#: 1.04/sqrt(2^12) ≈ 1.63%.
WAU_LGK = 12
#: Oracle-checked error envelope for the WAU estimate: ~3× the lgK=12
#: RSE (the agg_approx_distinct HLL_BOUND pattern — a named, derived
#: margin, not a bare literal). Measured max relative error across the
#: three test SFs at lgK=12 is 0.81% (sf0.1; exact at the smaller SFs),
#: so the margin is ~6× the observed worst case.
WAU_BOUND = 0.05


@register(
    "events_rolling_wau_hll",
    "WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events), "
    "user_days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS ud FROM events) "
    "SELECT strftime(d, '%Y-%m-%d') AS day, "
    "CAST(count(DISTINCT user_id) AS BIGINT) AS wau_exact, TRUE AS sketch_ok "
    "FROM days JOIN user_days ON ud BETWEEN d - 6 AND d GROUP BY d ORDER BY day",
)
def events_rolling_wau_hll(t: Tables) -> DataFrame:
    """Rolling 7-day active users via MERGEABLE HLL sketches — the
    scale path events_rolling_active_users' docstring promises: one
    fixed-size sketch per day (map-side combinable), then a 7-row
    union window and a point estimate, instead of range-joining the
    |users|·|days| relation. The sketch-calibration oracle pattern
    (agg_approx_distinct): the exact WAU is the oracled side and the
    flag asserts the estimate lands within 5%.

    At 100 TB this is THE workable rolling-distinct plan: day sketches
    are a few KB each and the window unions |window| sketches per day;
    the exact twin's range join exists to keep the estimator honest."""
    sk = t.events.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id", WAU_LGK).alias("sk")
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    est = sk.select(
        "d", F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias("wau_est")
    )
    user_days = t.events.select("user_id", F.to_date("ts").alias("ud")).distinct()
    days = user_days.select(F.col("ud").alias("d")).distinct()
    wau = (
        days.join(user_days, F.col("ud").between(F.date_sub(F.col("d"), 6), F.col("d")))
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("wau_exact"))
    )
    ok = (
        F.abs(F.col("wau_est") - F.col("wau_exact"))
        <= F.lit(WAU_BOUND) * F.col("wau_exact")
    )
    return (
        wau.join(est, "d")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "wau_exact",
            ok.alias("sketch_ok"),
        )
        .orderBy("day")
    )


#: Z-order key geometry: 8 bits per dimension (user bucket x day index).
ZORDER_BITS = 8
ZORDER_EPOCH = "2024-01-01"


def _zorder_key_col() -> Column:
    """Morton key as unrolled bit-interleave over columns
    ``user_bucket`` / ``day_idx`` (shared by the layout key and the
    skipping audit)."""
    zkey = None
    for i in range(ZORDER_BITS):
        xt = (
            F.shiftright("user_bucket", i).bitwiseAND(F.lit(1)).cast("bigint")
            * F.lit(1 << (2 * i)).cast("bigint")
        )
        yt = (
            F.shiftright("day_idx", i).bitwiseAND(F.lit(1)).cast("bigint")
            * F.lit(1 << (2 * i + 1)).cast("bigint")
        )
        term = xt + yt
        zkey = term if zkey is None else zkey + term
    return zkey


def _zorder_terms_sql(xe: str, ye: str) -> str:
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"((({xe}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({ye}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@register(
    "layout_zorder_events",
    "WITH b AS (SELECT event_id, user_id % 256 AS user_bucket, "
    f"date_diff('day', DATE '{ZORDER_EPOCH}', CAST(ts AS DATE)) & 255 AS day_idx "
    "FROM events) "
    "SELECT event_id, CAST(user_bucket AS BIGINT) AS user_bucket, "
    "CAST(day_idx AS BIGINT) AS day_idx, "
    f"CAST({_zorder_terms_sql('user_bucket', 'day_idx')} AS BIGINT) AS zkey "
    "FROM b ORDER BY event_id",
)
def layout_zorder_events(t: Tables) -> DataFrame:
    """Z-order (Morton) clustering key over (user bucket, day) — the
    data-layout operator behind multi-dimensional data skipping (Delta
    OPTIMIZE ZORDER analog): writing the fact sorted by interleaved-bit
    zkey puts rows close in BOTH dimensions into the same files, so
    min/max file stats prune point-and-range predicates on either
    column. The key itself is pure bit arithmetic (unrolled interleave,
    exact oracle); at scale the layout job is
    repartitionByRange(zkey) -> sortWithinPartitions -> write, and this
    projection is its sort key."""
    x = F.pmod(F.col("user_id"), F.lit(256))
    y = F.datediff(F.to_date("ts"), F.lit(ZORDER_EPOCH).cast("date")).bitwiseAND(
        F.lit(255)
    )
    b = t.events.select("event_id", x.alias("user_bucket"), y.alias("day_idx"))
    zkey = _zorder_key_col()
    return b.select(
        "event_id",
        F.col("user_bucket").cast("bigint").alias("user_bucket"),
        F.col("day_idx").cast("bigint").alias("day_idx"),
        zkey.cast("bigint").alias("zkey"),
    ).orderBy("event_id")


#: Zone-map audit geometry: 2^9 = 512 rows per simulated row group, and
#: the fixed point-predicate workload the audit scores (two user-bucket
#: probes, two day probes — values present at every test SF).
SKIP_GROUP_POW = 9
SKIP_PROBES = (("user_bucket", 7), ("user_bucket", 101), ("day_idx", 3), ("day_idx", 21))


def _skipping_sql() -> str:
    g = 1 << SKIP_GROUP_POW
    zterms = _zorder_terms_sql("user_bucket", "day_idx")
    probes = ", ".join(f"('{c}', {v})" for c, v in SKIP_PROBES)
    return (
        "WITH b AS (SELECT event_id, user_id % 256 AS user_bucket, "
        f"date_diff('day', DATE '{ZORDER_EPOCH}', CAST(ts AS DATE)) & 255 AS day_idx "
        "FROM events), "
        f"bz AS (SELECT *, CAST({zterms} AS BIGINT) AS zkey FROM b), "
        "nat AS (SELECT user_bucket, day_idx, (row_number() OVER "
        f"(ORDER BY event_id) - 1) // {g} AS rg FROM bz), "
        "zo AS (SELECT user_bucket, day_idx, (row_number() OVER "
        f"(ORDER BY zkey, event_id) - 1) // {g} AS rg FROM bz), "
        "z AS (SELECT 'natural' AS layout, rg, min(user_bucket) AS bu_min, "
        "max(user_bucket) AS bu_max, min(day_idx) AS di_min, max(day_idx) AS di_max "
        "FROM nat GROUP BY rg "
        "UNION ALL SELECT 'zorder', rg, min(user_bucket), max(user_bucket), "
        "min(day_idx), max(day_idx) FROM zo GROUP BY rg), "
        f"p AS (SELECT * FROM (VALUES {probes}) AS v(pcol, pval)), "
        "a AS (SELECT layout, pcol, CAST(pval AS BIGINT) AS pval, "
        "CAST(count(*) AS BIGINT) AS n_groups, "
        "CAST(sum(CASE WHEN (pcol = 'user_bucket' AND pval BETWEEN bu_min AND bu_max) "
        "OR (pcol = 'day_idx' AND pval BETWEEN di_min AND di_max) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned "
        "FROM z, p GROUP BY layout, pcol, pval) "
        "SELECT layout, pcol, pval, n_groups, n_scanned, "
        "CAST((n_groups - n_scanned) * 1000000 // n_groups AS BIGINT) AS skipped_ppm "
        "FROM a ORDER BY layout, pcol, pval"
    )


@register("layout_zorder_skipping", _skipping_sql())
def layout_zorder_skipping(t: Tables) -> DataFrame:
    """Zone-map data-skipping AUDIT: the measurement that justifies
    layout_zorder_events. Simulates 512-row row groups under two file
    layouts — natural (event_id, i.e. arrival order) and Z-ordered —
    computes each group's min/max zone map for (user_bucket, day_idx),
    and scores a fixed point-predicate workload: how many groups could a
    reader PROVE irrelevant from stats alone. At sf0.1 the result is the
    textbook trade: natural order skips ~96% of groups on day predicates
    (arrival order ≈ time order) but 0% on user predicates (user_id is
    uniform per group); Z-order buys ~94% user-skipping for a modest day
    cost (~70% vs 96%) — the quantified case for OPTIMIZE ZORDER on
    multi-dimension-filtered facts.

    Scale posture: in production these stats come free from parquet
    footers / Delta file stats — nothing sorts at read time; this key is
    the audit MATH, run on a sample before committing a 100 TB re-layout.
    The two global sorts here are the simulation of the write-time
    layout (repartitionByRange + sortWithinPartitions on a cluster); the
    zone-map relation itself is rows/512 — tiny — and the probe join is
    a 4-row broadcast. All-integer, bitwise oracle."""
    x = F.pmod(F.col("user_id"), F.lit(256))
    y = F.datediff(F.to_date("ts"), F.lit(ZORDER_EPOCH).cast("date")).bitwiseAND(
        F.lit(255)
    )
    b = t.events.select(
        "event_id", x.alias("user_bucket"), y.alias("day_idx")
    ).select("event_id", "user_bucket", "day_idx", _zorder_key_col().alias("zkey"))

    def zones(order_cols: list, layout: str) -> DataFrame:
        rn = F.row_number().over(Window.orderBy(*order_cols))
        return (
            b.select(
                "user_bucket",
                "day_idx",
                F.shiftright(rn - F.lit(1), SKIP_GROUP_POW).alias("rg"),
            )
            .groupBy("rg")
            .agg(
                F.min("user_bucket").alias("bu_min"),
                F.max("user_bucket").alias("bu_max"),
                F.min("day_idx").alias("di_min"),
                F.max("day_idx").alias("di_max"),
            )
            .select(F.lit(layout).alias("layout"), "*")
        )

    z = zones([F.col("event_id")], "natural").unionAll(
        zones([F.col("zkey"), F.col("event_id")], "zorder")
    )
    probe = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("pcol"), F.lit(v).cast("bigint").alias("pval")
                )
                for c, v in SKIP_PROBES
            ]
        )
    )
    zp = z.select("*", probe.alias("p")).select(
        "layout", F.col("p.pcol").alias("pcol"), F.col("p.pval").alias("pval"),
        "bu_min", "bu_max", "di_min", "di_max",
    )
    hit = (
        F.when(
            F.col("pcol") == "user_bucket",
            F.col("pval").between(F.col("bu_min"), F.col("bu_max")),
        )
        .otherwise(F.col("pval").between(F.col("di_min"), F.col("di_max")))
        .cast("int")
    )
    a = zp.groupBy("layout", "pcol", "pval").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(hit).cast("bigint").alias("n_scanned"),
    )
    return a.select(
        "layout",
        "pcol",
        "pval",
        "n_groups",
        "n_scanned",
        F.expr(
            "CAST(((n_groups - n_scanned) * 1000000) div n_groups AS BIGINT)"
        ).alias("skipped_ppm"),
    ).orderBy("layout", "pcol", "pval")


@register(
    "events_seasonality_profile",
    "SELECT CAST(isodow(ts) AS BIGINT) AS dow, "
    "CAST(hour(ts) AS BIGINT) AS hour, "
    "CAST(count(*) AS BIGINT) AS n, "
    "CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM events) AS share "
    "FROM events GROUP BY dow, hour ORDER BY dow, hour",
)
def events_seasonality_profile(t: Tables) -> DataFrame:
    """Hour-of-day × ISO-day-of-week traffic profile with global share —
    the seasonality matrix behind anomaly baselines and capacity
    planning (events_anomaly_zscore's trailing window is the temporal
    view; this is the cyclic one). A 7×24-bounded aggregation with
    map-side combine plus a 1-row broadcast total; the share is one
    double division of exact counts. UTC session timezone pins hour()
    and the ISO dow convention matches DuckDB's isodow (Mon=1)."""
    tot = t.events.agg(F.count(F.lit(1)).alias("total"))
    prof = t.events.groupBy(
        F.dayofweek("ts").alias("_raw_dow"),
        F.hour("ts").alias("hour"),
    )
    # Spark dayofweek: Sun=1..Sat=7 — convert to ISO Mon=1..Sun=7
    iso = (F.pmod(F.col("_raw_dow") + F.lit(5), F.lit(7)) + F.lit(1)).cast("bigint")
    return (
        prof.agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            iso.alias("dow"),
            F.col("hour").cast("bigint").alias("hour"),
            "n",
            (F.col("n").cast("double") / F.col("total")).alias("share"),
        )
        .orderBy("dow", "hour")
    )


#: Heavy-hitters report size. The top-3 event_type counts are distinct
#: at every test SF (checked: 210/202/201 | 2017/2014/2006 |
#: 20302/20084/19941), so the exact top-3 is tie-free and the sketch's
#: item selection cannot flap at the boundary.
TOPK_EVENTS = 3


@register(
    "agg_approx_top_events",
    "WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events "
    "FROM events GROUP BY event_type), "
    "r AS (SELECT event_type, n_events, row_number() OVER "
    "(ORDER BY n_events DESC, event_type) AS rn FROM c) "
    f"SELECT event_type, n_events, TRUE AS sketch_ok FROM r WHERE rn <= {TOPK_EVENTS} "
    "ORDER BY event_type",
)
def agg_approx_top_events(t: Tables) -> DataFrame:
    """Heavy hitters via the datasketches frequent-items aggregate
    (approx_top_k): the exact top-TOPK_EVENTS event types joined against
    the sketch's estimates, with sketch_ok asserting the estimate EQUALS
    the exact count — the agg_approx_distinct calibration pattern. At
    this cardinality (5 types, far under the sketch's 10k tracked slots)
    the sketch is provably exact, so the claim is deterministic; at
    100 TB cardinalities the same plan ships one fixed-size mergeable
    sketch per partition instead of shuffling a full count table, and
    the exact twin is what keeps its error measurable when the tracked-
    slots dial starts to matter. A missed item or drifted estimate turns
    sketch_ok FALSE and the key red."""
    est = (
        t.events.agg(
            F.expr(f"approx_top_k(event_type, {TOPK_EVENTS})").alias("tk")
        )
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("event_type"), F.col("e.count").alias("est")
        )
    )
    exact = t.events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    top = (
        exact.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.desc("n_events"), F.asc("event_type"))
            ),
        )
        .filter(F.col("rn") <= TOPK_EVENTS)
        .drop("rn")
    )
    return (
        top.join(F.broadcast(est), "event_type", "left")
        .select(
            "event_type",
            "n_events",
            (F.coalesce(F.col("est"), F.lit(-1)) == F.col("n_events")).alias(
                "sketch_ok"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "events_value_winsorized",
    "WITH pct AS (SELECT event_type, "
    "quantile_disc(value, 0.05) AS p05, quantile_disc(value, 0.95) AS p95 "
    "FROM events GROUP BY event_type), "
    "clipped AS (SELECT e.event_type, value, p05, p95, "
    "CAST(least(greatest(value, p05), p95) AS DECIMAL(12,2)) AS w "
    "FROM events e JOIN pct ON pct.event_type = e.event_type) "
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n, p05, p95, "
    "CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) "
    "AS mean_raw, "
    "CAST(sum(w) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_winsorized "
    "FROM clipped GROUP BY event_type, p05, p95 ORDER BY event_type",
)
def events_value_winsorized(t: Tables) -> DataFrame:
    """Robust per-type value statistics: 5%/95% winsorization — clip to
    the DISCRETE percentile bounds (actual data values, the
    corpus_length_profile parity trick, so no interpolation floats),
    then compare the raw mean against the winsorized mean. The standard
    outlier-robust monitoring statistic; a large gap between the two
    means flags a heavy tail. Both means are exact-DECIMAL sums (the
    2-dec value domain is exact in DECIMAL(12,2)) divided once in
    doubles — partition-invariant and bitwise-oracled.

    Scale shape: pass 1 computes two discrete percentiles per type
    (per-group sort; approx_percentile is the huge-group swap), pass 2
    is one broadcast join of the |types|-row bounds plus a
    map-side-combinable decimal agg."""
    t.events.createOrReplaceTempView("_winsor_events")
    pct = t.spark.sql(
        """
        SELECT event_type,
               percentile_disc(0.05) WITHIN GROUP (ORDER BY value) AS p05,
               percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS p95
        FROM _winsor_events GROUP BY event_type
        """
    )
    clipped = t.events.join(F.broadcast(pct), "event_type").select(
        "event_type",
        "p05",
        "p95",
        F.col("value").cast("decimal(12,2)").alias("v"),
        F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
        .cast("decimal(12,2)")
        .alias("w"),
    )
    n = F.count(F.lit(1))
    return (
        clipped.groupBy("event_type", "p05", "p95")
        .agg(
            n.alias("n"),
            (F.sum("v").cast("double") / n.cast("double")).alias("mean_raw"),
            (F.sum("w").cast("double") / n.cast("double")).alias("mean_winsorized"),
        )
        .select("event_type", "n", "p05", "p95", "mean_raw", "mean_winsorized")
        .orderBy("event_type")
    )


@register(
    "events_rolling_median_daily",
    "WITH daily AS (SELECT CAST(ts AS DATE) AS d, event_type, "
    "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2) "
    "SELECT strftime(a.d, '%Y-%m-%d') AS day, a.event_type AS event_type, a.n AS n, "
    "CAST(quantile_disc(b.n, 0.5) AS BIGINT) AS med7, "
    "CAST(a.n - quantile_disc(b.n, 0.5) AS BIGINT) AS dev "
    "FROM daily a JOIN daily b ON b.event_type = a.event_type "
    "AND b.d BETWEEN a.d - 7 AND a.d - 1 "
    "GROUP BY a.d, a.event_type, a.n ORDER BY 1, 2",
)
def events_rolling_median_daily(t: Tables) -> DataFrame:
    """Trailing-7-day MEDIAN of daily volume per event type, with each
    day's deviation from it — the outlier-ROBUST anomaly baseline that
    complements events_anomaly_zscore (one spike day inflates a mean
    and sigma for a week; it moves a median not at all). The median is
    percentile_disc over the trailing window's integer counts via the
    day-spine range join (the rolling-DISTINCT pattern of
    events_rolling_active_users: order statistics, like distincts,
    aren't frame-aggregable) — all-integer, exact oracle. Input to the
    join is the |types|x|days| daily relation, not raw events, so the
    range join is tiny at any corpus size."""
    daily = (
        t.events.groupBy(
            F.to_date("ts").alias("d"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))
    ).localCheckpoint(eager=True)  # both sides of the range self-join
    a = daily.alias("a")
    b = daily.alias("b")
    joined = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & F.col("b.d").between(F.date_sub(F.col("a.d"), 7), F.date_sub(F.col("a.d"), 1)),
    ).select(
        F.col("a.d").alias("d"),
        F.col("a.event_type").alias("event_type"),
        F.col("a.n").alias("n"),
        F.col("b.n").alias("bn"),
    )
    joined.createOrReplaceTempView("_med7")
    return t.spark.sql(
        """
        SELECT date_format(d, 'yyyy-MM-dd') AS day, event_type, n,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY bn) AS BIGINT) AS med7,
               CAST(n - percentile_disc(0.5) WITHIN GROUP (ORDER BY bn) AS BIGINT) AS dev
        FROM _med7 GROUP BY d, event_type, n ORDER BY day, event_type
        """
    )


@register(
    "events_rolling_wau_bitmap",
    # the oracle is the plain EXACT rolling distinct — bitmaps are an
    # exact representation, so unlike the HLL key there is no envelope:
    # the counts must match to the integer
    "WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events), "
    "user_days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS ud FROM events) "
    "SELECT strftime(d, '%Y-%m-%d') AS day, "
    "CAST(count(DISTINCT user_id) AS BIGINT) AS wau "
    "FROM days JOIN user_days ON ud BETWEEN d - 6 AND d GROUP BY d ORDER BY day",
)
def events_rolling_wau_bitmap(t: Tables) -> DataFrame:
    """Rolling 7-day active users via EXACT mergeable BITMAPS — the
    third member of the rolling-distinct family: the range-join key
    (events_rolling_active_users) is exact but shuffles |users|x|days|;
    the HLL key (events_rolling_wau_hll) is fixed-size but approximate;
    bitmap_construct_agg/bitmap_or_agg state is BOTH exact AND
    mergeable (one bitmap per (day, 32k-id bucket), map-side
    combinable, window-unioned like sketches), which is why this is
    the production plan for exact high-cardinality rolling distincts
    when the id space is dense integers. The day window unions
    |window|·|buckets| bitmaps; the final count is the bucket-sum of
    popcounts. Being exact, the oracle is the plain distinct count —
    no error envelope at all."""
    buckets = t.events.selectExpr(
        "CAST(ts AS DATE) AS d",
        "bitmap_bucket_number(user_id) AS bkt",
        "bitmap_bit_position(user_id) AS pos",
    )
    day_bm = buckets.groupBy("d", "bkt").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    days = day_bm.select("d").distinct()
    win = (
        days.alias("a")
        .join(
            day_bm.alias("b"),
            F.col("b.d").between(F.date_sub(F.col("a.d"), 6), F.col("a.d")),
        )
        .groupBy(F.col("a.d").alias("d"), F.col("b.bkt").alias("bkt"))
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
    )
    return (
        win.groupBy("d")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("wau"))
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"), "wau")
        .orderBy("day")
    )


@register(
    "events_daily_trend_ols",
    "WITH daily AS (SELECT event_type, "
    "CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS x, "
    "CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2), "
    "s AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n, "
    "CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy, "
    "CAST(sum(x * x) AS DOUBLE) AS sxx, CAST(sum(x * y) AS DOUBLE) AS sxy "
    "FROM daily GROUP BY event_type) "
    "SELECT event_type, CAST(n AS BIGINT) AS n_days, "
    "(n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope, "
    "(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept "
    "FROM s ORDER BY event_type",
)
def events_daily_trend_ols(t: Tables) -> DataFrame:
    """Ordinary-least-squares trend of daily volume per event type —
    slope (events/day of drift) and intercept, the regression behind
    'is this stream growing or decaying?' monitoring and the linear
    half of any forecast. Built like profile_correlations: the power
    sums are EXACT integer aggregates (day index × integer counts —
    all < 2^53, so the double casts are exact), then one pinned-shape
    formula per group — partition-invariant, bitwise-oracled, no
    regr_slope dependence (whose accumulation order floats). One
    date-bucketed shuffle; the regression itself is metadata-sized."""
    x = (F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))).cast("long")
    daily = t.events.groupBy("event_type", x.alias("x")).agg(
        F.count(F.lit(1)).alias("y")
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
    ).orderBy("event_type")


@register(
    "events_stickiness_dau_wau",
    "WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events), "
    "user_days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS ud FROM events), "
    "dau AS (SELECT ud AS d, CAST(count(*) AS BIGINT) AS dau FROM user_days GROUP BY ud), "
    "wau AS (SELECT d, CAST(count(DISTINCT user_id) AS BIGINT) AS wau "
    "FROM days JOIN user_days ON ud BETWEEN d - 6 AND d GROUP BY d) "
    "SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau, wau, "
    "CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness "
    "FROM dau JOIN wau ON wau.d = dau.d ORDER BY day",
)
def events_stickiness_dau_wau(t: Tables) -> DataFrame:
    """DAU/WAU stickiness per day — the engagement-frequency ratio every
    product dashboard tracks (1.0 = every weekly user active daily).
    Composes the deduped user-day relation both ways: a per-day distinct
    count and the 7-day range-join WAU, one double division of exact
    integers. At 100 TB both inputs ride the same |users|x|days|
    relation the WAU family already shares (or its bitmap/HLL form)."""
    ud = t.events.select("user_id", F.to_date("ts").alias("ud")).distinct()
    dau = ud.groupBy(F.col("ud").alias("d")).agg(F.count(F.lit(1)).alias("dau"))
    days = ud.select(F.col("ud").alias("d")).distinct()
    wau = (
        days.join(ud, F.col("ud").between(F.date_sub(F.col("d"), 6), F.col("d")))
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, "d")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


#: Path-analysis geometry: first PATH_LEN event types of each user-day
#: journey, top PATH_TOP paths reported.
PATH_LEN = 5
PATH_TOP = 10


@register(
    "events_session_path_topk",
    "WITH seq AS (SELECT user_id, CAST(ts AS DATE) AS d, "
    "list(event_type ORDER BY ts, event_id) AS path FROM events "
    "GROUP BY user_id, CAST(ts AS DATE)), "
    "p AS (SELECT array_to_string(path[1:" + str(PATH_LEN) + "], '>') AS path "
    "FROM seq) "
    "SELECT path, CAST(count(*) AS BIGINT) AS n_journeys FROM p GROUP BY path "
    f"ORDER BY n_journeys DESC, path LIMIT {PATH_TOP}",
)
def events_session_path_topk(t: Tables) -> DataFrame:
    """Clickstream path analysis: the most common user journeys — each
    (user, day) session's first PATH_LEN event types in time order,
    joined into a path string, counted and top-k'd. The funnel keys ask
    about ONE prescribed sequence; this key DISCOVERS the dominant
    sequences (the sankey/flow diagram's input). Ordering is pinned by
    (ts, event_id), so the path strings are deterministic in both
    engines.

    Scale shape: one user-day shuffle building the ordered per-session
    list (the same exchange every per-user sequence op shares), then a
    map-side-combinable path count over strings bounded by
    |types|^PATH_LEN, and a TakeOrdered report."""
    seq = (
        t.events.groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s.getField("event_type"),
            ).alias("path")
        )
    )
    p = seq.select(
        F.array_join(F.slice("path", 1, PATH_LEN), ">").alias("path")
    )
    return (
        p.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_journeys"))
        .orderBy(F.desc("n_journeys"), "path")
        .limit(PATH_TOP)
    )


#: Equi-depth histogram bucket count.
EQD_BINS = 10


@register(
    "events_value_equidepth",
    "WITH b AS (SELECT value, ntile("
    + str(EQD_BINS)
    + ") OVER (ORDER BY value, event_id) AS bin FROM events) "
    "SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n, "
    "min(value) AS lo, max(value) AS hi FROM b GROUP BY bin ORDER BY bin",
)
def events_value_equidepth(t: Tables) -> DataFrame:
    """EQUI-DEPTH histogram of the value column — the optimizer-stats /
    data-profiling complement of events_value_histogram's equi-width
    bins: every bucket holds (count/EQD_BINS)±1 rows and the [lo, hi]
    boundaries adapt to density, which is what selectivity estimation
    actually wants on skewed columns. ntile ties are pinned on
    (value, event_id), so bucket membership — and therefore every
    boundary — is deterministic in both engines.

    Scale note: exact ntile is a total sort; the at-scale swap is
    approx_percentile boundaries + one bucketing pass — REGISTERED as
    events_value_equidepth_approx (GK rank-bound oracle), same as the
    CCNet-buckets dial."""
    w = Window.orderBy("value", "event_id")
    b = t.events.select("value", F.ntile(EQD_BINS).over(w).alias("bin"))
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .select(F.col("bin").cast("bigint").alias("bin"), "n", "lo", "hi")
        .orderBy("bin")
    )


@register(
    "events_value_equidepth_approx",
    "WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events) "
    f"SELECT CAST(u.b AS INT) AS boundary, n.n AS n, TRUE AS approx_ok "
    f"FROM (SELECT unnest(range(1, {EQD_BINS})) AS b) u, n ORDER BY boundary",
)
def events_value_equidepth_approx(t: Tables) -> DataFrame:
    """The documented at-scale swap for events_value_equidepth,
    REGISTERED (round-5 verdict #3 — a documented dial should be a
    passing key): the 9 decile boundaries come from ONE
    percentile_approx (Greenwald-Khanna) pass instead of the exact
    ntile's total sort, then a second scan re-ranks every boundary.
    The oracle-checkable claim is GK's deterministic rank guarantee —
    the returned boundary for quantile q has rank within n/PCT_ACCURACY
    of q·n, verified by counting value ≤/< boundary over the raw column
    (the agg_approx_percentile envelope, applied to all 9 boundaries at
    once). approx_ok is a theorem, not a hope, so the key is exact-
    oracled despite being a sketch.

    Scale shape: two scans, zero total sorts, no window — the sketch is
    fixed-size mergeable state (map-side partials), the re-rank is 18
    conditional sums in one partial agg. This replaces an O(n log n)
    global sort with O(n); at 100 TB the exact twin is the calibration
    baseline, this is the plan you run."""
    qs = [i / EQD_BINS for i in range(1, EQD_BINS)]
    ap = t.events.agg(
        F.percentile_approx(
            "value", F.array(*[F.lit(q) for q in qs]), F.lit(PCT_ACCURACY)
        ).alias("bs"),
        F.count(F.lit(1)).alias("n"),
    )
    joined = t.events.select("value").crossJoin(F.broadcast(ap))
    aggs = [F.max("n").alias("n")]
    for i in range(len(qs)):
        b = F.col("bs")[i]
        aggs.append(
            F.sum(F.when(F.col("value") <= b, 1).otherwise(0)).alias(f"le{i}")
        )
        aggs.append(
            F.sum(F.when(F.col("value") < b, 1).otherwise(0)).alias(f"lt{i}")
        )
    row = joined.agg(*aggs)
    eps = 1.0 / PCT_ACCURACY
    structs = []
    for i, q in enumerate(qs):
        ok = (F.col(f"le{i}") >= (q - eps) * F.col("n")) & (
            F.col(f"lt{i}") <= (q + eps) * F.col("n")
        )
        structs.append(
            F.struct(
                F.lit(i + 1).alias("boundary"),
                F.col("n").alias("n"),
                ok.alias("approx_ok"),
            )
        )
    return (
        row.select(F.explode(F.array(*structs)).alias("s"))
        .select("s.boundary", "s.n", "s.approx_ok")
        .orderBy("boundary")
    )


#: Autocorrelation lags profiled (1 day, half week, week).
ACF_LAGS = (1, 3, 7)


@register(
    "events_autocorr_daily",
    "WITH daily AS (SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y "
    "FROM events GROUP BY 1), "
    "lags AS (SELECT CAST(u.k AS BIGINT) AS lag FROM "
    f"(SELECT unnest([{', '.join(str(k) for k in ACF_LAGS)}]) AS k) u), "
    "pairs AS (SELECT l.lag, a.y AS x, b.y AS z FROM lags l "
    "JOIN daily a ON TRUE JOIN daily b ON b.d = a.d + CAST(l.lag AS INT)), "
    "s AS (SELECT lag, CAST(count(*) AS DOUBLE) AS n, "
    "CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(z) AS DOUBLE) AS sz, "
    "CAST(sum(x * x) AS DOUBLE) AS sxx, CAST(sum(z * z) AS DOUBLE) AS szz, "
    "CAST(sum(x * z) AS DOUBLE) AS sxz FROM pairs GROUP BY lag) "
    "SELECT lag, CAST(n AS BIGINT) AS n_pairs, "
    "(n * sxz - sx * sz) / (sqrt(n * sxx - sx * sx) * sqrt(n * szz - sz * sz)) "
    "AS autocorr FROM s ORDER BY lag",
)
def events_autocorr_daily(t: Tables) -> DataFrame:
    """Lag-k autocorrelation of the daily event-volume series (k = 1, 3,
    7 days) — the seasonality-detection statistic behind choosing the
    z-score window and the weekly profile (a strong lag-7 peak says the
    cyclic baseline matters). Computed as the Pearson correlation of the
    series with its k-shifted self: exact integer power sums (counts ×
    counts, all < 2^53 so the double casts are exact) and one
    pinned-shape formula per lag — the profile_correlations discipline
    on a self-join. The |days|-sized series makes everything after the
    one date-bucketed shuffle metadata-sized."""
    daily = t.events.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    lags = local_rows_df(t.spark, [(k,) for k in ACF_LAGS], "lag long")
    a = daily.select(F.col("d").alias("da"), F.col("y").alias("x"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("z"))
    pairs = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("db") == F.expr("date_add(da, CAST(lag AS INT))"))
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("z").cast("double").alias("sz"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("z") * F.col("z")).cast("double").alias("szz"),
        F.sum(F.col("x") * F.col("z")).cast("double").alias("sxz"),
    )
    ac = (F.col("n") * F.col("sxz") - F.col("sx") * F.col("sz")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("szz") - F.col("sz") * F.col("sz"))
    )
    return s.select(
        "lag", F.col("n").cast("bigint").alias("n_pairs"), ac.alias("autocorr")
    ).orderBy("lag")


@register(
    "events_weekday_weekend_ttest",
    "WITH daily AS (SELECT CAST(ts AS DATE) AS d, "
    "CASE WHEN isodow(ts) >= 6 THEN 'weekend' ELSE 'weekday' END AS grp, "
    "CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2), "
    "s AS (SELECT grp, CAST(count(*) AS DOUBLE) AS n, "
    "CAST(sum(y) AS DOUBLE) AS sy, CAST(sum(y * y) AS DOUBLE) AS syy "
    "FROM daily GROUP BY grp), "
    "w AS (SELECT n AS n1, sy AS sy1, syy AS syy1 FROM s WHERE grp = 'weekday'), "
    "e AS (SELECT n AS n2, sy AS sy2, syy AS syy2 FROM s WHERE grp = 'weekend') "
    "SELECT CAST(n1 AS BIGINT) AS n_weekday, CAST(n2 AS BIGINT) AS n_weekend, "
    "sy1 / n1 AS mean_weekday, sy2 / n2 AS mean_weekend, "
    "(sy1 / n1 - sy2 / n2) / sqrt("
    "((syy1 - sy1 * sy1 / n1) / (n1 - 1)) / n1 + "
    "((syy2 - sy2 * sy2 / n2) / (n2 - 1)) / n2) AS t_stat "
    "FROM w CROSS JOIN e",
)
def events_weekday_weekend_ttest(t: Tables) -> DataFrame:
    """Welch two-sample t-statistic for weekday vs weekend daily volume
    — the second member of the testing family (chi-square asks about
    MIX shift; this asks about LEVEL shift, the canonical 'is weekend
    traffic different?' question). Group variances come from exact
    integer power sums in one pinned double expression; compare t_stat
    to the Welch-df critical value downstream. ISO dow >= 6 = weekend
    in both engines (the seasonality-profile convention)."""
    iso = F.pmod(F.dayofweek("ts") + F.lit(5), F.lit(7)) + F.lit(1)
    daily = t.events.groupBy(
        F.to_date("ts").alias("d"),
        F.when(iso >= 6, F.lit("weekend")).otherwise(F.lit("weekday")).alias("grp"),
    ).agg(F.count(F.lit(1)).alias("y"))
    s = daily.groupBy("grp").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    w = s.filter(F.col("grp") == "weekday").select(
        F.col("n").alias("n1"), F.col("sy").alias("sy1"), F.col("syy").alias("syy1")
    )
    e = s.filter(F.col("grp") == "weekend").select(
        F.col("n").alias("n2"), F.col("sy").alias("sy2"), F.col("syy").alias("syy2")
    )
    m1 = F.col("sy1") / F.col("n1")
    m2 = F.col("sy2") / F.col("n2")
    v1 = (F.col("syy1") - F.col("sy1") * F.col("sy1") / F.col("n1")) / (F.col("n1") - 1)
    v2 = (F.col("syy2") - F.col("sy2") * F.col("sy2") / F.col("n2")) / (F.col("n2") - 1)
    tstat = (m1 - m2) / F.sqrt(v1 / F.col("n1") + v2 / F.col("n2"))
    return w.crossJoin(e).select(
        F.col("n1").cast("bigint").alias("n_weekday"),
        F.col("n2").cast("bigint").alias("n_weekend"),
        m1.alias("mean_weekday"),
        m2.alias("mean_weekend"),
        tstat.alias("t_stat"),
    )


#: Robust peak threshold: flag days exceeding median + MAD_K * MAD of
#: the trailing window.
MAD_K = 3


@register(
    "events_peak_mad_flags",
    "WITH daily AS (SELECT CAST(ts AS DATE) AS d, event_type, "
    "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
    "w AS (SELECT a.d, a.event_type, a.n, b.n AS bn FROM daily a "
    "JOIN daily b ON b.event_type = a.event_type "
    "AND b.d BETWEEN a.d - 7 AND a.d - 1), "
    "med AS (SELECT d, event_type, n, "
    "CAST(quantile_disc(bn, 0.5) AS BIGINT) AS med7 FROM w "
    "GROUP BY d, event_type, n), "
    "mad AS (SELECT w.d, w.event_type, "
    "CAST(quantile_disc(abs(w.bn - m.med7), 0.5) AS BIGINT) AS mad7 "
    "FROM w JOIN med m ON m.d = w.d AND m.event_type = w.event_type "
    "GROUP BY w.d, w.event_type) "
    "SELECT strftime(m.d, '%Y-%m-%d') AS day, m.event_type AS event_type, "
    "m.n AS n, m.med7, mad.mad7, "
    f"(m.n > m.med7 + {MAD_K} * mad.mad7) AS is_peak "
    "FROM med m JOIN mad ON mad.d = m.d AND mad.event_type = m.event_type "
    "ORDER BY 1, 2",
)
def events_peak_mad_flags(t: Tables) -> DataFrame:
    """Robust peak detection: a day is flagged when its volume exceeds
    the trailing-7-day MEDIAN by more than MAD_K trailing MADs (median
    absolute deviation) — the median/MAD twin of events_anomaly_zscore's
    mean/sigma rule, immune to the window's own outliers (one spike day
    corrupts a mean AND its sigma for a week; it moves neither the
    median nor the MAD). Two grouped discrete-percentile passes over
    the same day-spine range join, all-integer end to end — the verdict
    column is a pure integer comparison, so even the flag is
    bitwise-oracled. Input is the |types|×|days| daily relation; tiny
    at any event volume."""
    daily = (
        t.events.groupBy(F.to_date("ts").alias("d"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)  # both sides of the range self-join
    )
    a, b = daily.alias("a"), daily.alias("b")
    w = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & F.col("b.d").between(
            F.date_sub(F.col("a.d"), 7), F.date_sub(F.col("a.d"), 1)
        ),
    ).select(
        F.col("a.d").alias("d"),
        F.col("a.event_type").alias("event_type"),
        F.col("a.n").alias("n"),
        F.col("b.n").alias("bn"),
    )
    w.createOrReplaceTempView("_mad_w")
    med = t.spark.sql(
        """
        SELECT d, event_type, n,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY bn) AS BIGINT) AS med7
        FROM _mad_w GROUP BY d, event_type, n
        """
    )
    w.join(
        med.select("d", "event_type", "med7"), ["d", "event_type"]
    ).createOrReplaceTempView("_mad_dev")
    mad = t.spark.sql(
        """
        SELECT d, event_type,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(bn - med7)) AS BIGINT) AS mad7
        FROM _mad_dev GROUP BY d, event_type
        """
    )
    return (
        med.join(mad, ["d", "event_type"])
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "event_type",
            "n",
            "med7",
            "mad7",
            (F.col("n") > F.col("med7") + MAD_K * F.col("mad7")).alias("is_peak"),
        )
        .orderBy("day", "event_type")
    )


#: Count-min sketch geometry: d hash rows × w counters. w ≪ #keys on
#: purpose — the sketch regime is heavy-hitter estimation where exact
#: per-key state would grow with cardinality; (event_type, day) keys
#: (~hundreds) against w=64 produce real collisions, so the
#: overestimate column shows the sketch's actual error behavior.
CMS_D = 4
CMS_W = 64


def _cms_pos_sql(j: int, key: str) -> str:
    return (
        f"CAST('0x' || substr(md5('cm{j}:' || {key}), 1, 6) AS BIGINT) % {CMS_W}"
    )


_CMS_KEY_SQL = "event_type || '|' || strftime(ts, '%Y-%m-%d')"

_CMS_SQL = (
    "WITH base AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
    f"{_CMS_KEY_SQL} AS ck FROM events), "
    "cnt AS (SELECT ck, any_value(event_type) AS event_type, "
    "any_value(day) AS day, CAST(count(*) AS BIGINT) AS exact_cnt "
    "FROM base GROUP BY ck), "
    "counters AS (SELECT u.s.j AS j, u.s.pos AS pos, CAST(count(*) AS BIGINT) AS c FROM "
    "(SELECT ["
    + ", ".join(
        f"struct_pack(j := {j}, pos := {_cms_pos_sql(j, 'ck')})" for j in range(CMS_D)
    )
    + "] AS ps FROM base), LATERAL unnest(ps) AS u(s) GROUP BY u.s.j, u.s.pos), "
    "probe AS (SELECT ck, u.s.j AS j, u.s.pos AS pos FROM (SELECT ck, ["
    + ", ".join(
        f"struct_pack(j := {j}, pos := {_cms_pos_sql(j, 'ck')})" for j in range(CMS_D)
    )
    + "] AS ps FROM cnt), LATERAL unnest(ps) AS u(s)), "
    "est AS (SELECT ck, CAST(min(c) AS BIGINT) AS cms_est FROM probe "
    "JOIN counters ON probe.j = counters.j AND probe.pos = counters.pos "
    "GROUP BY ck) "
    "SELECT c.event_type, c.day, c.exact_cnt, e.cms_est, "
    "e.cms_est - c.exact_cnt AS overestimate "
    "FROM cnt c JOIN est e ON c.ck = e.ck ORDER BY c.event_type, c.day"
)


@register("events_count_min_sketch", _CMS_SQL)
def events_count_min_sketch(t: Tables) -> DataFrame:
    """Count-min sketch over (event_type, day) traffic, built as a
    relational plan and calibrated against the exact counts in the same
    result: d×w hash-bucket counters (one groupBy over the fact stream
    — map-side combinable, output bounded by the sketch GEOMETRY at
    d·w rows regardless of data scale), then each key's estimate is the
    min of its d counters. overestimate = est − exact is ≥ 0 by the CMS
    theorem — and genuinely > 0 here for colliding keys, because w is
    deliberately sized below the key cardinality (that is the regime
    sketches exist for). Every value is a deterministic integer (md5
    positions, exact counts, min) ⇒ full bitwise oracle — the same
    calibration pattern as agg_approx_distinct/HLL, but with the sketch
    internals themselves oracle-checked since nothing is randomized.

    Scale posture: the counter table is FIXED-SHAPE mergeable state —
    the d×w grid ORs across partitions, days, or streaming batches by
    addition, which is why production pipelines keep CMS per time
    bucket and merge on read (the events_rolling_wau_hll pattern, with
    addition instead of sketch-union); exact per-key counts, by
    contrast, are unbounded state. The probe side joins the broadcast
    counter grid (d·w ≤ 256 rows at ANY scale factor — geometry-capped,
    legitimate under the no-forced-broadcast rule)."""
    base = t.events.select(
        F.concat(
            F.col("event_type"), F.lit("|"), F.date_format("ts", "yyyy-MM-dd")
        ).alias("ck"),
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )

    def pos(j, key):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"cm{j}:"), key)), 1, 6), 16, 10
            ).cast("bigint")
            % CMS_W
        )

    def pos_structs(key):
        return F.array(
            *[
                F.struct(F.lit(j).alias("j"), pos(j, key).alias("pos"))
                for j in range(CMS_D)
            ]
        )

    counters = (
        base.select(F.explode(pos_structs(F.col("ck"))).alias("u"))
        .select("u.j", "u.pos")
        .groupBy("j", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cnt = base.groupBy("ck").agg(
        F.any_value("event_type").alias("event_type"),
        F.any_value("day").alias("day"),
        F.count(F.lit(1)).alias("exact_cnt"),
    )
    probe = cnt.select("ck", F.explode(pos_structs(F.col("ck"))).alias("u")).select(
        "ck", "u.j", "u.pos"
    )
    est = (
        probe.join(F.broadcast(counters), ["j", "pos"])
        .groupBy("ck")
        .agg(F.min("c").cast("bigint").alias("cms_est"))
    )
    return (
        cnt.join(est, "ck")
        .select(
            "event_type",
            "day",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy("event_type", "day")
    )


_SCD2_SQL = (
    "WITH seq AS (SELECT user_id, event_type, ts, event_id, "
    "CASE WHEN lag(event_type) OVER w IS NULL "
    "OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS brk "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "runs AS (SELECT user_id, event_type, ts, "
    "sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS UNBOUNDED PRECEDING) AS run_id FROM seq), "
    "spans AS (SELECT user_id, CAST(run_id AS BIGINT) AS run_id, "
    "any_value(event_type) AS state, min(ts) AS vf, "
    "CAST(count(*) AS BIGINT) AS n_events "
    "FROM runs GROUP BY user_id, run_id) "
    "SELECT user_id, run_id, state, "
    "strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from, "
    "strftime(lead(vf) OVER (PARTITION BY user_id ORDER BY run_id), "
    "'%Y-%m-%d %H:%M:%S') AS valid_to, "
    "lead(vf) OVER (PARTITION BY user_id ORDER BY run_id) IS NULL AS is_current, "
    "n_events FROM spans ORDER BY user_id, run_id"
)


@register("scd2_user_state_history", _SCD2_SQL)
def scd2_user_state_history(t: Tables) -> DataFrame:
    """Batch SCD2 (slowly-changing-dimension type 2) derivation: each
    user's event_type stream collapses to validity intervals — one row
    per run of consecutive identical states with valid_from / valid_to
    chained so intervals tile the user's history and exactly one row
    per user is_current. This is the batch twin of the streaming SCD2
    parquet sink (streaming/sinks.py::scd2_parquet_batches): the sink
    maintains the chain incrementally per micro-batch; this key derives
    the identical shape from raw history in one pass — the backfill /
    rebuild job every SCD2 pipeline needs next to its incremental path.

    Plan: the gaps-and-islands shape (window_session's pattern) — two
    window passes over ONE (user_id) shuffle partitioning (break flags
    + running sum share the sort), a per-run rollup co-partitioned on
    user_id, and the valid_to chain is one more lead() over the runs —
    runs ≪ events, so the second window is cheap. Deterministic
    ordering pinned by (ts, event_id); at 100 TB this is the standard
    sessionization shuffle: keyed by user, time-sorted within, no
    global sort anywhere."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    runs = seq.select(
        "user_id",
        "event_type",
        "ts",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("run_id"),
    )
    spans = runs.groupBy("user_id", F.col("run_id").cast("bigint").alias("run_id")).agg(
        F.any_value("event_type").alias("state"),
        F.min("ts").alias("vf"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wr = Window.partitionBy("user_id").orderBy("run_id")
    nxt = F.lead("vf").over(wr)
    return spans.select(
        "user_id",
        "run_id",
        "state",
        F.date_format("vf", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        nxt.isNull().alias("is_current"),
        "n_events",
    ).orderBy("user_id", "run_id")


#: CUPED geometry: the pre-period boundary (first 15 of the 30 data
#: days) and the synthetic assignment (user parity — any deterministic
#: user-level hash works; parity keeps the oracle trivial to audit).
CUPED_BOUNDARY = "2024-01-16 00:00:00"

#: Pinned IEEE shapes rendered identically for both engines.
_CUPED_THETA = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
_CUPED_ADJ = f"syv / nv - ({_CUPED_THETA}) * (sxv / nv - sx / n)"
_CUPED_VR = (
    "((n * sxy - sx * sy) * (n * sxy - sx * sy)) / "
    "((n * sxx - sx * sx) * (n * syy - sy * sy))"
)


def _cuped_sql() -> str:
    d = "CAST(value AS DECIMAL(12,2))"
    zero = "CAST(0 AS DECIMAL(12,2))"
    pre = f"ts < TIMESTAMP '{CUPED_BOUNDARY}'"
    return (
        "WITH u AS (SELECT user_id % 2 AS variant, "
        f"CAST(sum(CASE WHEN {pre} THEN {d} ELSE {zero} END) AS DECIMAL(12,2)) AS x, "
        f"CAST(sum(CASE WHEN NOT ({pre}) THEN {d} ELSE {zero} END) AS DECIMAL(12,2)) AS y "
        "FROM events GROUP BY user_id), "
        "s AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
        "CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS sx, "
        "CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS sy, "
        "CAST(CAST(sum(x * x) AS VARCHAR) AS DOUBLE) AS sxx, "
        "CAST(CAST(sum(y * y) AS VARCHAR) AS DOUBLE) AS syy, "
        "CAST(CAST(sum(x * y) AS VARCHAR) AS DOUBLE) AS sxy FROM u), "
        "v AS (SELECT variant, CAST(count(*) AS DOUBLE) AS nv, "
        "CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS sxv, "
        "CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS syv FROM u GROUP BY variant) "
        "SELECT CAST(variant AS BIGINT) AS variant, CAST(nv AS BIGINT) AS n_users, "
        "syv / nv AS mean_value_post, "
        f"{_CUPED_ADJ} AS mean_value_cuped, "
        f"{_CUPED_THETA} AS theta, "
        f"{_CUPED_VR} AS variance_reduction "
        "FROM v, s ORDER BY variant"
    )


@register("events_ab_cuped", _cuped_sql())
def events_ab_cuped(t: Tables) -> DataFrame:
    """CUPED-adjusted A/B readout (Deng et al. 2013) — the variance-
    reduction technique every large experimentation platform applies
    before calling a test: each user's post-period metric Y is adjusted
    by their PRE-period covariate X (theta = cov(X,Y)/var(X), pooled
    across variants so the adjustment is assignment-independent and
    unbiased), shrinking between-user noise by the squared pre/post
    correlation. Reported per synthetic variant (user parity): raw and
    CUPED means, the pooled theta, and the achieved variance-reduction
    factor rho².

    Determinism at scale: per-user X/Y are DECIMAL(12,2) sums (exact,
    associative — identical on any partitioning), the pooled moments are
    five more exact DECIMAL power sums routed decimal→VARCHAR→double
    (correctly rounded in both engines), and every float statistic is
    ONE pinned-shape formula over them — the profile_correlations
    discipline. Plan: one user_id shuffle for the per-user rollup, then
    a 1-row pooled aggregate broadcast onto the 2-row variant aggregate;
    nothing else moves."""
    d = F.col("value").cast("decimal(12,2)")
    zero = F.lit(0).cast("decimal(12,2)")
    pre = F.col("ts") < F.lit(CUPED_BOUNDARY).cast("timestamp")
    u = (
        t.events.groupBy("user_id")
        .agg(
            F.sum(F.when(pre, d).otherwise(zero)).cast("decimal(12,2)").alias("x"),
            F.sum(F.when(~pre, d).otherwise(zero)).cast("decimal(12,2)").alias("y"),
        )
        .select(F.pmod(F.col("user_id"), F.lit(2)).alias("variant"), "x", "y")
    )
    s = u.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("double").alias("nv"),
        F.sum("x").cast("double").alias("sxv"),
        F.sum("y").cast("double").alias("syv"),
    )
    return (
        v.crossJoin(F.broadcast(s))
        .select(
            F.col("variant").cast("bigint").alias("variant"),
            F.col("nv").cast("bigint").alias("n_users"),
            F.expr("syv / nv").alias("mean_value_post"),
            F.expr(_CUPED_ADJ).alias("mean_value_cuped"),
            F.expr(_CUPED_THETA).alias("theta"),
            F.expr(_CUPED_VR).alias("variance_reduction"),
        )
        .orderBy("variant")
    )


#: Kaplan-Meier censoring rule: a user last seen within this many days
#: of the observation edge is censored (still active), not churned.
KM_CENSOR_DAYS = 6

_KM_SQL = (
    "WITH u AS (SELECT user_id, min(CAST(ts AS DATE)) AS fd, "
    "max(CAST(ts AS DATE)) AS ld FROM events GROUP BY user_id), "
    "g AS (SELECT max(CAST(ts AS DATE)) AS dmax FROM events), "
    "c AS (SELECT date_diff('day', fd, ld) AS d, "
    f"CASE WHEN date_diff('day', ld, dmax) <= {KM_CENSOR_DAYS} THEN 1 ELSE 0 END "
    "AS cens FROM u, g), "
    "tbl AS (SELECT d, CAST(sum(1 - cens) AS BIGINT) AS churned, "
    "CAST(sum(cens) AS BIGINT) AS censored FROM c GROUP BY d), "
    "r AS (SELECT *, CAST(sum(churned + censored) OVER (ORDER BY d DESC) AS BIGINT) "
    "AS n_at_risk FROM tbl), "
    "fx AS (SELECT d, n_at_risk, churned, censored, "
    "CAST(n_at_risk - churned AS DOUBLE) / CAST(n_at_risk AS DOUBLE) AS factor "
    "FROM r), "
    "a AS (SELECT list_sort(list(struct_pack(d := d, n_at_risk := n_at_risk, "
    "churned := churned, censored := censored, factor := factor))) AS arr FROM fx), "
    "e AS (SELECT u.i AS pos, arr FROM a, "
    "LATERAL unnest(range(1, len(arr) + 1)) AS u(i)) "
    "SELECT CAST(arr[pos].d AS BIGINT) AS duration_days, "
    "arr[pos].n_at_risk AS n_at_risk, arr[pos].churned AS churned, "
    "arr[pos].censored AS censored, "
    "list_reduce(list_transform(list_slice(arr, 1, pos), s -> s.factor), "
    "(acc, x) -> acc * x) AS survival "
    "FROM e ORDER BY duration_days"
)


@register("users_survival_km", _KM_SQL)
def users_survival_km(t: Tables) -> DataFrame:
    """Kaplan-Meier survival over user lifetimes — the churn curve
    (retention's duration-model twin: events_retention_cohort counts
    day-offset returns; this estimates P(lifetime > t) under RIGHT
    CENSORING, crediting still-active users for the time they survived
    without counting them as churned). Lifetime = days between a user's
    first and last event; users last seen within KM_CENSOR_DAYS of the
    observation edge are censored. S(t) = prod over event times ti<=t of
    (1 - d_i/n_i), with d_i churns at ti and n_i the at-risk count.

    Exactness: d_i / n_i / censored counts are all-integer (one user_id
    shuffle + a duration-bounded histogram + an integer suffix-sum
    window); each hazard factor is ONE pinned double division; and the
    cumulative product is an ORDERED FOLD over the duration-sorted
    factor array (left fold, init 1.0 — IEEE-identical to DuckDB's
    list_reduce because 1.0*x is exact), the EWMA discipline applied to
    products. The KM table itself is |distinct durations| rows — tiny at
    any corpus scale — so the quadratic slice-fold is O(30²) on one
    row's array, never corpus work."""
    u = t.events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("fd"), F.max(F.to_date("ts")).alias("ld")
    )
    g = t.events.agg(F.max(F.to_date("ts")).alias("dmax"))
    c = u.crossJoin(F.broadcast(g)).select(
        F.datediff("ld", "fd").alias("d"),
        F.when(F.datediff("dmax", "ld") <= KM_CENSOR_DAYS, F.lit(1))
        .otherwise(F.lit(0))
        .alias("cens"),
    )
    tbl = c.groupBy("d").agg(
        F.sum(F.lit(1) - F.col("cens")).cast("bigint").alias("churned"),
        F.sum("cens").cast("bigint").alias("censored"),
    )
    r = tbl.withColumn(
        "n_at_risk",
        F.sum(F.col("churned") + F.col("censored"))
        .over(Window.orderBy(F.desc("d")))
        .cast("bigint"),
    )
    fx = r.select(
        "d",
        "n_at_risk",
        "churned",
        "censored",
        (
            (F.col("n_at_risk") - F.col("churned")).cast("double")
            / F.col("n_at_risk").cast("double")
        ).alias("factor"),
    )
    a = fx.agg(
        F.array_sort(
            F.collect_list(
                F.struct("d", "n_at_risk", "churned", "censored", "factor")
            )
        ).alias("arr")
    )
    e = a.select("arr", F.posexplode("arr").alias("pos", "s"))
    survival = F.aggregate(
        F.transform(
            F.slice("arr", F.lit(1), F.col("pos") + F.lit(1)), lambda s: s["factor"]
        ),
        F.lit(1.0),
        lambda acc, x: acc * x,
    )
    return e.select(
        F.col("s.d").cast("bigint").alias("duration_days"),
        F.col("s.n_at_risk").alias("n_at_risk"),
        F.col("s.churned").alias("churned"),
        F.col("s.censored").alias("censored"),
        survival.alias("survival"),
    ).orderBy("duration_days")


#: Holt coefficients — both complements written as literals (0.5/0.5,
#: 0.3/0.7), never derived at runtime, per the float-literal discipline.
HOLT_ALPHA, HOLT_BETA = 0.5, 0.3

_HOLT_SQL = (
    "WITH d AS (SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, "
    "CAST(count(*) AS DOUBLE) AS x FROM events GROUP BY event_type, CAST(ts AS DATE)), "
    "s AS (SELECT event_type, list(x ORDER BY day) AS xs, "
    "list(day ORDER BY day) AS days FROM d GROUP BY event_type), "
    "p AS (SELECT event_type, u.i AS i, days[u.i] AS day, xs[u.i] AS x, "
    "list_reduce(list_prepend("
    "[CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)], "
    "list_transform(list_slice(xs, 1, u.i), "
    "v -> [v, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)])), "
    "(acc, e) -> CASE WHEN acc[1] = 0 "
    "THEN [CAST(1 AS DOUBLE), e[1], CAST(0 AS DOUBLE)] "
    "ELSE [acc[1] + 1, 0.5 * e[1] + 0.5 * (acc[2] + acc[3]), "
    "0.3 * ((0.5 * e[1] + 0.5 * (acc[2] + acc[3])) - acc[2]) + 0.7 * acc[3]] "
    "END) AS st "
    "FROM s, LATERAL unnest(range(1, len(xs) + 1)) AS u(i)) "
    "SELECT event_type, day, x, st[2] AS level, st[3] AS trend, "
    "st[2] + st[3] AS forecast_next FROM p ORDER BY event_type, day"
)


@register("events_holt_trend", _HOLT_SQL)
def events_holt_trend(t: Tables) -> DataFrame:
    """Holt double-exponential smoothing of the per-type daily volume
    series — the trend-aware forecaster one rung up from
    events_ewma_daily (EWMA lags any trending series by design; Holt
    carries an explicit trend state, and level+trend IS the one-step
    forecast a capacity monitor alerts against). level_t =
    alpha*x + (1-alpha)*(level+trend); trend_t =
    beta*(level_t - level) + (1-beta)*trend; zero-state init with
    level_1 = x_1.

    The recursion is inherently sequential per series, so — the EWMA
    discipline — it is computed as a per-day PREFIX left fold over the
    day-ordered array, with the new level inlined into the trend update
    so both engines evaluate the identical expression tree: every
    (level, trend, forecast) double is bitwise-oracled. Scale shape:
    the heavy events→daily reduction is map-side-combinable; series
    state is one task per key, length = days, never events."""
    d = t.events.groupBy(
        "event_type", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    s = d.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("dx")
    )
    pe = s.select(
        "event_type",
        F.transform("dx", lambda e: e.getField("x")).alias("xs"),
        F.posexplode("dx").alias("i0", "e"),
    )

    def step(acc, e):
        # 0-based getItem here; the DuckDB twin is 1-based — acc[0]/[1]/[2]
        # are n/level/trend, mirroring acc[1]/[2]/[3] in the SQL.
        v = e[0]
        l_new = F.lit(0.5) * v + F.lit(0.5) * (acc[1] + acc[2])
        return F.when(
            acc[0] == F.lit(0.0),
            F.array(F.lit(1.0), v, F.lit(0.0)),
        ).otherwise(
            F.array(
                acc[0] + F.lit(1.0),
                l_new,
                F.lit(0.3) * (l_new - acc[1]) + F.lit(0.7) * acc[2],
            )
        )

    st = F.aggregate(
        F.transform(
            F.slice("xs", F.lit(1), F.col("i0") + F.lit(1)),
            lambda v: F.array(v, F.lit(0.0), F.lit(0.0)),
        ),
        F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0)),
        step,
    )
    return pe.select(
        "event_type",
        F.col("e.day").alias("day"),
        F.col("e.x").alias("x"),
        st[1].alias("level"),
        st[2].alias("trend"),
        (st[1] + st[2]).alias("forecast_next"),
    ).orderBy("event_type", "day")


#: Audience-overlap envelope: |IE-estimate - exact| <= bound x union.
#: Three stacked lgConfigK=12 sketches compound to ~3x1.6% worst case in
#: theory; measured worst at sf0.1 = 1.13% of union (exact below the
#: sparse-mode threshold at smaller SFs), so 4% holds with 3.5x margin.
OVERLAP_BOUND = 0.04

_OVERLAP_SQL = (
    "WITH ut AS (SELECT DISTINCT event_type, user_id FROM events), "
    "n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut "
    "GROUP BY event_type), "
    "ov AS (SELECT x.event_type AS type_a, y.event_type AS type_b, "
    "CAST(count(*) AS BIGINT) AS exact_overlap FROM ut x "
    "JOIN ut y ON x.user_id = y.user_id AND x.event_type < y.event_type "
    "GROUP BY 1, 2) "
    "SELECT type_a, type_b, na.n AS exact_a, nb.n AS exact_b, exact_overlap, "
    "CAST(exact_overlap * 1000000 // (na.n + nb.n - exact_overlap) AS BIGINT) "
    "AS jaccard_ppm, TRUE AS overlap_ok "
    "FROM ov JOIN n na ON na.event_type = ov.type_a "
    "JOIN n nb ON nb.event_type = ov.type_b ORDER BY type_a, type_b"
)


@register("events_audience_overlap_hll", _OVERLAP_SQL)
def events_audience_overlap_hll(t: Tables) -> DataFrame:
    """Audience overlap between every pair of event types via HLL SET
    ALGEBRA — |A∩B| estimated as est(A) + est(B) − est(A∪B) from three
    sketch reads (datasketches HLL unions losslessly, so the pairwise
    union needs no second data pass), validated against the exact
    intersection and reported with the exact Jaccard in ppm. This is
    the sketch pattern audience/reach systems run at 100 TB: per-segment
    sketches are built ONCE (fixed-size mergeable state, map-side
    partials), then any of the k² pair overlaps is sketch arithmetic on
    k tiny blobs — never k² joins over the fact.

    The estimate itself is engine-specific, so — the agg_approx_distinct
    calibration pattern — the oracle pins the exact sides and the
    envelope verdict: |estimate − exact| ≤ OVERLAP_BOUND × |A∪B|
    (measured worst case 1.13% at sf0.1; the bound is 3.5× that). The
    exact twin reuses one distinct (type, user) shuffle for both the
    per-type counts and the user-keyed intersection join."""
    ut = t.events.select("event_type", "user_id").distinct()
    sk = ut.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    pairs = (
        sk.alias("a")
        .crossJoin(sk.alias("b"))
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.col("a.n").alias("exact_a"),
            F.col("b.n").alias("exact_b"),
            (
                F.hll_sketch_estimate(F.col("a.sk"))
                + F.hll_sketch_estimate(F.col("b.sk"))
                - F.hll_sketch_estimate(F.hll_union(F.col("a.sk"), F.col("b.sk")))
            ).alias("est_overlap"),
        )
    )
    ov = (
        ut.alias("x")
        .join(ut.alias("y"), "user_id")
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    j = pairs.join(ov, ["type_a", "type_b"])
    union = F.col("exact_a") + F.col("exact_b") - F.col("exact_overlap")
    ok = (
        F.abs(F.col("est_overlap") - F.col("exact_overlap"))
        <= F.lit(OVERLAP_BOUND) * union
    )
    return j.select(
        "type_a",
        "type_b",
        "exact_a",
        "exact_b",
        "exact_overlap",
        F.expr(
            "CAST((exact_overlap * 1000000) div "
            "(exact_a + exact_b - exact_overlap) AS BIGINT)"
        ).alias("jaccard_ppm"),
        ok.alias("overlap_ok"),
    ).orderBy("type_a", "type_b")


#: PSI geometry: coarse value bins (width 50 over the ~[0, 500) value
#: range), the same pre/post boundary as CUPED, +1 Laplace smoothing so
#: one-sided bins stay finite, and the industry 0.1 / 0.25 thresholds.
PSI_BIN_WIDTH = 50.0

_PSI_SQL = (
    "WITH b AS (SELECT event_type, "
    f"CAST(floor(value / {PSI_BIN_WIDTH}) AS BIGINT) AS bin, "
    f"CASE WHEN ts < TIMESTAMP '{CUPED_BOUNDARY}' THEN 1 ELSE 0 END AS pre "
    "FROM events), "
    "c AS (SELECT event_type, bin, CAST(sum(pre) AS BIGINT) + 1 AS pc, "
    "CAST(sum(1 - pre) AS BIGINT) + 1 AS qc FROM b GROUP BY event_type, bin), "
    "tt AS (SELECT event_type, CAST(sum(pc) AS BIGINT) AS pt, "
    "CAST(sum(qc) AS BIGINT) AS qt FROM c GROUP BY event_type), "
    "terms AS (SELECT c.event_type, bin, "
    "(CAST(pc AS DOUBLE) / CAST(pt AS DOUBLE) - "
    "CAST(qc AS DOUBLE) / CAST(qt AS DOUBLE)) * "
    "CAST(CAST(ln((CAST(pc AS DOUBLE) / CAST(pt AS DOUBLE)) / "
    "(CAST(qc AS DOUBLE) / CAST(qt AS DOUBLE))) AS DECIMAL(18,9)) AS DOUBLE) "
    "AS term FROM c JOIN tt ON c.event_type = tt.event_type), "
    "agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_bins, "
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), list(term ORDER BY bin)), "
    "(acc, x) -> acc + x) AS psi FROM terms GROUP BY event_type) "
    "SELECT event_type, n_bins, psi, "
    "CASE WHEN psi < 0.1 THEN 'stable' WHEN psi < 0.25 THEN 'moderate' "
    "ELSE 'shifted' END AS verdict FROM agg ORDER BY event_type"
)


@register("dq_distribution_drift_psi", _PSI_SQL)
def dq_distribution_drift_psi(t: Tables) -> DataFrame:
    """Population Stability Index between the first- and second-half
    value distributions per event type — the drift monitor production
    scoring/DQ systems run between a reference window and live traffic
    (PSI < 0.1 stable, < 0.25 moderate, else shifted; the standard
    credit-scoring thresholds). PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i)
    over the shared fixed-width binning, +1 Laplace smoothing so a bin
    observed on only one side contributes a finite term instead of ±∞.

    Determinism: bin counts are one conditional-sum integer aggregate
    (no align join — both periods count in the same group), each term
    is a pinned-shape expression with ln through DECIMAL(18,9), and the
    bin sum is an ordered fold — bitwise-oracled. Scale: stateless bin
    expression, map-side combine to |types|·|bins| rows, everything
    after is tiny."""
    pre = (F.col("ts") < F.lit(CUPED_BOUNDARY).cast("timestamp")).cast("int")
    b = t.events.select(
        "event_type",
        F.floor(F.col("value") / F.lit(PSI_BIN_WIDTH)).cast("bigint").alias("bin"),
        pre.alias("pre"),
    )
    c = b.groupBy("event_type", "bin").agg(
        (F.sum("pre") + F.lit(1)).cast("bigint").alias("pc"),
        (F.sum(F.lit(1) - F.col("pre")) + F.lit(1)).cast("bigint").alias("qc"),
    )
    tt = c.groupBy("event_type").agg(
        F.sum("pc").cast("bigint").alias("pt"),
        F.sum("qc").cast("bigint").alias("qt"),
    )
    pd_ = F.col("pc").cast("double") / F.col("pt").cast("double")
    qd = F.col("qc").cast("double") / F.col("qt").cast("double")
    term = (pd_ - qd) * F.log(pd_ / qd).cast("decimal(18,9)").cast("double")
    terms = c.join(tt, "event_type").select("event_type", "bin", term.alias("term"))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("bin", "term"))),
        lambda s: s.getField("term"),
    )
    agg = terms.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.aggregate(ordered, F.lit(0.0), lambda acc, x: acc + x).alias("psi"),
    )
    verdict = (
        F.when(F.col("psi") < 0.1, "stable")
        .when(F.col("psi") < 0.25, "moderate")
        .otherwise("shifted")
    )
    return agg.select("event_type", "n_bins", "psi", verdict.alias("verdict")).orderBy(
        "event_type"
    )


#: Pinned IEEE shapes for the binary-segmentation gain and means —
#: rendered identically in both engines from exact integer window sums.
_BINSEG_GAIN = (
    "(CAST(sst AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / "
    "CAST(n AS DOUBLE)) - ((CAST(css AS DOUBLE) - CAST(cs AS DOUBLE) * "
    "CAST(cs AS DOUBLE) / CAST(i AS DOUBLE)) + (CAST(sst - css AS DOUBLE) - "
    "CAST(st - cs AS DOUBLE) * CAST(st - cs AS DOUBLE) / CAST(n - i AS DOUBLE)))"
)
_BINSEG_MEANS = (
    "CAST(cs AS DOUBLE) / CAST(i AS DOUBLE)",
    "CAST(st - cs AS DOUBLE) / CAST(n - i AS DOUBLE)",
)

_BINSEG_SQL = (
    "WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, "
    "CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2), "
    "p AS (SELECT event_type, day, "
    "CAST(sum(y) OVER w AS BIGINT) AS cs, "
    "CAST(sum(y * y) OVER w AS BIGINT) AS css, "
    "CAST(row_number() OVER w AS BIGINT) AS i, "
    "CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS st, "
    "CAST(sum(y * y) OVER (PARTITION BY event_type) AS BIGINT) AS sst, "
    "CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n "
    "FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)), "
    f"g AS (SELECT *, {_BINSEG_GAIN} AS gain FROM p WHERE i < n) "
    "SELECT event_type, strftime(day, '%Y-%m-%d') AS split_day, n AS n_days, "
    f"{_BINSEG_MEANS[0]} AS mean_before, {_BINSEG_MEANS[1]} AS mean_after, gain "
    "FROM (SELECT *, row_number() OVER (PARTITION BY event_type "
    "ORDER BY gain DESC, day) AS rn FROM g) WHERE rn = 1 ORDER BY event_type"
)


@register("events_changepoint_binseg", _BINSEG_SQL)
def events_changepoint_binseg(t: Tables) -> DataFrame:
    """Change-point detection on the per-type daily volume series —
    round 1 of binary segmentation (the classic CPD recursion): the
    split that maximizes the SSE reduction of a two-mean fit over a
    one-mean fit, reported with the pre/post level means. The
    monitoring question behind it ('did this series change regime, and
    when?') is what the z-score and MAD keys answer pointwise; this
    answers it structurally.

    Every candidate split is scored from exact integer prefix/total
    window sums (Σy, Σy² cumulative and per-partition — one
    (type, day) shuffle, series-length work after), so the gain is ONE
    pinned-shape double expression per row and the argmax (tie-break
    earliest day) is bitwise-oracled. Full binary segmentation recurses
    on the two halves — each recursion is this same plan on a filtered
    day range, the label-propagation structuring applied to CPD."""
    d = t.events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    w = Window.partitionBy("event_type").orderBy("day")
    wp = Window.partitionBy("event_type")
    p = d.select(
        "event_type",
        "day",
        F.sum("y").over(w).cast("bigint").alias("cs"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("bigint").alias("css"),
        F.row_number().over(w).cast("bigint").alias("i"),
        F.sum("y").over(wp).cast("bigint").alias("st"),
        F.sum(F.col("y") * F.col("y")).over(wp).cast("bigint").alias("sst"),
        F.count(F.lit(1)).over(wp).cast("bigint").alias("n"),
    )
    g = p.filter(F.col("i") < F.col("n")).withColumn("gain", F.expr(_BINSEG_GAIN))
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.desc("gain"), F.asc("day"))
    )
    return (
        g.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("split_day"),
            F.col("n").alias("n_days"),
            F.expr(_BINSEG_MEANS[0]).alias("mean_before"),
            F.expr(_BINSEG_MEANS[1]).alias("mean_after"),
            "gain",
        )
        .orderBy("event_type")
    )


#: Mann-Whitney pinned IEEE shapes: every statistic is one fixed
#: expression over exact integers (doubled average ranks r2_1, counts,
#: the tie-correction sum) — identical text for both engines. sqrt is
#: IEEE-correctly-rounded, hence portable without the DECIMAL pin ln
#: needs.
_MW_U1 = (
    "CAST(r2_1 AS DOUBLE) / 2 - "
    "(CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1)) / 2"
)
_MW_MU = "(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)) / 2"
_MW_SIG = (
    "sqrt((CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12) * "
    "((CAST(n AS DOUBLE) + 1) - "
    "CAST(ties AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))))"
)
_MW_Z = f"(({_MW_U1}) - ({_MW_MU})) / ({_MW_SIG})"

_MW_SQL = (
    "WITH u AS (SELECT user_id % 2 AS variant, "
    "CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(12,2)) AS m "
    "FROM events GROUP BY user_id), "
    "r AS (SELECT variant, m, "
    "rank() OVER (ORDER BY m) AS rmin, "
    "count(*) OVER (PARTITION BY m) AS tc FROM u), "
    "tg AS (SELECT CAST(coalesce(sum(t * t * t - t), 0) AS BIGINT) AS ties "
    "FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM u GROUP BY m)), "
    "s AS (SELECT CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0, "
    "CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1, "
    "CAST(sum(CASE WHEN variant = 1 THEN 2 * rmin + tc - 1 ELSE 0 END) "
    "AS BIGINT) AS r2_1 FROM r) "
    "SELECT n, n0, n1, CAST(r2_1 AS DOUBLE) / 2 AS rank_sum_1, "
    f"{_MW_U1} AS u1, {_MW_MU} AS mu_u, {_MW_SIG} AS sigma_u, {_MW_Z} AS z "
    "FROM s, tg"
)


@register("events_ab_mannwhitney", _MW_SQL)
def events_ab_mannwhitney(t: Tables) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) A/B test on the per-user value
    metric — the nonparametric companion to events_ab_cuped for the
    heavy-tailed metrics (revenue, session length) where a mean test is
    dominated by whales: compares the RANK distribution of variant 1
    vs variant 0 (user-parity assignment, the CUPED convention) with
    midrank tie handling and the tie-corrected normal approximation
    (U1, mu, sigma, z).

    Exactness: per-user metrics are exact DECIMAL(12,2) sums, so rank
    ties are engine-identical; average ranks are carried DOUBLED
    (2*rank_min + tiecount - 1 — integers, no fractional rank ever
    stored), the tie correction Σ(t³−t) is an integer sum, and every
    float statistic is one pinned-shape expression over those integers
    (sqrt is IEEE-correctly-rounded, portable without ln's DECIMAL
    pin). Plan: ONE user_id shuffle collapses events to |users| rows;
    the global metric rank is a window over that collapsed relation
    (users ≪ events — at 100 TB this is the classic range-partitioned
    rank, still never an events-sized sort); everything after is 1-row
    aggregates."""
    u = t.events.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(12,2)"))
        .cast("decimal(12,2)")
        .alias("m")
    )
    u = u.select(F.pmod(F.col("user_id"), F.lit(2)).alias("variant"), "m")
    r = u.select(
        "variant",
        "m",
        F.rank().over(Window.orderBy("m")).alias("rmin"),
        F.count(F.lit(1)).over(Window.partitionBy("m")).alias("tc"),
    )
    tg = (
        u.groupBy("m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.coalesce(
                F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")), F.lit(0)
            )
            .cast("bigint")
            .alias("ties")
        )
    )
    s = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(
            F.when(
                F.col("variant") == 1,
                F.lit(2) * F.col("rmin") + F.col("tc") - F.lit(1),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("r2_1"),
    )
    return s.crossJoin(F.broadcast(tg)).select(
        "n",
        "n0",
        "n1",
        F.expr("CAST(r2_1 AS DOUBLE) / 2").alias("rank_sum_1"),
        F.expr(_MW_U1).alias("u1"),
        F.expr(_MW_MU).alias("mu_u"),
        F.expr(_MW_SIG).alias("sigma_u"),
        F.expr(_MW_Z).alias("z"),
    )


#: Pinned mean / estimator shapes for the 2x2 diff-in-differences cell
#: grid (variant x period): each mean is one exact-decimal-sum / count
#: division; the estimator is one fixed four-mean expression.
_DID_MEAN = "s{c} / CAST(n{c} AS DOUBLE)"
_DID_EST = (
    f"(({_DID_MEAN.format(c='11')}) - ({_DID_MEAN.format(c='10')})) - "
    f"(({_DID_MEAN.format(c='01')}) - ({_DID_MEAN.format(c='00')}))"
)


def _did_sql() -> str:
    d = "CAST(value AS DECIMAL(12,2))"
    zero = "CAST(0 AS DECIMAL(12,2))"
    cells = []
    for v in (0, 1):
        for p in (0, 1):
            pre = f"ts < TIMESTAMP '{CUPED_BOUNDARY}'"
            period = f"NOT ({pre})" if p else pre
            cond = f"user_id % 2 = {v} AND ({period})"
            cells.append(
                f"CAST(CAST(sum(CASE WHEN {cond} THEN {d} ELSE {zero} END) "
                f"AS VARCHAR) AS DOUBLE) AS s{v}{p}, "
                f"CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS n{v}{p}"
            )
    means = ", ".join(
        f"{_DID_MEAN.format(c=f'{v}{p}')} AS mean_{v}{p}"
        for v in (0, 1)
        for p in (0, 1)
    )
    return (
        "WITH s AS (SELECT " + ", ".join(cells) + " FROM events) "
        "SELECT n00, n01, n10, n11, " + means + f", {_DID_EST} AS did FROM s"
    )


@register("events_ab_did", _did_sql())
def events_ab_did(t: Tables) -> DataFrame:
    """Difference-in-differences readout — the quasi-experimental
    estimator for when assignment isn't randomized at the metric's
    grain (rollouts, geo launches): the treatment effect is the change
    in variant 1's mean value across the pre/post boundary MINUS the
    same change in variant 0, so any shared time trend cancels. Uses
    the CUPED conventions (user-parity variant, CUPED_BOUNDARY period
    split); together the three keys (_cuped, _mannwhitney, _did) are
    the A/B readout battery.

    Exactness: the 2x2 cell grid is 8 conditional aggregates in ONE
    pass — exact DECIMAL value sums (VARCHAR-routed to double, the
    profile_correlations discipline) and integer counts; each cell mean
    is one pinned division and the estimator one fixed four-mean
    expression. Plan: a single map-side-combinable scan to a 1-row
    result — nothing shuffles but the 1-row partial merge at any
    event volume."""
    d = F.col("value").cast("decimal(12,2)")
    zero = F.lit(0).cast("decimal(12,2)")
    pre = F.col("ts") < F.lit(CUPED_BOUNDARY).cast("timestamp")
    aggs = []
    for v in (0, 1):
        for p in (0, 1):
            period = ~pre if p else pre
            cond = (F.pmod(F.col("user_id"), F.lit(2)) == v) & period
            aggs.append(
                F.sum(F.when(cond, d).otherwise(zero))
                .cast("double")
                .alias(f"s{v}{p}")
            )
            aggs.append(
                F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(f"n{v}{p}")
            )
    s = t.events.agg(*aggs)
    return s.select(
        "n00",
        "n01",
        "n10",
        "n11",
        *[
            F.expr(_DID_MEAN.format(c=f"{v}{p}")).alias(f"mean_{v}{p}")
            for v in (0, 1)
            for p in (0, 1)
        ],
        F.expr(_DID_EST).alias("did"),
    )


#: Robust outlier rule (Iglewicz–Hoaglin modified z): |0.6745·(x−med)/MAD|
#: above 3.5. Literal constants identical in both engines; the z shape
#: is one pinned expression.
_MAD_Z_OUT = "abs(0.6745 * (value - med) / mad) > 3.5"

_MAD_SQL = (
    "WITH h AS (SELECT event_type, value AS v, CAST(count(*) AS BIGINT) AS c "
    "FROM events GROUP BY event_type, value), "
    "n AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY event_type), "
    "cum AS (SELECT event_type, v, CAST(sum(c) OVER (PARTITION BY event_type "
    "ORDER BY v) AS BIGINT) AS cc FROM h), "
    "med AS (SELECT cum.event_type, min(v) AS med FROM cum JOIN n "
    "ON n.event_type = cum.event_type WHERE 2 * cc >= n GROUP BY cum.event_type), "
    "dh AS (SELECT e.event_type, abs(e.value - m.med) AS av, "
    "CAST(count(*) AS BIGINT) AS c FROM events e JOIN med m "
    "ON m.event_type = e.event_type GROUP BY e.event_type, abs(e.value - m.med)), "
    "dcum AS (SELECT event_type, av, CAST(sum(c) OVER (PARTITION BY event_type "
    "ORDER BY av) AS BIGINT) AS cc FROM dh), "
    "mad AS (SELECT dcum.event_type, min(av) AS mad FROM dcum JOIN n "
    "ON n.event_type = dcum.event_type WHERE 2 * cc >= n GROUP BY dcum.event_type), "
    "o AS (SELECT e.event_type, CAST(sum(CASE WHEN mad > 0 AND "
    f"{_MAD_Z_OUT} THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers "
    "FROM events e JOIN med USING (event_type) JOIN mad USING (event_type) "
    "GROUP BY e.event_type) "
    "SELECT n.event_type, n, med AS median_value, mad, n_outliers, "
    "CAST((n_outliers * 1000000) // n AS BIGINT) AS outlier_ppm "
    "FROM n JOIN med ON med.event_type = n.event_type "
    "JOIN mad ON mad.event_type = n.event_type "
    "JOIN o ON o.event_type = n.event_type ORDER BY n.event_type"
)


@register("events_anomaly_mad", _MAD_SQL)
def events_anomaly_mad(t: Tables) -> DataFrame:
    """Robust outlier scan per event type — median/MAD with the
    Iglewicz–Hoaglin modified z (|0.6745·(x−med)/MAD| > 3.5), the
    monitor that survives the exact heavy tails that poison
    events_anomaly_zscore's mean/stddev (one whale inflates sigma and
    hides every other outlier; the median and MAD don't move).

    Exactness without quantile interpolation: the median is the LOWER
    median by an integer rule — the smallest value whose doubled
    cumulative histogram count reaches n — and MAD applies the same
    rule to |x − med|; both are engine-identical picks of actual data
    values, never an interpolated float (the cross-engine trap in
    percentile functions). The z test is one pinned IEEE expression.

    Plan: value histograms per type (map-side combinable, domain-
    bounded), cumulative windows over those HISTOGRAMS (never the
    events), two broadcast-size median/MAD relations joined back for
    one counting pass — the fact table is scanned twice and sorted
    never. MAD = 0 (a majority-constant type) disables the test for
    that type rather than dividing by zero."""
    # Eager checkpoints: the histogram, median and MAD relations each
    # have multiple consumers — without materialization the plan
    # re-scans events 14 times (measured); with them, 3 scans.
    h = (
        t.events.groupBy("event_type", F.col("value").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    n = (
        h.groupBy("event_type")
        .agg(F.sum("c").cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = h.select("event_type", "v", F.sum("c").over(wcum).cast("bigint").alias("cc"))
    med = (
        cum.join(n, "event_type")
        .filter(F.lit(2) * F.col("cc") >= F.col("n"))
        .groupBy("event_type")
        .agg(F.min("v").alias("med"))
        .localCheckpoint(eager=True)
    )
    dh = (
        t.events.join(F.broadcast(med), "event_type")
        .groupBy("event_type", F.abs(F.col("value") - F.col("med")).alias("av"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wdc = (
        Window.partitionBy("event_type")
        .orderBy("av")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dcum = dh.select(
        "event_type", "av", F.sum("c").over(wdc).cast("bigint").alias("cc")
    )
    mad = (
        dcum.join(n, "event_type")
        .filter(F.lit(2) * F.col("cc") >= F.col("n"))
        .groupBy("event_type")
        .agg(F.min("av").alias("mad"))
        .localCheckpoint(eager=True)
    )
    o = (
        t.events.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when((F.col("mad") > 0) & F.expr(_MAD_Z_OUT), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
    )
    return (
        n.join(med, "event_type")
        .join(mad, "event_type")
        .join(o, "event_type")
        .select(
            "event_type",
            "n",
            F.col("med").alias("median_value"),
            "mad",
            "n_outliers",
            F.expr("CAST((n_outliers * 1000000) div n AS BIGINT)").alias(
                "outlier_ppm"
            ),
        )
        .orderBy("event_type")
    )


#: Touch events eligible to receive purchase attribution.
_TOUCH_TYPES = ("click", "view")

_ATTR_SQL = (
    "WITH s AS (SELECT event_id, user_id, ts, event_type, value, "
    "max(CASE WHEN event_type IN ('click', 'view') THEN ts END) OVER w AS touch_ts, "
    "last_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END "
    "IGNORE NULLS) OVER w AS touch_type "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), "
    "p AS (SELECT touch_type, value, "
    "CAST(date_diff('second', touch_ts, ts) AS BIGINT) AS delay_sec "
    "FROM s WHERE event_type = 'purchase' AND touch_type IS NOT NULL) "
    "SELECT touch_type, CAST(count(*) AS BIGINT) AS n_purchases, "
    "CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) "
    "AS attributed_value, "
    "CAST(sum(delay_sec) AS BIGINT) AS total_delay_sec, "
    "CAST(sum(delay_sec) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_delay_sec "
    "FROM p GROUP BY touch_type ORDER BY touch_type"
)


@register("events_attribution_last_touch", _ATTR_SQL)
def events_attribution_last_touch(t: Tables) -> DataFrame:
    """LAST-TOUCH revenue attribution — every purchase's value credited
    to the user's most recent preceding engagement event (click/view),
    the default model every marketing-analytics stack reports first.
    Reuses the as-of machinery as an AGGREGATED readout: per touch
    type, purchases attributed, exact-decimal revenue, and the mean
    touch→purchase latency (the conversion-lag statistic).

    Plan: ONE (user) partition-sorted window carries both the touch
    timestamp (running conditional max) and the touch type (running
    ignore-nulls last of a conditional) — no join, no range scan; then
    one tiny groupBy over purchases. Exactness: value sums are
    associative DECIMAL (VARCHAR-routed in the oracle), delays are
    integer seconds, the mean is one pinned division."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_touch = F.col("event_type").isin(*_TOUCH_TYPES)
    s = t.events.select(
        "event_type",
        "value",
        "ts",
        F.max(F.when(is_touch, F.col("ts"))).over(w).alias("touch_ts"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    )
    p = s.filter(
        (F.col("event_type") == "purchase") & F.col("touch_type").isNotNull()
    ).select(
        "touch_type",
        "value",
        (F.unix_timestamp("ts") - F.unix_timestamp("touch_ts")).alias("delay_sec"),
    )
    return (
        p.groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("attributed_value"),
            F.sum("delay_sec").cast("bigint").alias("total_delay_sec"),
            (
                F.sum("delay_sec").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_delay_sec"),
        )
        .orderBy("touch_type")
    )


_GROWTH_SQL = (
    "WITH ad AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events), "
    "dmax AS (SELECT max(d) AS dm FROM ad), "
    "lagd AS (SELECT user_id, d, "
    "lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev, "
    "lead(d) OVER (PARTITION BY user_id ORDER BY d) AS nxt FROM ad), "
    "stages AS (SELECT d, "
    "CASE WHEN prev IS NULL THEN 'new' "
    "WHEN prev = d - 1 THEN 'retained' ELSE 'resurrected' END AS stage "
    "FROM lagd), "
    "churns AS (SELECT d + 1 AS d, 'churned' AS stage FROM lagd, dmax "
    "WHERE (nxt IS NULL AND d < dm) OR (nxt IS NOT NULL AND nxt > d + 1)), "
    "u AS (SELECT * FROM stages UNION ALL SELECT * FROM churns) "
    "SELECT strftime(d, '%Y-%m-%d') AS day, "
    "CAST(sum(CASE WHEN stage = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new, "
    "CAST(sum(CASE WHEN stage = 'retained' THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_retained, "
    "CAST(sum(CASE WHEN stage = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_resurrected, "
    "CAST(sum(CASE WHEN stage = 'churned' THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_churned, "
    "CAST(sum(CASE WHEN stage = 'new' THEN 1 WHEN stage = 'resurrected' THEN 1 "
    "WHEN stage = 'churned' THEN -1 ELSE 0 END) AS BIGINT) AS net_change "
    "FROM u GROUP BY d ORDER BY day"
)


@register("events_growth_accounting", _GROWTH_SQL)
def events_growth_accounting(t: Tables) -> DataFrame:
    """GROWTH ACCOUNTING (the new / retained / resurrected / churned
    daily ledger — the identity every DAU/MAU dashboard decomposes
    into): a user is `new` on their first active day, `retained` when
    active the day after an active day, `resurrected` when returning
    across a gap, and `churned` on the day AFTER their activity stops
    (mid-series gaps and the final drop-off both count; the observation
    edge is not churn). net_change = new + resurrected − churned is the
    day-over-day change in the active base — the ledger balances by
    construction.

    Plan: events collapse to DISTINCT (user, day) once (map-side
    combinable), ONE user-partitioned window provides both lag and
    lead, and the ledger is a conditional-sum groupBy over that
    user-days relation — no self-joins, no spine build; integers end
    to end."""
    ad = t.events.select("user_id", F.to_date("ts").alias("d")).distinct()
    dmax = ad.agg(F.max("d").alias("dm"))
    w = Window.partitionBy("user_id").orderBy("d")
    lagd = ad.select(
        "user_id",
        "d",
        F.lag("d").over(w).alias("prev"),
        F.lead("d").over(w).alias("nxt"),
    )
    stages = lagd.select(
        "d",
        F.when(F.col("prev").isNull(), F.lit("new"))
        .when(F.col("prev") == F.date_sub(F.col("d"), 1), F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("stage"),
    )
    churns = (
        lagd.crossJoin(F.broadcast(dmax))
        .filter(
            (F.col("nxt").isNull() & (F.col("d") < F.col("dm")))
            | (F.col("nxt").isNotNull() & (F.col("nxt") > F.date_add(F.col("d"), 1)))
        )
        .select(F.date_add(F.col("d"), 1).alias("d"), F.lit("churned").alias("stage"))
    )
    u = stages.unionByName(churns)
    cnt = lambda s: F.sum(F.when(F.col("stage") == s, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return (
        u.groupBy("d")
        .agg(
            cnt("new").alias("n_new"),
            cnt("retained").alias("n_retained"),
            cnt("resurrected").alias("n_resurrected"),
            cnt("churned").alias("n_churned"),
            F.sum(
                F.when(F.col("stage") == "new", 1)
                .when(F.col("stage") == "resurrected", 1)
                .when(F.col("stage") == "churned", -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("net_change"),
        )
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"), "n_new",
                "n_retained", "n_resurrected", "n_churned", "net_change")
        .orderBy("day")
    )


#: Quantile picks for the conversion-lag distribution (percent points,
#: lower-quantile integer rule — engine-identical data values).
_LAG_PCTS = (25, 50, 75, 90)

_LAG_SQL = (
    "WITH su AS (SELECT user_id, min(ts) AS signup_ts FROM events "
    "WHERE event_type = 'signup' GROUP BY user_id), "
    "lag_ AS (SELECT CAST(date_diff('second', su.signup_ts, e.ts) AS BIGINT) "
    "AS lag_sec FROM events e JOIN su ON su.user_id = e.user_id "
    "WHERE e.event_type = 'purchase' AND e.ts >= su.signup_ts), "
    "h AS (SELECT lag_sec, CAST(count(*) AS BIGINT) AS c FROM lag_ "
    "GROUP BY lag_sec), "
    "n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h), "
    "cum AS (SELECT lag_sec, CAST(sum(c) OVER (ORDER BY lag_sec) AS BIGINT) "
    "AS cc FROM h) "
    "SELECT n.n, "
    + ", ".join(
        f"(SELECT min(lag_sec) FROM cum, n WHERE 100 * cc >= {p} * n) AS p{p}_sec"
        for p in _LAG_PCTS
    )
    + ", (SELECT max(lag_sec) FROM lag_) AS max_sec FROM n"
)


@register("events_conversion_lag_quantiles", _LAG_SQL)
def events_conversion_lag_quantiles(t: Tables) -> DataFrame:
    """Signup→purchase CONVERSION-LAG distribution — the activation
    statistic growth teams read next to the funnel: p25/p50/p75/p90 and
    max of the seconds between a user's first signup and each
    subsequent purchase. Quantiles use the LOWER-quantile integer rule
    (smallest lag whose scaled cumulative histogram count reaches the
    percent point) — engine-identical picks of actual data values, the
    events_anomaly_mad discipline, never an interpolated float.

    Plan: one per-user min (map-side combinable), one broadcastable
    signup join, then cumulative windows over the LAG HISTOGRAM (never
    the events); the quantile picks are 1-row aggregates."""
    su = t.events.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("signup_ts")
    )
    lag = (
        t.events.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .select(
            (F.unix_timestamp("ts") - F.unix_timestamp("signup_ts")).alias("lag_sec")
        )
    )
    h = (
        lag.groupBy("lag_sec")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)  # histogram feeds n + cum + picks
    )
    n = h.agg(F.sum("c").cast("bigint").alias("n"))
    w = Window.orderBy("lag_sec").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = h.select("lag_sec", F.sum("c").over(w).cast("bigint").alias("cc"))
    out = n
    for p in _LAG_PCTS:
        pick = (
            cum.crossJoin(F.broadcast(n.select(F.col("n").alias("_n"))))
            .filter(F.lit(100) * F.col("cc") >= F.lit(p) * F.col("_n"))
            .agg(F.min("lag_sec").alias(f"p{p}_sec"))
        )
        out = out.crossJoin(F.broadcast(pick))
    mx = h.agg(F.max("lag_sec").alias("max_sec"))
    return out.crossJoin(F.broadcast(mx)).select(
        "n", *[f"p{p}_sec" for p in _LAG_PCTS], "max_sec"
    )


_CONV_KM_SQL = """
WITH su AS (SELECT user_id, min(CAST(ts AS DATE)) AS s FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
pu AS (SELECT su.user_id, min(CAST(e.ts AS DATE)) AS p
  FROM su JOIN events e ON e.user_id = su.user_id
  AND e.event_type = 'purchase' AND CAST(e.ts AS DATE) >= su.s
  GROUP BY su.user_id),
mx AS (SELECT max(CAST(ts AS DATE)) AS m FROM events),
d AS (SELECT CASE WHEN p IS NULL THEN CAST(datediff('day', s, m) AS BIGINT)
    ELSE CAST(datediff('day', s, p) AS BIGINT) END AS dur,
  (p IS NULL) AS censored
  FROM su LEFT JOIN pu USING (user_id), mx),
ev AS (SELECT dur AS t, CAST(count(*) FILTER (NOT censored) AS BIGINT) AS d_events
  FROM d GROUP BY dur HAVING count(*) FILTER (NOT censored) > 0),
rk AS (SELECT ev.t, ev.d_events,
  (SELECT CAST(count(*) AS BIGINT) FROM d WHERE d.dur >= ev.t) AS n_risk FROM ev),
arr AS (SELECT list([t, n_risk, d_events] ORDER BY t) AS steps FROM rk)
SELECT CAST(s.t AS BIGINT) AS t, s.n_risk, s.d_events,
  list_reduce(
    list_prepend([CAST(1000000 AS BIGINT), 0, 0],
                 list_slice(steps, 1, s.i)),
    (acc, x) -> [acc[1] * (x[2] - x[3]) // x[2], CAST(0 AS BIGINT), CAST(0 AS BIGINT)]
  )[1] AS remaining_ppm
FROM arr, LATERAL (SELECT u.i, steps[u.i][1] AS t, steps[u.i][2] AS n_risk,
  steps[u.i][3] AS d_events
  FROM unnest(range(1, len(steps) + 1)) AS u(i)) s
ORDER BY t
""".strip()


@register("events_conversion_km", _CONV_KM_SQL)
def events_conversion_km(t: Tables) -> DataFrame:
    """KAPLAN-MEIER over signup -> purchase CONVERSION time -- the
    censoring-correct companion to events_conversion_lag_quantiles
    (which reads only CONVERTED users and so overstates conversion
    speed): duration = days from a user's first signup to their first
    at-or-after-signup purchase; users who never purchase are CENSORED
    at the observation edge (they inform every risk set they survived
    through but are never events -- at the fixture, 84 conversions /
    66 censored, so the censoring branch carries real weight, unlike a
    lifetime-churn framing where synthetic uniform activity censors
    everyone). remaining_ppm = S(t), the KM probability of still being
    unconverted after t days, multiplied down by an ALL-INTEGER ppm
    floor rule -- identical rounding in both engines, so the survival
    curve itself is bitwise-oracled (the sibling users_survival_km uses
    the ordered float fold; this key shows the integer alternative).
    DuckDB folds with the fixed-width-list accumulator trick (NOTES.md:
    list_reduce pins the accumulator type to the element type).

    Scale shape: two map-side-combinable per-user min-aggs and one
    per-user join over event volume; everything after runs on the
    |distinct durations|-sized step relation (bounded by the window in
    DAYS), and the O(steps^2) slice-folds happen on one row's array.
    The global max-day is a 1-row broadcast."""
    ev = t.events.select("user_id", "event_type", F.to_date("ts").alias("d"))
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("d").alias("s"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("d") >= F.col("s"))
        .groupBy("user_id")
        .agg(F.min("d").alias("p"))
    )
    mx = ev.agg(F.max("d").alias("m"))
    d = (
        su.join(pu, "user_id", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(F.col("p").isNull(), F.datediff("m", "s"))
            .otherwise(F.datediff("p", "s"))
            .cast("bigint")
            .alias("dur"),
            F.col("p").isNull().alias("censored"),
        )
        .localCheckpoint(eager=True)  # read by ev AND every n_risk count
    )
    evt = (
        d.filter(~F.col("censored"))
        .groupBy(F.col("dur").alias("t"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("d_events"))
    )
    rk = (
        F.broadcast(evt)
        .join(d.select("dur"), F.col("dur") >= F.col("t"))
        .groupBy("t", "d_events")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_risk"))
    )
    arr = rk.agg(
        F.array_sort(F.collect_list(F.struct("t", "n_risk", "d_events"))).alias(
            "steps"
        )
    )
    exploded = arr.select(
        F.posexplode("steps").alias("i0", "s"), F.col("steps")
    ).select(
        (F.col("i0") + 1).alias("i"),
        F.col("s.t").alias("t"),
        F.col("s.n_risk").alias("n_risk"),
        F.col("s.d_events").alias("d_events"),
        "steps",
    )
    # aggregate() via expr for the exact `div` semantics (Python / on
    # Columns is double division).
    surv = F.expr(
        "aggregate(slice(steps, 1, i), CAST(1000000 AS BIGINT), "
        "(acc, x) -> CAST((acc * (x.n_risk - x.d_events)) div x.n_risk AS BIGINT))"
    )
    return exploded.select(
        "t", "n_risk", "d_events", surv.alias("remaining_ppm")
    ).orderBy("t")
