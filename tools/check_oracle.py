"""Local driver-sim: run every queries() entry against its DuckDB oracle.

Usage: python tools/check_oracle.py [sf_dir] [key ...]

Mimics the driver's comparison: row count, schema arity, and an
order-insensitive value comparison (columns sorted by name, rows sorted).
Exact equality for every cell (the engine is designed so even doubles
match bitwise).
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
ONLY = [a for a in sys.argv[1:] if "/" not in a]

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_run(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
        except Exception:
            pass  # table views are only needed by oracles that read them
    return con.execute(sql).fetch_df()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(name, spark_df, sql) -> str:
    import pandas as pd

    sp = spark_df.toPandas()
    du = duck_run(sql)
    sp = sp.reindex(sorted(sp.columns), axis=1)
    du = du.reindex(sorted(du.columns), axis=1)
    if list(sp.columns) != list(du.columns):
        return f"SCHEMA cols spark={list(sp.columns)} duck={list(du.columns)}"
    if len(sp) != len(du):
        return f"ROWS spark={len(sp)} duck={len(du)}"
    # dtype-class strictness: the driver's hash distinguishes int64 from
    # float64 (DuckDB HUGEINT sums surface as float64 — the round-2
    # corpus_domain_stats / events_error_rate_daily failures), so flag
    # int-vs-float divergence even when values compare equal in Python.
    def dtype_class(dt) -> str:
        s = str(dt)
        if s.startswith(("int", "uint", "Int", "UInt")):
            return "int"
        if s.startswith(("float", "Float")):
            return "float"
        return "other"

    for c in sp.columns:
        a, b = dtype_class(sp[c].dtype), dtype_class(du[c].dtype)
        if {a, b} == {"int", "float"}:
            return f"DTYPE col={c}: spark={sp[c].dtype} duck={du[c].dtype}"
    # normalize timestamps to pandas datetime64[us]; make list cells
    # hashable/sortable (array-typed outputs)
    for df in (sp, du):
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime64"):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            elif df[c].map(lambda v: isinstance(v, (list, tuple))
                           or type(v).__name__ == "ndarray").any():
                df[c] = df[c].map(lambda v: tuple(v) if v is not None else None)
    key = list(sp.columns)
    sp_s = sp.sort_values(key, kind="mergesort").reset_index(drop=True)
    du_s = du.sort_values(key, kind="mergesort").reset_index(drop=True)
    for c in sp.columns:
        a, b = sp_s[c], du_s[c]
        for i, (x, y) in enumerate(zip(a, b)):
            x, y = norm_cell(x), norm_cell(y)
            if x != y and not (x is None and y is None):
                return f"VALUE col={c} row={i}: spark={x!r} duck={y!r}"
    return "OK"


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-oracle")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    oracles = e.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            if name in oracles:
                res = compare(name, df, oracles[name])
            else:
                res = f"rows-only ({df.count()} rows)"
        except Exception as ex:
            res = f"ERROR {type(ex).__name__}: {str(ex)[:300]}"
        dt = time.time() - t0
        status = "PASS" if res == "OK" or res.startswith("rows-only") else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"[{status}] {name:28s} {dt:6.1f}s  {res}")
    print(f"\n{fails} failures")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
