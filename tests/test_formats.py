"""Format adapters: CSV/JSONL round-trips, partitioned parquet with a
plan-level partition-pruning proof."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtimevotingdataengineer_spark.plans import formatted_plan
from realtimevotingdataengineer_spark.sources import formats
from realtimevotingdataengineer_spark.sources.tables import Tables


@pytest.fixture(scope="module")
def t(spark, sf_dir):
    return Tables(spark, sf_dir)


def test_csv_roundtrip(spark, t, tmp_path):
    src = t.nation
    formats.write_csv(src, str(tmp_path / "nation_csv"))
    back = formats.read_csv(
        spark, str(tmp_path / "nation_csv"), "n_nationkey int, n_name string, n_regionkey int"
    )
    assert sorted(back.collect()) == sorted(src.collect())


def test_jsonl_roundtrip(spark, t, tmp_path):
    src = t.customer
    formats.write_jsonl(src, str(tmp_path / "cust_json"))
    back = formats.read_jsonl(
        spark,
        str(tmp_path / "cust_json"),
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    assert back.count() == src.count()
    a = {r.c_custkey: r.c_acctbal for r in back.collect()}
    b = {r.c_custkey: r.c_acctbal for r in src.collect()}
    assert a == b


def test_partitioned_write_prunes(spark, t, tmp_path):
    """A date predicate over the partitioned layout must prune at the
    source (PartitionFilters), not post-filter."""
    formats.to_parquet_partitioned(t.events, str(tmp_path / "events_by_day"))
    back = spark.read.parquet(str(tmp_path / "events_by_day"))
    one_day = back.filter(F.col("event_date") == "2024-01-05")
    plan = formatted_plan(one_day)
    assert "PartitionFilters" in plan and "event_date" in plan.split("PartitionFilters", 1)[1][:200]
    # row parity with the unpartitioned filter
    want = t.events.filter(F.to_date("ts") == "2024-01-05").count()
    assert one_day.count() == want > 0


def test_orc_round_trip_with_pushdown(spark, t):
    """ORC round-trip preserves the relation, and predicates push into
    the ORC scan just like parquet."""
    import tempfile

    from realtimevotingdataengineer_spark.plans import has_pushed_filter
    from realtimevotingdataengineer_spark.sources import formats

    with tempfile.TemporaryDirectory() as d:
        src = t.supplier
        formats.write_orc(src, d)
        back = formats.read_orc(spark, d)
        assert back.count() == src.count()
        assert {tuple(r) for r in back.collect()} == {tuple(r) for r in src.collect()}
        filtered = back.filter(back["s_suppkey"] > 10).select("s_suppkey")
        assert has_pushed_filter(filtered, "s_suppkey")


def test_compaction_preserves_rows_and_reduces_files(spark, sf_dir, tmp_path):
    """compact_parquet_dir must be value-neutral (same rows before and
    after, any order) while collapsing a many-small-file layout into
    the planned file count."""
    from pyspark.sql import functions as F

    from realtimevotingdataengineer_spark.sources.maintenance import (
        compact_parquet_dir,
        dir_stats,
        plan_target_files,
    )
    from realtimevotingdataengineer_spark.sources.tables import load_table

    path = str(tmp_path / "frag")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(37).write.parquet(path)  # fragment: 37 tiny files
    assert dir_stats(path)["n_files"] == 37
    before_rows = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(path).collect()
    )

    stats = compact_parquet_dir(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert stats["after"]["n_files"] < 37
    assert stats["after"]["n_files"] == plan_target_files(
        stats["before"]["total_bytes"], 10 * 1024 * 1024
    )
    after_rows = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(path).collect()
    )
    assert after_rows == before_rows
    # no staging/backup litter
    import os

    parent = os.path.dirname(path)
    assert [d for d in os.listdir(parent) if "__old" in d or d.endswith("__new")] == []


def test_compaction_plan_sizing():
    from realtimevotingdataengineer_spark.sources.maintenance import (
        plan_target_files,
    )

    assert plan_target_files(0, 128) == 1
    assert plan_target_files(1, 128) == 1
    assert plan_target_files(128, 128) == 1
    assert plan_target_files(129, 128) == 2
    assert plan_target_files(1280, 128) == 10
