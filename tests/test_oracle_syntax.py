"""Fast oracle-health guard: every registered DuckDB oracle must parse
and plan (EXPLAIN) against the sf0.001 views — no Spark session needed.

The full execution sweep (tools/check_oracle.py) proves value equality;
this test exists because the driver samples ~50 of the keys per round,
so a SQL typo introduced into a rarely-sampled oracle could otherwise
sit unnoticed until a sweep. EXPLAIN exercises binding, name
resolution, and type checking in milliseconds per key."""

from __future__ import annotations

import duckdb
import pytest

import realtimevotingdataengineer_spark.operators  # noqa: F401
from realtimevotingdataengineer_spark.registry import ORACLES

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_every_oracle_explains(con):
    bad = {}
    for key, sql in sorted(ORACLES.items()):
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad[key] = f"{type(e).__name__}: {str(e)[:160]}"
    assert not bad, bad


def test_every_oracle_is_a_string(con):
    # a stray trailing comma turns a registered oracle into a tuple and
    # the driver's comparison then throws instead of comparing (caught
    # live in round 5 with graph_link_prediction)
    non_str = {k: type(v).__name__ for k, v in ORACLES.items() if not isinstance(v, str)}
    assert not non_str, non_str


def test_fixture_substituted_oracles_match_pristine(con, tmp_path):
    """Round-11 fixture layer (registry.ORACLE_FIXTURE_BLOCKS): for
    every consumer oracle, the fixture-substituted SQL must produce the
    IDENTICAL result frame as the pristine self-contained SQL at
    sf0.001 — the substitution is a pure caching rewrite, never a
    semantic one. Also pins that each block text actually occurs in at
    least one registered oracle (a drifting chain definition would
    silently orphan the fixture)."""
    from realtimevotingdataengineer_spark.registry import (
        ORACLE_FIXTURE_BLOCKS,
    )

    assert ORACLE_FIXTURE_BLOCKS
    for grp in ORACLE_FIXTURE_BLOCKS:
        fx = str(tmp_path / grp["name"])
        import os

        os.makedirs(fx, exist_ok=True)
        for member, sql in grp["members"].items():
            con.execute(f"COPY ({sql}) TO '{fx}/{member}.parquet' (FORMAT PARQUET)")
        consumers = [k for k, v in ORACLES.items() if grp["block"] in v]
        assert consumers, grp["name"]
        for key in consumers:
            pristine = con.execute(ORACLES[key]).fetch_df()
            subbed = con.execute(
                ORACLES[key].replace(
                    grp["block"], grp["replacement"].replace("{fx}", fx)
                )
            ).fetch_df()
            assert list(pristine.columns) == list(subbed.columns), key
            pa = pristine.sort_values(list(pristine.columns), kind="mergesort")
            pb = subbed.sort_values(list(subbed.columns), kind="mergesort")
            assert pa.reset_index(drop=True).equals(pb.reset_index(drop=True)), key
