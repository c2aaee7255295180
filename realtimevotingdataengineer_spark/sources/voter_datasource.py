"""The reference's HTTP record source as a first-class Spark DataSource.

The reference seeds voters by calling randomuser.me once per record in a
Python loop (src_http_generator, main.py:92,205-210) — a single-threaded
side-effecting source. Here the same record shape is a registered Python
DataSource (PySpark 4 `pyspark.sql.datasource` API): `spark.read
.format("voters").option("n", 1000)` plans a PARTITIONED scan whose
splits generate rows deterministically in parallel on executors.

Determinism: record i is a pure function of (seed, i) via md5 — the same
1000 voters on any partition count or cluster size (the reference's
`random.seed(21)` intent, main.py:12, made partition-stable). In
production this class is where per-partition HTTP/API pagination would
live; the planner contract (partitions → independent reads) is exactly
how a real paginated-API source scales.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

VOTER_READER_SCHEMA = (
    "voter_id string, voter_name string, gender string, "
    "registered_age int, address_state string"
)

_FIRST = ("Alex", "Sam", "Jordan", "Casey", "Riley", "Morgan", "Quinn", "Avery")
_LAST = ("Smith", "Jones", "Lee", "Garcia", "Chen", "Patel", "Kim", "Okafor")
_STATES = ("State_A", "State_B", "State_C", "State_D", "State_E")


def _voter_row(seed: int, i: int) -> tuple:
    """Pure function (seed, i) → voter record; md5 supplies the
    'randomness' so rows are identical on any executor layout."""
    h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
    b = bytes.fromhex(h)
    name = f"{_FIRST[b[0] % len(_FIRST)]} {_LAST[b[1] % len(_LAST)]}"
    gender = "female" if b[2] % 2 == 0 else "male"
    age = 18 + b[3] % 70
    state = _STATES[b[4] % len(_STATES)]
    return (f"voter-{i:06d}", name, gender, age, state)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class VoterReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.seed = int(options.get("seed", 21))  # main.py:12
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self):
        if self.n <= 0:
            # n=0 would make step 0 and range(0, 0, 0) raise; an empty
            # scan is one empty partition, not an error
            return [_Range(0, 0)]
        step = -(-self.n // self.num_partitions)
        return [
            _Range(lo, min(lo + step, self.n)) for lo in range(0, self.n, step)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _voter_row(self.seed, i)


class VoterStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: the reference's continuous voter production
    (main.py:205-227 produced one voter at a time to Kafka) as a custom
    micro-batch stream source. The offset is simply the next record
    index — replayable (readBetweenOffsets regenerates any committed
    range exactly, since records are pure functions of (seed, i)), so
    checkpoint recovery gets the same rows a failed batch saw."""

    def __init__(self, options: dict):
        self.seed = int(options.get("seed", 21))
        self.per_batch = int(options.get("rowsPerBatch", 100))
        self.limit = int(options.get("n", 1_000_000))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = start["i"]
        hi = min(lo + self.per_batch, self.limit)
        return (iter([_voter_row(self.seed, i) for i in range(lo, hi)]), {"i": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_voter_row(self.seed, i) for i in range(start["i"], end["i"])])


class VoterDataSource(DataSource):
    """`spark.read.format("voters")` / `spark.readStream.format("voters")`
    after `register_voter_source`."""

    @classmethod
    def name(cls) -> str:
        return "voters"

    def schema(self) -> StructType | str:
        return VOTER_READER_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return VoterReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return VoterStreamReader(self.options)


def register_voter_source(spark) -> None:
    spark.dataSource.register(VoterDataSource)
