"""Table-maintenance jobs: small-file compaction and layout stats.

The operational half of running parquet tables at scale. Streaming
sinks (foreachBatch appends, per-trigger commits) and fine-grained
partitioned writes accumulate thousands of tiny files; every downstream
scan then pays per-file open cost and the scheduler pays per-split
overhead — the classic "small files problem". A 100 TB deployment runs
compaction as a scheduled job (what Delta/Iceberg call OPTIMIZE /
rewrite_data_files); over plain parquet directories the same job is a
read → repartition-to-target-size → staged-swap rewrite, below.

The swap reuses the crash-safe rename protocol of the streaming sinks
(write to `<path>__new`, retire the old dir to an epoch-named backup,
rename into place) so a killed compaction never loses the table.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


def dir_stats(path: str) -> dict:
    """File-layout stats for one table directory: data-file count, total
    bytes, min/max/mean file size. Driver-side os.walk — metadata only,
    never reads data (at real scale this is a listing job; the numbers
    drive the compact/don't-compact decision)."""
    sizes = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith((".parquet", ".orc")) and not f.startswith(("_", ".")):
                sizes.append(os.path.getsize(os.path.join(root, f)))
    if not sizes:
        return {"n_files": 0, "total_bytes": 0, "min_bytes": 0, "max_bytes": 0, "mean_bytes": 0.0}
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes),
        "max_bytes": max(sizes),
        "mean_bytes": sum(sizes) / len(sizes),
    }


def plan_target_files(total_bytes: int, target_file_bytes: int) -> int:
    """ceil(total/target), minimum 1 — how many output files compaction
    should produce."""
    if total_bytes <= 0:
        return 1
    return max(1, -(-total_bytes // target_file_bytes))


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite a parquet directory into ~target-size files, atomically.

    Reads the current table, coalesces to ``plan_target_files`` outputs
    (coalesce, not repartition: compaction must not shuffle — it only
    concatenates co-located row groups; a 100 TB job runs this
    per-partition-directory so each rewrite is partition-local), writes
    to a staging dir, then swaps: current → ``<path>__old_<epoch_ns>``,
    staging → current. Returns {before, after} dir_stats.

    Crash safety: every rename step leaves either the old or the new
    complete directory at ``path``; a leftover ``__new`` staging dir is
    ignored by readers and overwritten by the next run.
    """
    before = dir_stats(path)
    n_out = plan_target_files(before["total_bytes"], target_file_bytes)
    staging = f"{path.rstrip('/')}__new"
    df: DataFrame = spark.read.parquet(path)
    df.coalesce(n_out).write.mode("overwrite").parquet(staging)
    backup = f"{path.rstrip('/')}__old_{time.time_ns()}"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup, ignore_errors=True)
    return {"before": before, "after": dir_stats(path)}
