"""Small-files compaction: plan + execute merges of undersized parquet
files into target-sized bins — the housekeeping a 100 TB table needs
continuously (streaming sinks, per-batch commits and fine-grained
partitions all mint small files; every one costs a task, a footer read
and an object-store request per downstream scan).

The PLANNER is deterministic first-fit-decreasing bin packing (Johnson
1973; FFD uses ≤ 11/9·OPT + 1 bins) over the table's file listing — a
CONTROL-PLANE relation (even a 100 TB table lists only ~10⁵–10⁶ files,
and only the undersized ones enter the pack), so the sequential FFD
walk runs on the driver over (path, size) pairs, never over data. The
EXECUTOR is plain Spark: each bin's files are read as one DataFrame and
rewritten as a single file via coalesce(1) — bins are independent, so
the rewrite parallelism is the bin count; files already at target are
never rewritten (rewrite amplification stays bounded by the small-file
fraction).

Output-commit discipline: bins write to a temp dir and move into place
per-bin, so a crashed compaction leaves the ORIGINAL files intact
(deletes happen last, per bin, after the new file exists). On object
stores pair this with the versioned-table commit log (versioned.py) —
a rename is not atomic there; the caveat documented at
versioned.py applies verbatim.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def plan_compaction(
    files: list,
    target_bytes: int,
    small_fraction: float = 0.5,
) -> list:
    """Pack undersized files into bins of ≤ ``target_bytes`` by
    first-fit-decreasing. ``files`` is a list of (path, size_bytes);
    only files smaller than ``small_fraction·target_bytes`` are
    compaction candidates (a file at ≥ half target gains little and
    costs a full rewrite). Oversized candidates (> target on their
    own) are impossible by construction. Returns a list of bins, each
    a dict {"paths": [...], "bytes": N}; singleton bins are dropped
    (rewriting one small file into one small file is pure churn).
    Deterministic: ties in size break by path, so the same listing
    always yields the same plan.
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    if not 0.0 < small_fraction <= 1.0:
        raise ValueError(f"small_fraction must be in (0, 1], got {small_fraction}")
    cutoff = small_fraction * target_bytes
    cands = sorted(
        [(p, s) for p, s in files if s < cutoff],
        key=lambda ps: (-ps[1], ps[0]),
    )
    bins: list = []
    for path, size in cands:
        for b in bins:
            if b["bytes"] + size <= target_bytes:
                b["paths"].append(path)
                b["bytes"] += size
                break
        else:
            bins.append({"paths": [path], "bytes": size})
    return [b for b in bins if len(b["paths"]) > 1]


def list_parquet_files(spark: SparkSession, table_dir: str) -> list:
    """(path, size) listing of a parquet table directory via the local
    filesystem — control-plane metadata, no data read. For HDFS/S3
    paths, swap in the JVM FileSystem listing (the versioned.py
    Hadoop-FS adapter shows the pattern)."""
    out = []
    for name in sorted(os.listdir(table_dir)):
        if name.endswith(".parquet") and not name.startswith((".", "_")):
            p = os.path.join(table_dir, name)
            out.append((p, os.path.getsize(p)))
    return out


def compact_table(
    spark: SparkSession,
    table_dir: str,
    target_bytes: int,
    small_fraction: float = 0.5,
) -> dict:
    """Plan + execute compaction of ``table_dir`` in place. Each bin is
    read with an explicit file list and rewritten as ONE file into the
    table directory (write-new-then-delete-old, per bin — a crash
    leaves originals in place; at worst one bin is duplicated, which a
    row-level dedup or the versioned-table commit protocol absorbs).
    Returns {"bins": n, "files_removed": n, "files_written": n,
    "bytes_compacted": n}. A no-op plan returns zeros and touches
    nothing.
    """
    plan = plan_compaction(
        list_parquet_files(spark, table_dir), target_bytes, small_fraction
    )
    removed = written = moved_bytes = 0
    for i, b in enumerate(plan):
        tmp = os.path.join(table_dir, f"_compact_tmp_{i}")
        spark.read.parquet(*b["paths"]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = [
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        ]
        assert len(part) == 1, part
        final = os.path.join(table_dir, f"compacted-{i}-{part[0]}")
        os.replace(os.path.join(tmp, part[0]), final)
        written += 1
        # originals go LAST — the new file is durable before any delete
        for p in b["paths"]:
            os.remove(p)
            removed += 1
        moved_bytes += b["bytes"]
        for leftover in os.listdir(tmp):
            os.remove(os.path.join(tmp, leftover))
        os.rmdir(tmp)
    return {
        "bins": len(plan),
        "files_removed": removed,
        "files_written": written,
        "bytes_compacted": moved_bytes,
    }
