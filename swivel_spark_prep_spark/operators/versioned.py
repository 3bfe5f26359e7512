"""Versioned parquet table with optimistic concurrency — minimal
lakehouse-style commit protocol over the MERGE core (operators/upsert).

upsert.py's snapshot-swap (and streaming/stream_upsert_snapshot) assume
a single writer. This module adds the piece a production user hits
first: MULTI-writer safety, via the public put-if-absent commit pattern
(the same idea as Delta Lake's JSON commit log / Iceberg's metadata
swap, reduced to its core):

- Snapshots are immutable directories ``_staged/v{N}-{token}`` — never
  renamed, never mutated, so every reader has snapshot isolation for
  free.
- The ONLY commit point is creating ``_log/{N:08d}.json`` with
  O_CREAT|O_EXCL (put-if-absent). Exactly one writer can win version N;
  the loser sees FileExistsError, REBASES (re-runs its merge against
  the new latest snapshot) and retries at N+1.
- A crash before the log write leaves an orphaned staged directory that
  no log entry references — invisible to readers, reclaimed by
  ``vacuum()``. A crash after is a completed commit.

Works on any filesystem with atomic exclusive create (local, NFS with
O_EXCL semantics, HDFS create-no-overwrite). Object stores without
put-if-absent need a coordination service — exactly the boundary the
real lakehouse formats document; out of scope here.

Scale: the log holds one tiny JSON per commit (listed, not read, to
find the latest), snapshots are plain parquet (bucketable via
sinks.write_bucketed for co-located merges), and the merge itself is
upsert.py's single declarative full-outer join.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from swivel_spark_prep_spark.operators.upsert import upsert

__all__ = ["VersionedTable", "ConcurrentCommitError"]


class ConcurrentCommitError(RuntimeError):
    """Raised when max_retries rebase attempts all lost the commit race."""


class VersionedTable:
    def __init__(self, path: str):
        self.path = path
        self._log_dir = os.path.join(path, "_log")
        self._staged_dir = os.path.join(path, "_staged")

    # ------------------------------------------------------------- log

    def _committed_versions(self) -> list[int]:
        if not os.path.isdir(self._log_dir):
            return []
        return sorted(
            int(f[:-5])
            for f in os.listdir(self._log_dir)
            if f.endswith(".json") and f[:-5].isdigit()
        )

    def latest_version(self) -> int | None:
        vs = self._committed_versions()
        return vs[-1] if vs else None

    def _record(self, version: int) -> dict:
        with open(os.path.join(self._log_dir, f"{version:08d}.json")) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        return [self._record(v) for v in self._committed_versions()]

    # ----------------------------------------------------------- read

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Latest committed snapshot, or time-travel to ``version``."""
        v = self.latest_version() if version is None else version
        if v is None or v not in self._committed_versions():
            raise FileNotFoundError(
                f"no committed version {'(empty table)' if v is None else v} "
                f"at {self.path}"
            )
        return spark.read.parquet(
            os.path.join(self.path, self._record(v)["dir"])
        )

    # --------------------------------------------------------- commit

    def _try_commit(self, df: DataFrame, version: int, op: str, parent) -> bool:
        """Write a staged snapshot, then claim `version` with an
        exclusive log create. Returns False (staged dir removed) if
        another writer claimed it first."""
        import shutil
        import uuid

        os.makedirs(self._log_dir, exist_ok=True)
        rel = os.path.join("_staged", f"v{version}-{uuid.uuid4().hex[:12]}")
        df.write.mode("error").parquet(os.path.join(self.path, rel))
        record = {"version": version, "parent": parent, "op": op, "dir": rel}
        try:
            fd = os.open(
                os.path.join(self._log_dir, f"{version:08d}.json"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            shutil.rmtree(os.path.join(self.path, rel), ignore_errors=True)
            return False
        with os.fdopen(fd, "w") as f:
            json.dump(record, f)
        return True

    def create(self, df: DataFrame) -> int:
        """Commit version 1 from an initial DataFrame (fails if the
        table already has commits)."""
        if self.latest_version() is not None:
            raise FileExistsError(f"table at {self.path} already exists")
        if not self._try_commit(df, 1, "create", None):
            raise ConcurrentCommitError("lost the race creating version 1")
        return 1

    def commit_upsert(
        self,
        changes: DataFrame,
        key_cols: list[str],
        delete_col: str | None = None,
        max_retries: int = 5,
        evolve_schema: bool = False,
    ) -> int:
        """MERGE ``changes`` into the latest snapshot and commit it as
        the next version. On a concurrent-commit conflict the merge is
        REBASED onto the new latest snapshot and retried — optimistic
        concurrency, correct because snapshots are immutable (the
        re-read sees the winner's complete commit, never a partial)."""
        spark = changes.sparkSession
        for _ in range(max_retries):
            base_v = self.latest_version()
            if base_v is None:
                raise FileNotFoundError(
                    f"no committed version at {self.path}; call create() first"
                )
            merged = upsert(
                self.read(spark, base_v),
                changes,
                key_cols,
                delete_col=delete_col,
                evolve_schema=evolve_schema,
            )
            if self._try_commit(merged, base_v + 1, "upsert", base_v):
                return base_v + 1
        raise ConcurrentCommitError(
            f"gave up after {max_retries} rebase attempts at {self.path}"
        )

    # --------------------------------------------------------- vacuum

    def vacuum(self) -> int:
        """Remove staged snapshot directories no log entry references
        (crash leftovers and lost commit races). Returns count removed."""
        import shutil

        if not os.path.isdir(self._staged_dir):
            return 0
        live = {self._record(v)["dir"] for v in self._committed_versions()}
        removed = 0
        for d in os.listdir(self._staged_dir):
            rel = os.path.join("_staged", d)
            if rel not in live:
                shutil.rmtree(os.path.join(self.path, rel), ignore_errors=True)
                removed += 1
        return removed

    def expire_versions(self, keep_last: int) -> list[int]:
        """Retention: drop all but the newest ``keep_last`` versions —
        snapshot dir first, log entry second, so a crash mid-expire
        leaves a version either whole or log-less (invisible to readers,
        swept by the next expire), never a log entry pointing at a
        deleted snapshot. Time travel to expired versions is gone; the
        latest snapshot is never touched. Returns the expired versions."""
        import shutil

        if keep_last < 1:
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        victims = self._committed_versions()[:-keep_last]
        for v in victims:
            shutil.rmtree(
                os.path.join(self.path, self._record(v)["dir"]),
                ignore_errors=True,
            )
            os.remove(os.path.join(self._log_dir, f"{v:08d}.json"))
        return victims


def stream_upsert_versioned(
    stream_df: DataFrame,
    table_path: str,
    key_cols: list[str],
    delete_col: str | None = None,
    checkpoint_dir: str | None = None,
):
    """Streaming twin: maintain a VersionedTable from a change stream —
    every micro-batch lands as one committed version (foreachBatch +
    commit_upsert). Unlike stream_upsert_snapshot's single-writer swap,
    commits go through the put-if-absent log, so a concurrent BATCH
    writer (backfill, compaction) can interleave safely: the streaming
    batch just rebases. Exactly-once per batch comes from the streaming
    checkpoint (committed batch ids are never replayed); a batch
    replayed after a crash re-MERGEs idempotently per key.

    Returns the started StreamingQuery (caller awaits/stops)."""
    import os

    table = VersionedTable(table_path)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if table.latest_version() is None:
            drop = [delete_col] if delete_col else []
            table.create(batch_df.drop(*drop).limit(0))
        table.commit_upsert(batch_df, key_cols, delete_col=delete_col)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(table_path, "_checkpoint"),
        )
        .start()
    )
