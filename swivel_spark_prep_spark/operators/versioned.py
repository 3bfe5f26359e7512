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
- The ONLY commit point is creating ``_log/{N:08d}.json`` put-if-absent.
  Exactly one writer can win version N; the loser sees the conflict,
  REBASES (re-runs its merge against the new latest snapshot) and
  retries at N+1.
- A crash before the log write leaves an orphaned staged directory that
  no log entry references — invisible to readers, reclaimed by
  ``vacuum()``. A crash after is a completed commit.

Filesystem support — two interchangeable backends behind one adapter:

- Plain local paths (no URI scheme) use POSIX ``os.*`` with
  ``O_CREAT|O_EXCL`` — atomic put-if-absent on local disks and NFS.
- Paths with a scheme (``hdfs://``, ``file:``, any Hadoop-registered
  filesystem) route through the session JVM's
  ``org.apache.hadoop.fs.FileSystem``; the commit point is
  ``create(path, overwrite=false)``, which is atomic put-if-absent on
  HDFS (on the Hadoop *local* filesystem it is check-then-create — fine
  for tests, not for contended multi-writer use). Object stores without
  a put-if-absent primitive need a coordination service — exactly the
  boundary the real lakehouse formats document; out of scope here.

Scale: the log holds one tiny JSON per commit (listed, not read, to
find the latest), snapshots are plain parquet (bucketable via
sinks.write_bucketed for co-located merges), and the merge itself is
upsert.py's single declarative full-outer join.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swivel_spark_prep_spark.operators.upsert import snapshot_diff, upsert

__all__ = ["VersionedTable", "ConcurrentCommitError"]


def _join(*parts: str) -> str:
    return "/".join(p.rstrip("/") for p in parts)


class _PosixFS:
    """os.* backend for plain local paths (atomic O_EXCL create)."""

    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def mkdirs(self, p: str) -> None:
        os.makedirs(p, exist_ok=True)

    def list_names(self, p: str) -> list[str]:
        return os.listdir(p) if os.path.isdir(p) else []

    def mtime(self, p: str) -> float:
        return os.path.getmtime(p)

    def create_exclusive(self, p: str, data: bytes) -> bool:
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        return True

    def read_bytes(self, p: str) -> bytes:
        with open(p, "rb") as f:
            return f.read()

    def delete(self, p: str) -> None:
        import shutil

        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        elif os.path.exists(p):
            os.remove(p)


class _JvmFS:
    """Hadoop FileSystem backend (via the session JVM) for URI paths —
    the same five primitives; the put-if-absent is
    ``FileSystem.create(path, overwrite=false)``.

    Atomicity caveat: ``create(path, false)`` is an atomic
    check-and-create on HDFS (and on rename-consistent stores like
    ABFS), but NOT on S3A — S3's create path does a non-atomic
    existence check before an eventually-visible PUT, so two racing
    writers can both believe they created the commit marker
    (HADOOP-16011 territory). On S3, concurrent-writer safety needs an
    external coordination point — a DynamoDB/table-service lock or a
    catalog with conditional PUT (the approach Delta Lake's S3
    LogStore and Iceberg's catalog commit take). Single-writer S3
    deployments are fine; this backend refuses nothing, so the
    deployment must pick one writer or bring a lock."""

    def __init__(self, spark: SparkSession, path: str):
        jvm = spark._jvm
        self._jvm = jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    def exists(self, p: str) -> bool:
        return self._fs.exists(self._Path(p))

    def mkdirs(self, p: str) -> None:
        self._fs.mkdirs(self._Path(p))

    def list_names(self, p: str) -> list[str]:
        jp = self._Path(p)
        if not self._fs.exists(jp):
            return []
        return [s.getPath().getName() for s in self._fs.listStatus(jp)]

    def mtime(self, p: str) -> float:
        return self._fs.getFileStatus(self._Path(p)).getModificationTime() / 1e3

    def create_exclusive(self, p: str, data: bytes) -> bool:
        try:
            out = self._fs.create(self._Path(p), False)
        except Exception as e:  # py4j wraps FileAlreadyExistsException
            msg = str(e)
            if "AlreadyExists" in msg or "already exists" in msg.lower():
                return False
            raise
        out.write(bytearray(data))
        out.close()
        return True

    def read_bytes(self, p: str) -> bytes:
        bos = self._jvm.java.io.ByteArrayOutputStream()
        self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
            self._fs.open(self._Path(p)), bos, 4096, True
        )
        return bytes(bos.toByteArray())

    def delete(self, p: str) -> None:
        self._fs.delete(self._Path(p), True)


class ConcurrentCommitError(RuntimeError):
    """Raised when max_retries rebase attempts all lost the commit race."""


class VersionedTable:
    def __init__(self, path: str, spark: SparkSession | None = None):
        self.path = path.rstrip("/")
        self._log_dir = _join(self.path, "_log")
        self._staged_dir = _join(self.path, "_staged")
        self._spark = spark
        self._fs_cache = None

    @property
    def _fs(self):
        if self._fs_cache is None:
            spark = self._spark
            uri = "://" in self.path or self.path.startswith("file:")
            if spark is None and uri:
                spark = SparkSession.getActiveSession()
                if spark is None:
                    raise ValueError(
                        f"URI path {self.path!r} needs a SparkSession "
                        "(pass spark= or have an active session)"
                    )
            self._fs_cache = (
                _JvmFS(spark, self.path) if (spark is not None and uri)
                else _PosixFS()
            )
        return self._fs_cache

    # ------------------------------------------------------------- log

    def _committed_versions(self) -> list[int]:
        return sorted(
            int(f[:-5])
            for f in self._fs.list_names(self._log_dir)
            if f.endswith(".json") and f[:-5].isdigit()
        )

    def latest_version(self) -> int | None:
        vs = self._committed_versions()
        return vs[-1] if vs else None

    def _record(self, version: int) -> dict:
        return json.loads(
            self._fs.read_bytes(_join(self._log_dir, f"{version:08d}.json"))
        )

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
        return spark.read.parquet(_join(self.path, self._record(v)["dir"]))

    def read_changes(
        self,
        spark: SparkSession,
        key_cols: list[str],
        v_from: int,
        v_to: int | None = None,
    ) -> DataFrame:
        """CDC reader: the I/U/D change feed that takes a consumer from
        version ``v_from`` (exclusive; 0 = from before the first commit)
        to ``v_to`` (inclusive; default latest) — the API an incremental
        downstream pipeline calls instead of re-diffing snapshots itself.

        One :func:`~swivel_spark_prep_spark.operators.upsert.snapshot_diff`
        per commit step (each version against its recorded parent; the
        first step from an empty frame, so a create surfaces as all-I),
        unioned with a ``_version`` metadata column. Ordering by
        ``_version`` replays the feed; ``upsert``-ing each step in order
        onto the ``v_from`` snapshot reproduces ``v_to`` (the round-trip
        law pinned for snapshot_diff). Versions expired by
        ``expire_versions`` cannot be diffed; schemas must be stable
        across the requested range (diff of evolved schemas raises).
        """
        vs = self._committed_versions()
        v_to = vs[-1] if v_to is None else v_to
        steps = [v for v in vs if v_from < v <= v_to]
        if not steps:
            raise ValueError(
                f"no committed versions in ({v_from}, {v_to}] at {self.path}"
            )
        feed = None
        for v in steps:
            parent = self._record(v)["parent"]
            new = self.read(spark, v)
            old = new.limit(0) if parent is None else self.read(spark, parent)
            d = snapshot_diff(old, new, key_cols).withColumn(
                "_version", F.lit(v)
            )
            feed = d if feed is None else feed.unionByName(d)
        return feed

    # --------------------------------------------------------- commit

    def _try_commit(self, df: DataFrame, version: int, op: str, parent) -> bool:
        """Write a staged snapshot, then claim `version` with an
        exclusive log create. Returns False (staged dir removed) if
        another writer claimed it first."""
        import uuid

        self._fs.mkdirs(self._log_dir)
        rel = _join("_staged", f"v{version}-{uuid.uuid4().hex[:12]}")
        df.write.mode("error").parquet(_join(self.path, rel))
        record = {"version": version, "parent": parent, "op": op, "dir": rel}
        ok = self._fs.create_exclusive(
            _join(self._log_dir, f"{version:08d}.json"),
            json.dumps(record).encode(),
        )
        if not ok:
            self._fs.delete(_join(self.path, rel))
        return ok

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

    def vacuum(self, grace_seconds: float = 3600.0) -> int:
        """Remove staged snapshot directories no log entry references
        (crash leftovers and lost commit races). Returns count removed.

        Staged dirs younger than ``grace_seconds`` are SKIPPED: an
        in-flight writer stages its snapshot *before* the exclusive log
        create, so an unreferenced-but-fresh dir may be a commit about
        to happen — deleting it would let the log create succeed while
        pointing at a missing snapshot. The grace window (mtime-based;
        assumes vacuum-host and writer clocks agree to within the
        window) makes vacuum safe alongside live writers; pass 0 only
        when no writer is running."""
        live = {self._record(v)["dir"] for v in self._committed_versions()}
        now = time.time()
        removed = 0
        for d in self._fs.list_names(self._staged_dir):
            rel = _join("_staged", d)
            full = _join(self.path, rel)
            if rel in live:
                continue
            if grace_seconds > 0 and now - self._fs.mtime(full) < grace_seconds:
                continue  # possibly an in-flight commit — leave it
            self._fs.delete(full)
            removed += 1
        return removed

    def expire_versions(self, keep_last: int) -> list[int]:
        """Retention: drop all but the newest ``keep_last`` versions —
        snapshot dir first, log entry second, so a crash mid-expire
        leaves a version either whole or log-less (invisible to readers,
        swept by the next expire), never a log entry pointing at a
        deleted snapshot. Time travel to expired versions is gone; the
        latest snapshot is never touched. Returns the expired versions."""
        if keep_last < 1:
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        victims = self._committed_versions()[:-keep_last]
        for v in victims:
            self._fs.delete(_join(self.path, self._record(v)["dir"]))
            self._fs.delete(_join(self._log_dir, f"{v:08d}.json"))
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
