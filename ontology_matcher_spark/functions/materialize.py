"""Lineage-truncating materialization WITHOUT executor-memory caching.

`DataFrame.localCheckpoint()` persists the checkpointed RDD in executor
storage memory and never frees it: in a long-lived session every
iterative loop round and every pipeline re-run stacks another cached
copy (measured in this sandbox: three consecutive KG pipeline runs in
one session degraded 87s → 125s → 178s purely from leaked checkpoint
blocks pressuring the heap). A real cluster job is exactly that — a
long-lived set of executors running stage after stage — so the engine
must not leak storage memory per stage.

`materialize()` instead round-trips through parquet on a scratch
directory and returns the re-read frame: lineage is truncated, the
bytes live OFF-heap (tmpfs locally; on a multi-node cluster point
SPARK_GRAFT_SCRATCH at the job's HDFS/S3 scratch prefix — the same
requirement Spark's own reliable `checkpoint()` has), and
`clear_scratch()` reclaims everything deterministically between runs.
"""

from __future__ import annotations

import atexit
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

#: app dirs with atexit cleanup already registered (one hook per app)
_ATEXIT_REGISTERED: set[str] = set()

#: sibling scratch dirs older than this are treated as leaked by a
#: finished/crashed run and reaped on first scratch_root() use — the
#: default base is /dev/shm (RAM-backed tmpfs), so leaks survive
#: process exit and would otherwise accumulate forever
_STALE_SECS = 6 * 3600

#: owner-liveness marker each session writes into its scratch root: a
#: live long-running session's dir can easily go >_STALE_SECS without
#: an mtime touch (early-materialized tables still referenced by lazy
#:  plans), so mtime alone must never be grounds for reaping
_OWNER_MARKER = "_OWNER_PID"


def _write_owner_marker(root: str) -> None:
    try:
        os.makedirs(root, exist_ok=True)
        with open(os.path.join(root, _OWNER_MARKER), "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        pass


def _owner_alive(p: str) -> bool:
    """True iff the dir's owner marker names a process that still
    exists on THIS host (the scratch base is per-host: tmpfs locally,
    and on a cluster each executor host has its own). No marker →
    written by an older version → fall back to mtime staleness."""
    try:
        with open(os.path.join(p, _OWNER_MARKER)) as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return False
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else


def _reap_stale_siblings(mat_base: str, own: str) -> None:
    try:
        entries = os.listdir(mat_base)
    except OSError:
        return
    now = time.time()
    for name in entries:
        p = os.path.join(mat_base, name)
        if p == own:
            continue
        try:
            if _owner_alive(p):
                continue
            if now - os.path.getmtime(p) > _STALE_SECS:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            continue


def scratch_root(spark: SparkSession) -> str:
    base = os.environ.get("SPARK_GRAFT_SCRATCH")
    if not base:
        try:
            base = spark.conf.get("spark.local.dir")
        except Exception:
            base = os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    # namespace by application id: clear_scratch() in one session must
    # not delete files another live session's plans still reference
    root = os.path.join(base, "materialize", spark.sparkContext.applicationId)
    if root not in _ATEXIT_REGISTERED:
        _ATEXIT_REGISTERED.add(root)
        # this session's dir dies with the process even when the caller
        # (CLI commands, crashed runs) never calls clear_scratch()
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _write_owner_marker(root)
        _reap_stale_siblings(os.path.join(base, "materialize"), root)
    return root


def materialize(df: DataFrame, tag: str = "m") -> DataFrame:
    """Write ``df`` to scratch parquet and read it back (eager).

    Returns the re-read frame. The file stays until `clear_scratch`
    (or `drop_materialized` on this frame's path) — callers that loop
    should drop the previous round explicitly."""
    spark = df.sparkSession
    path = os.path.join(scratch_root(spark), f"{tag}-{uuid.uuid4().hex[:8]}")
    df.write.parquet(path)
    return spark.read.parquet(path)


def materialize_at(df: DataFrame, path: str) -> DataFrame:
    """materialize() with an explicit path (for loops that manage
    per-round files themselves)."""
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def drop_materialized(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)


def clear_scratch(spark: SparkSession) -> None:
    """Delete every materialized table of this session. Call between
    independent runs in a shared session (bench reps, test modules) —
    NOT while a returned DataFrame is still to be consumed."""
    root = scratch_root(spark)
    shutil.rmtree(root, ignore_errors=True)
    # the rmtree took the owner marker with it — restore it so a
    # sibling session starting later still sees this one as live
    _write_owner_marker(root)
