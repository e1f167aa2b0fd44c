"""Resumable, partitioned stage outputs with per-partition lineage + metrics.

Reference parity: the reference checkpoints at stage granularity — one SQLite
file per stage, one transaction, drop-and-rebuild on rerun
(``/root/reference/src/daos/RawGtfsDAO/loaders.js:119-127``,
``GtfsOsmNetworkDAO/loaders.js:197-224``). Here each stage writes one output
directory per partition (written to a temp dir, atomically renamed), and a
manifest JSON records lineage (inputs, partition key) + metrics (rows, wall
seconds) per completed partition. A resumed run skips completed partitions —
the BASELINE.json resumability requirement.

Partition keys are value ranges of the stage's partitioning column (e.g.
phash ranges), so partition boundaries are pinned by the manifest and a
resume cannot repartition (SURVEY §7.6-7).
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
import uuid
from dataclasses import dataclass
from typing import Callable


@dataclass
class PartitionResult:
    key: str
    rows: int
    wall_s: float
    skipped: bool


class StageCheckpoint:
    """Manifest-backed checkpoint for one stage's output directory."""

    def __init__(self, out_dir: str, stage: str, lineage: dict | None = None):
        self.out_dir = out_dir
        self.stage = stage
        self.manifest_path = os.path.join(out_dir, "_manifest.json")
        os.makedirs(out_dir, exist_ok=True)
        self.manifest = self._load()
        self.manifest.setdefault("stage", stage)
        self.manifest.setdefault("lineage", lineage or {})
        self.manifest.setdefault("partitions", {})
        self._lock = threading.Lock()  # partitions may run concurrently

    def _load(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {}

    def _save(self) -> None:
        # tmp name unique per process+thread: two processes committing
        # DIFFERENT partitions must not race on one shared tmp file (one
        # os.replace could consume the other's tmp or drop its entry)
        tmp = f"{self.manifest_path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        self._refresh()  # fold in partitions committed since our last read
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path)  # atomic manifest commit

    def completed(self) -> set[str]:
        return set(self.manifest["partitions"])

    def part_dir(self, key: str) -> str:
        return os.path.join(self.out_dir, f"part-{key}")

    def _refresh(self) -> None:
        """Merge partitions committed by OTHER processes (manifest on disk is
        the source of truth; a concurrent resumer may have advanced it)."""
        disk = self._load()
        if disk.get("partitions"):
            merged = dict(disk["partitions"])
            merged.update(self.manifest["partitions"])
            self.manifest["partitions"] = merged

    @staticmethod
    def _lock_is_stale(lock_path: str, stale_s: float = 600.0) -> bool:
        """A lock is stale iff its recorded owner pid is dead, or the pid is
        unreadable (crashed between create and write / foreign writer) AND
        the file's mtime is older than ``stale_s``. Keyed on the lock's own
        age/liveness, never the waiter's elapsed wait — a legitimate writer
        whose write_fn takes hours keeps its lock."""
        try:
            with open(lock_path) as f:
                txt = f.read().strip()
        except FileNotFoundError:
            return False  # released while we looked — retry acquisition
        except OSError:
            txt = ""
        if txt.isdigit():
            try:
                os.kill(int(txt), 0)
                return False  # owner alive
            except ProcessLookupError:
                return True  # owner dead
            except PermissionError:
                return False  # alive, other uid
        try:
            return (time.time() - os.stat(lock_path).st_mtime) > stale_s
        except FileNotFoundError:
            return False

    def run_partition(self, key: str, write_fn: Callable[[str], int]) -> PartitionResult:
        """Run one partition if not already completed. ``write_fn(tmp_dir)``
        must write the partition's output under ``tmp_dir`` and return the
        row count; the directory is atomically renamed into place and the
        manifest updated only after the write succeeds. Concurrent-safe: the
        on-disk manifest is re-read before deciding to (re)build, an O_EXCL
        lockfile serializes processes racing on the same partition, and the
        tmp dir is unique per thread."""
        final = self.part_dir(key)
        lock_path = os.path.join(self.out_dir, f".lock-{key}")
        lock_fd = None
        while True:
            with self._lock:
                self._refresh()
                if key in self.manifest["partitions"]:
                    meta = self.manifest["partitions"][key]
                    return PartitionResult(key, meta["rows"], meta["wall_s"], skipped=True)
            try:
                lock_fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(lock_fd, str(os.getpid()).encode())  # owner identity
                break  # we own the partition
            except FileExistsError:
                if self._lock_is_stale(lock_path):
                    # break ONLY locks whose owner process is provably gone
                    # (or whose file has sat untouched past the stale window
                    # with no readable owner) — a live writer keeps its lock
                    # however long write_fn runs
                    try:
                        os.unlink(lock_path)
                    except FileNotFoundError:
                        pass
                else:
                    time.sleep(0.05)
        try:
            tmp = os.path.join(self.out_dir, f".tmp-{key}-{os.getpid()}-{uuid.uuid4().hex[:8]}")
            if os.path.exists(final):  # partial from a killed run, never committed
                shutil.rmtree(final)
            os.makedirs(tmp, exist_ok=True)  # an empty partition writes no files
            t0 = time.time()
            rows = write_fn(tmp)
            os.replace(tmp, final)
            wall = time.time() - t0
            with self._lock:
                self._refresh()
                self.manifest["partitions"][key] = {
                    "rows": int(rows),
                    "wall_s": round(wall, 3),
                    "completed_at_unix": round(time.time(), 3),
                }
                self._save()
        finally:
            os.close(lock_fd)
            try:
                os.unlink(lock_path)
            except FileNotFoundError:
                pass
        return PartitionResult(key, int(rows), wall, skipped=False)


def phash_partitions(
    n_buckets: int, domain: tuple[int, int] = (0, 1 << 32)
) -> list[tuple[str, int, int | None]]:
    """Range partitioning of the phash key space: ``n_buckets`` equal ranges
    over ``domain`` (where the mass lives — Morton codes of W-bit coords span
    [0, 2^2W)), plus catch-all buckets below and above for edge-case keys
    (phash=0 handled by domain, all-high-bits/negative by the catch-alls).

    Range (not hash) partitioning so parquet row-group min/max statistics
    prune each partition's read; bounds are FIXED by (n_buckets, domain) so a
    resume can never repartition (SURVEY §7.6-7). Returns
    [(key, lo, hi_exclusive_or_None)] covering all of int64 exactly once.
    """
    lo, hi = domain
    step = max((hi - lo) // n_buckets, 1)
    parts: list[tuple[str, int, int | None]] = [("neg", -(1 << 63), lo)]
    for i in range(n_buckets):
        a = lo + i * step
        b = hi if i == n_buckets - 1 else lo + (i + 1) * step
        parts.append((f"{i:04d}", a, b))
    parts.append(("high", hi, None))
    return parts
