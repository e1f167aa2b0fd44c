"""Shared stage utilities."""

from __future__ import annotations

import ray

# Stabilize fsspec's http module: aiohttp is absent in this sandbox, so
# `fsspec.implementations.http` can never import. Ray's path resolution
# re-attempts that import on EVERY dataset creation and only catches
# ModuleNotFoundError — two threads racing the failing import can observe a
# partially-torn-down module and get a bare ImportError ("cannot import name
# 'HTTPFileSystem'") that escapes Ray's handler. Registering a stub module
# once, serially, makes every later import succeed and is semantically safe:
# Ray only uses the class in an isinstance() check, which is False for real
# filesystems.
try:  # pragma: no cover - import side effect only
    from fsspec.implementations.http import HTTPFileSystem as _HTTPFS  # noqa: F401
except Exception:  # pragma: no cover
    import sys as _sys
    import types as _types

    import fsspec.implementations as _fsimpl  # fsspec itself is installed

    _mod = _types.ModuleType("fsspec.implementations.http")

    class _StubHTTPFileSystem:  # aiohttp absent; isinstance() is always False
        pass

    _mod.HTTPFileSystem = _StubHTTPFileSystem
    _sys.modules["fsspec.implementations.http"] = _mod
    _fsimpl.http = _mod

# Worker-process-level cache for state built from broadcast object-store refs
# (spatial indexes, sorted lookup arrays). Stateless map_batches TASKS use
# this instead of an actor pool when the state is cheap to build (<~100ms):
# the state is built once per worker process and shared by every task that
# lands there — the same amortization as an actor pool, without reserving
# CPUs (pools that reserve the whole node starve the read/write operators)
# and without per-stage actor spinup latency. Heavy state (big models, slow
# builds) should still use an actor pool.
from collections import OrderedDict

_WORKER_STATE_CACHE: OrderedDict = OrderedDict()
_WORKER_STATE_CAP = 32  # LRU bound: dead refs must not pin state forever


def cached_state(ref, builder, token: str | None = None):
    """Build-once-per-worker state from a `ray.put` broadcast ref.

    Keyed on (ref, token) — token defaults to the builder's ``__qualname__``
    so two index backends over the SAME broadcast table (e.g. grid vs STRtree
    tile states) each get their own cached build, while a builder lambda
    recreated on every batch still maps to ONE stable key (a raw function
    object as key meant every batch rebuilt the state and leaked the old
    entry). Callers whose builder closes over parameters that change the
    built state (column names, plane counts) must pass an explicit ``token``
    encoding those parameters. The cache is a small per-worker LRU so state
    for dropped refs ages out instead of pinning worker heap."""
    key = (ref, token if token is not None else
           getattr(builder, "__qualname__", repr(builder)))
    st = _WORKER_STATE_CACHE.get(key)
    if st is None:
        st = builder(ray.get(ref))
        _WORKER_STATE_CACHE[key] = st
        while len(_WORKER_STATE_CACHE) > _WORKER_STATE_CAP:
            _WORKER_STATE_CACHE.popitem(last=False)
    else:
        _WORKER_STATE_CACHE.move_to_end(key)
    return st


def pool_size(requested: int | None = None, reserve: int = 2, cap: int = 16) -> int:
    """Actor-pool size that never starves the task operators feeding it.

    An actor pool reserving every cluster CPU deadlocks the streaming
    executor (read/write tasks get no slots). Leave ``reserve`` CPUs for the
    task operators; cap to keep per-actor state duplication bounded.
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    auto = max(1, min(cap, cpus - reserve))
    if requested is None:
        return auto
    return max(1, min(requested, auto))
