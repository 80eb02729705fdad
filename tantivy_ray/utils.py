"""Shared helpers for Ray stages."""

from __future__ import annotations

import os
from typing import Dict

_PROBE_CACHE: Dict[str, bool] = {}


def package_parent_dir() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker_runtime_env() -> Dict:
    """runtime_env making `tantivy_ray` importable in Ray workers even when
    the driver's cwd is elsewhere (workers don't see driver sys.path edits)."""
    pp = os.environ.get("PYTHONPATH", "")
    parent = package_parent_dir()
    if parent not in pp.split(os.pathsep):
        pp = (parent + os.pathsep + pp).rstrip(os.pathsep)
    return {"env_vars": {"PYTHONPATH": pp}}


def _workers_can_import() -> bool:
    """True when default-pool Ray workers can already import tantivy_ray.

    When our own entry points run, ``tantivy_ray/__init__`` exports
    PYTHONPATH *before* ``ray.init``, so every worker inherits it and the
    per-stage runtime_env below is redundant.  Redundant is not free: a
    task/actor with an ``env_vars`` runtime_env runs in a dedicated worker
    pool keyed by the env hash, so every Dataset stage cold-starts ~num_cpus
    fresh Python processes instead of reusing the warm default pool — on a
    32-cpu host that is 5-8 s of pure worker churn per pipeline (measured:
    the groupby-term merge at sf0.1 drops 13.2 s -> 1.7 s warm without it).
    One cheap num_cpus=0 probe per Ray session tells us which world we are
    in; a driver that called ``ray.init`` before importing us (workers
    without PYTHONPATH) keeps the explicit runtime_env.
    """
    try:
        import ray
    except Exception:  # pragma: no cover
        return False
    if not ray.is_initialized():
        # don't trigger auto-init (and don't cache) just for the probe
        return False
    try:
        job = ray.get_runtime_context().get_job_id()
    except Exception:  # pragma: no cover
        job = "?"
    hit = _PROBE_CACHE.get(job)
    if hit is not None:
        return hit

    # closure with no module-global references: cloudpickle ships it by
    # value, so the probe itself never needs tantivy_ray on the worker
    @ray.remote(num_cpus=0)
    def _probe() -> bool:
        import importlib.util

        return importlib.util.find_spec("tantivy_ray") is not None

    try:
        ok = bool(ray.get(_probe.remote(), timeout=60))
    except Exception:
        ok = False
    _PROBE_CACHE[job] = ok
    return ok


def remote_args() -> Dict:
    """ray_remote_args for map_batches stages shipping tantivy_ray classes.

    Empty when workers inherit PYTHONPATH from the driver environment (the
    fast path: stages share the warm default worker pool); otherwise an
    explicit runtime_env so workers can unpickle our classes at all.
    """
    if _workers_can_import():
        return {}
    return {"runtime_env": worker_runtime_env()}
