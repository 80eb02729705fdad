"""Shared helpers for Ray stages."""

from __future__ import annotations

import os
from typing import Dict


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


def remote_args() -> Dict:
    """ray_remote_args for map_batches stages shipping tantivy_ray classes."""
    return {"runtime_env": worker_runtime_env()}
