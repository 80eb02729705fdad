"""IndexReader with reload policies (reference src/reader/mod.rs:21-53).

The reference's IndexReader hands out point-in-time Searcher snapshots
and refreshes them either manually (``ReloadPolicy::Manual``) or
automatically shortly after a commit (``ReloadPolicy::OnCommitWithDelay``
— a meta.json watcher with a debounce delay).  Here the commit marker is
``manifest.json`` (written atomically, last); OnCommitWithDelay is a
stat-based check throttled to at most one stat per ``delay`` seconds on
``searcher()`` access — equivalent observable behavior to the watcher
(a new commit becomes visible within ``delay``) without a background
thread per reader."""

from __future__ import annotations

import os
import time
from typing import Optional

from ..index.manifest import MANIFEST_NAME
from .searcher import IndexSearcher


class ReloadPolicy:
    MANUAL = "manual"
    ON_COMMIT_WITH_DELAY = "on_commit_with_delay"


class IndexReader:
    """Snapshot manager: ``searcher()`` returns the current point-in-time
    IndexSearcher; reload per policy."""

    def __init__(self, index_dir: str,
                 reload_policy: str = ReloadPolicy.ON_COMMIT_WITH_DELAY,
                 delay_secs: float = 1.0):
        self.index_dir = index_dir
        self.reload_policy = reload_policy
        self.delay_secs = delay_secs
        self._manifest_path = os.path.join(index_dir, MANIFEST_NAME)
        self._searcher: Optional[IndexSearcher] = None
        self._loaded_stamp: Optional[tuple] = None
        self._last_check = 0.0
        self.reload()

    def _stamp(self) -> tuple:
        st = os.stat(self._manifest_path)
        return (st.st_mtime_ns, st.st_size)

    def reload(self) -> IndexSearcher:
        """Open a fresh snapshot of the current commit (Manual reload)."""
        self._searcher = IndexSearcher(self.index_dir)
        self._loaded_stamp = self._stamp()
        self._last_check = time.monotonic()
        return self._searcher

    def searcher(self) -> IndexSearcher:
        if self.reload_policy == ReloadPolicy.ON_COMMIT_WITH_DELAY:
            now = time.monotonic()
            if now - self._last_check >= self.delay_secs:
                self._last_check = now
                if self._stamp() != self._loaded_stamp:
                    self.reload()
        return self._searcher
