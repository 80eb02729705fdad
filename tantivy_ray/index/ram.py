"""RamDirectory — an in-RAM index directory.

Re-expression of the reference's RamDirectory
(/root/reference/src/directory/ram_directory.rs): index files live
entirely in memory and vanish when the directory is dropped.  Here the
files are created on a RAM-backed tmpfs mount (/dev/shm when present),
so every existing component — segment build, SegmentReader's np.memmap,
IndexSearcher, IndexWriter, merge — works unchanged against RAM pages,
exactly like the reference where RamDirectory serves the same Directory
trait as MmapDirectory.  Falls back to the regular temp dir when no
tmpfs mount exists (still file-API-compatible, just disk-backed).

Typical use (tests, tiny transient indexes — the reference's own use):

    with RamDirectory() as d:
        writer = IndexWriter(d.path)
        ...
        searcher = IndexSearcher(d.path)
"""

from __future__ import annotations

import os
import shutil
import tempfile


_TMPFS_CANDIDATES = ("/dev/shm", "/run/shm")


def _ram_root() -> str | None:
    for p in _TMPFS_CANDIDATES:
        if os.path.isdir(p) and os.access(p, os.W_OK):
            return p
    return None


class RamDirectory:
    """Context-managed RAM-backed index directory."""

    def __init__(self, prefix: str = "tantivy_ray_ram_"):
        root = _ram_root()
        self.ram_backed = root is not None
        self.path = tempfile.mkdtemp(prefix=prefix, dir=root)
        self._open = True

    # --- Directory surface ---
    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.path, name))

    def atomic_write(self, name: str, data: bytes) -> None:
        """Atomic replace, like the reference's atomic_write (meta.json)."""
        p = os.path.join(self.path, name)
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)

    def atomic_read(self, name: str) -> bytes:
        with open(os.path.join(self.path, name), "rb") as f:
            return f.read()

    def listdir(self):
        return sorted(os.listdir(self.path))

    def total_bytes(self) -> int:
        total = 0
        for root, _dirs, files in os.walk(self.path):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
        return total

    # --- lifecycle ---
    def close(self) -> None:
        if self._open:
            shutil.rmtree(self.path, ignore_errors=True)
            self._open = False

    def __enter__(self) -> "RamDirectory":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self):  # best-effort; close() is the contract
        try:
            self.close()
        except Exception:
            pass
