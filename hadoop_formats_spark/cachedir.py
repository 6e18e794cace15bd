"""User-owned on-disk cache root for derived fixtures and indexes.

Every cache this engine materializes (timestamp-cast events copies,
stream-source directories, seqfile/parquet round-trip fixtures, the
persisted IVF index, the shipped package zip) used to live at fixed
world-writable ``/tmp/hfs_*`` paths — on a shared host another user
can pre-create such a path and poison the cache (ADVICE r4).  All of
them now live under ONE per-user root created with mode 0700:

* ``$HFS_CACHE_DIR`` when set (explicit operator choice), else
* ``<tmpdir>/hfs_cache_<uid>``.

If the root exists but is owned by someone else (squatted), fall back
to a fresh private ``mkdtemp`` — caching degrades to per-process, but
nothing is ever read from or written to a directory we don't own.
"""

from __future__ import annotations

import os
import tempfile

_ROOT: str | None = None


def cache_root() -> str:
    """The per-user cache root (created on first use, mode 0700)."""
    global _ROOT
    if _ROOT is not None:
        return _ROOT
    root = os.environ.get("HFS_CACHE_DIR") or os.path.join(
        tempfile.gettempdir(), f"hfs_cache_{os.getuid()}"
    )
    try:
        os.makedirs(root, mode=0o700, exist_ok=True)
        # lstat + symlink rejection: os.stat follows symlinks, so an
        # attacker could pre-create the root as a symlink to a directory
        # the victim owns (passing a stat-based uid check) and redirect
        # cache reads/writes there (ADVICE r5 #2).
        st = os.lstat(root)
        if os.path.islink(root) or not os.path.isdir(root):
            raise PermissionError(f"cache root {root} is not a real directory")
        if st.st_uid != os.getuid():
            raise PermissionError(f"cache root {root} not owned by uid {os.getuid()}")
    except (OSError, PermissionError):
        root = tempfile.mkdtemp(prefix="hfs_cache_")
    _ROOT = root
    return root


def cache_path(*parts: str) -> str:
    """Join ``parts`` under the cache root (no directory creation)."""
    return os.path.join(cache_root(), *parts)
