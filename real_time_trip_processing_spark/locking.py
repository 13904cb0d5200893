"""Advisory single-writer directory lock, shared by every in-place
mutator in the engine (persisted ANN index lifecycle, lake purge /
retention ops).

Raw parquet directories have no transaction log: two writers rewriting
the same partition interleave file sets silently. Where this engine
owns both writers it serializes them on an O_CREAT|O_EXCL lock file —
atomic on POSIX local filesystems and NFSv4 — and each writer re-reads
whatever state it depends on (a manifest, a partition listing) INSIDE
the critical section, which is what turns "two writers" into "one
writer after the other" instead of "one writer over a stale view".

Properties:
- contenders poll until the holder releases, bounded by ``timeout_sec``;
- a lock older than ``stale_sec`` is presumed orphaned by a dead writer
  and broken (the holder records pid + wall time for post-mortems);
- readers never take the lock — mutators are crash-ordered so a reader
  mid-mutation sees a consistent (possibly pre-mutation) view.

On an object store (no atomic create-exclusive), replace with the
store's conditional put (if-none-match create / if-match swap) around
the same commit point — the structure of every caller already isolates
that single commit write. At 100 TB under a real multi-writer
scheduler, put a table format with a transaction log under the lake
ops instead.
"""

from __future__ import annotations

import contextlib
import os
import time

__all__ = ["dir_write_lock"]


@contextlib.contextmanager
def dir_write_lock(
    target_dir: str,
    timeout_sec: float = 120.0,
    stale_sec: float = 600.0,
    name: str = ".write_lock",
):
    """Hold the single-writer lock for ``target_dir`` while the body
    runs. See module docstring for semantics and limits."""
    os.makedirs(target_dir, exist_ok=True)
    lock = os.path.join(target_dir, name)
    deadline = time.monotonic() + timeout_sec
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, f"{os.getpid()} {time.time()}".encode())
            os.close(fd)
            break
        except FileExistsError:
            try:
                if time.time() - os.stat(lock).st_mtime > stale_sec:
                    os.unlink(lock)  # orphaned by a crashed writer
                    continue
            except FileNotFoundError:
                continue  # holder released between open and stat
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"write lock busy > {timeout_sec}s: {lock} "
                    "(another writer is mutating this directory; if its "
                    "process is dead, remove the lock file)"
                )
            time.sleep(0.05)
    try:
        yield
    finally:
        try:
            os.unlink(lock)
        except FileNotFoundError:
            pass
