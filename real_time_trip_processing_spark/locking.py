"""Advisory single-writer directory lock, shared by every in-place
mutator in the engine (persisted ANN index lifecycle, lake purge /
retention ops).

Raw parquet directories have no transaction log: two writers rewriting
the same partition interleave file sets silently. Where this engine
owns both writers it serializes them on a kernel ``flock`` over a lock
file in the target directory, and each writer re-reads whatever state
it depends on (a manifest, a partition listing) INSIDE the critical
section, which is what turns "two writers" into "one writer after the
other" instead of "one writer over a stale view".

Why ``flock`` and not O_CREAT|O_EXCL + a staleness heuristic (the
pre-round-6 design): create-exclusive locks need the contenders to
GUESS when a holder died, and every guess loses some race —

- a holder legitimately running longer than the staleness window has
  its LIVE lock broken (index builds at the scales SCALE.md records
  run for minutes);
- two waiters can both judge a lock stale; the second unlink deletes
  the first waiter's freshly created lock, admitting a third writer;
- the original holder's cleanup unlink can remove a successor's lock.

``flock`` removes the guessing: the kernel drops the lock the instant
the holder's last fd closes — including on SIGKILL and crash — so
there is no staleness window, no break protocol, and no way to steal a
live holder's lock. BSD ``flock`` locks are per open-file-description
(unlike POSIX ``fcntl`` record locks, which are per-process and would
silently NOT exclude two threads of one Spark driver), so in-process
concurrent mutators — the shape the engine's own threaded race tests
exercise — serialize correctly too.

The lock file is unlinked on release (no litter). That makes the
classic unlink-vs-open race possible (a waiter may acquire ``flock``
on an inode that was just unlinked while a third contender creates a
fresh file), so acquisition stat-verifies that the locked fd's inode
is still what the lock PATH names and retries otherwise — the standard
lockfile-with-inode-check protocol; only the holder of the flock on
the live inode proceeds.

Properties:
- contenders poll until the holder releases, bounded by ``timeout_sec``;
- a crashed/killed holder's lock evaporates with its process — waiters
  proceed immediately, no 600 s orphan window;
- the holder records pid + wall time in the lock file for post-mortems;
- readers never take the lock — mutators are crash-ordered so a reader
  mid-mutation sees a consistent (possibly pre-mutation) view.

Scope boundary (HARD guard, not prose): this is a LOCAL-filesystem
lock. A URI-scheme target (``s3a://…``, ``hdfs://…``) is rejected with
``ValueError`` — ``os.open`` on such a string would create a mangled
local path (``./s3a:/bucket/…``) and "lock" nothing while the caller
believes it holds exclusion. On an object store, replace with the
store's conditional put (if-none-match create / if-match swap) around
the same commit point — the structure of every caller already isolates
that single commit write. At 100 TB under a real multi-writer
scheduler, put a table format with a transaction log under the lake
ops instead.
"""

from __future__ import annotations

import contextlib
import fcntl
import os
import re
import time

__all__ = ["dir_write_lock"]

#: a scheme: prefix followed by a slash means the path belongs to a
#: Hadoop filesystem, not the local OS — os-level locking silently does
#: nothing there. Single-slash forms (``file:/x``, ``hdfs:/x``) are
#: valid Hadoop URIs too; matching only ``://`` would let them through
#: to os.open, which would create a mangled local ``./file:`` dir and
#: "lock" that instead.
_URI_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:/")


@contextlib.contextmanager
def dir_write_lock(
    target_dir: str,
    timeout_sec: float = 120.0,
    name: str = ".write_lock",
):
    """Hold the single-writer lock for ``target_dir`` while the body
    runs. See module docstring for semantics and limits.

    Raises ``ValueError`` for URI-scheme targets (object stores /
    HDFS) — the lock would be silently ineffective there — and
    ``TimeoutError`` when a live holder keeps the lock longer than
    ``timeout_sec``.
    """
    if _URI_SCHEME.match(target_dir):
        raise ValueError(
            f"dir_write_lock is a local-filesystem lock; {target_dir!r} "
            "names a Hadoop filesystem URI where os-level locking is "
            "silently ineffective. Serialize writers with the store's "
            "conditional-put CAS or a transactional table format instead."
        )
    os.makedirs(target_dir, exist_ok=True)
    lock = os.path.join(target_dir, name)
    deadline = time.monotonic() + timeout_sec
    fd = -1
    try:
        while True:
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"write lock busy > {timeout_sec}s: {lock} "
                    "(another live writer is mutating this directory)"
                )
            fd = os.open(lock, os.O_CREAT | os.O_RDWR, 0o644)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except BlockingIOError:
                # contention (EWOULDBLOCK) — anything else (ENOLCK,
                # EIO, an FS without flock) must PROPAGATE, not spin
                # for the whole timeout and then blame a nonexistent
                # concurrent writer
                os.close(fd)
                fd = -1
                time.sleep(0.05)  # deadline enforced at loop top
                continue
            except OSError:
                os.close(fd)
                raise
            # flock acquired — but possibly on an inode a releasing
            # holder just unlinked; only proceed if the lock PATH still
            # names the inode we locked (see module docstring)
            st_fd = os.fstat(fd)
            try:
                st_path = os.stat(lock)
            except FileNotFoundError:
                st_path = None
            if st_path is None or (st_fd.st_dev, st_fd.st_ino) != (
                st_path.st_dev,
                st_path.st_ino,
            ):
                os.close(fd)  # releases the orphaned-inode flock
                fd = -1
                continue
            os.ftruncate(fd, 0)
            os.write(fd, f"{os.getpid()} {time.time()}".encode())
            break
        yield
    finally:
        if fd >= 0:
            # unlink BEFORE close: we still hold the flock, so no new
            # holder can have acquired this inode yet — a waiter blocked
            # on it will acquire after our close, fail the inode check,
            # and retry against the fresh path
            with contextlib.suppress(FileNotFoundError):
                os.unlink(lock)
            os.close(fd)
