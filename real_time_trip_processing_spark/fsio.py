"""Hadoop-FileSystem staging primitives + the create-exclusive (CAS)
single-writer lease — the object-store twin of ``locking.py``.

The persisted-index lifecycle (functions/ivf_index.py) stages work with
renames, marker files, a batch ledger and a high-water file. Through
round 6 those were os/shutil calls, which silently mangle URI paths
(``os.rename("s3a://…")`` creates a local ``./s3a:`` dir), so every
index mutator hard-rejected URI-scheme dirs. This module routes the
same ops through the Hadoop FileSystem API — the abstraction the READ
path already uses — so the lifecycle runs against any scheme Spark can
read (``file://``, ``hdfs://``, ``s3a://`` with the hadoop-aws jars).

Semantics by scheme (state them, don't assume them):

- ``rename``: atomic on HDFS and local file://; on S3A it is a
  copy+delete (not atomic, O(bytes)). The index lifecycle tolerates
  this because every rename happens INSIDE the single-writer critical
  section and the crash matrix re-converges from either side of it.
- ``create(path, overwrite=false)`` — the CAS primitive: atomic on
  HDFS and local; atomic on S3 when the connector uses conditional
  writes (Hadoop 3.4.1+ maps it to ``If-None-Match``), check-then-put
  on older S3A stacks (a razor-thin race two concurrent *first*
  acquirers could both win — upgrade the connector for real CAS).
- ``delete(recursive)``: not atomic anywhere; all callers order
  deletes so a crash mid-delete re-converges (see ivf_index.py's
  crash matrices).

The CAS lease (``fs_cas_write_lock``) differs from the kernel flock
(``locking.dir_write_lock``) in ONE property, and it is the honest
object-store trade: nothing evaporates a crashed holder's marker.
This module refuses to guess staleness (the same reasoning that moved
the local lock to flock — every staleness heuristic loses some race to
a live-but-slow holder), so contenders time out loudly with the
holder's recorded identity, and a known-dead holder is cleared
explicitly via ``fs_force_unlock``. At 100 TB under a real multi-writer
scheduler, put a transactional table format's commit protocol under
these ops instead.
"""

from __future__ import annotations

import contextlib
import os
import socket
import time

from pyspark.sql import SparkSession

from .locking import _URI_SCHEME

__all__ = [
    "is_uri", "local_form", "fs_exists", "fs_mkdirs", "fs_delete",
    "fs_count_files", "fs_rename", "fs_read_text", "fs_write_text",
    "fs_create_exclusive", "fs_cas_write_lock", "fs_force_unlock",
]


def is_uri(path: str) -> bool:
    """True iff ``path`` names a Hadoop filesystem URI (any scheme,
    single- or double-slash form) rather than a plain local path."""
    return bool(_URI_SCHEME.match(path))


def local_form(path: str) -> str | None:
    """The local-OS path for a plain path or a local ``file:`` URI;
    None for anything remote. Used to keep kernel-flock locking for
    every spelling of a local directory — a ``file:///data/idx`` writer
    and a ``/data/idx`` writer must take the SAME lock (the decoded
    path), never two mechanisms that don't exclude each other (the
    rule operators/maintenance._lake_write_lock already follows)."""
    if not is_uri(path):
        return path
    from urllib.parse import unquote, urlparse

    u = urlparse(path)
    if u.scheme == "file" and u.netloc in ("", "localhost"):
        return unquote(u.path)
    return None


def _fs_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, p, jvm


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, p, _ = _fs_path(spark, path)
    return bool(fs.exists(p))


def fs_mkdirs(spark: SparkSession, path: str) -> None:
    fs, p, _ = _fs_path(spark, path)
    fs.mkdirs(p)


def fs_delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    """Delete (recursively when asked); False if the path was absent."""
    fs, p, _ = _fs_path(spark, path)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, recursive))


def fs_count_files(
    spark: SparkSession, path: str, suffix: str | None = None
) -> int:
    """Recursive count of FILES (not dirs) under ``path``; 0 if absent.
    Used by the fold's crashed-rename heal: S3A's copy+delete rename
    deletes a source key only after copying it, so whichever side of a
    crashed rename holds >= files is authoritative (ties mean the copy
    phase completed — both sides hold identical content). With
    ``suffix`` only matching names count (e.g. ``.parquet`` to ask
    "does this staging hold any DATA files, or only markers?")."""
    fs, p, _ = _fs_path(spark, path)
    if not fs.exists(p):
        return 0
    # explicit listStatus recursion, not fs.listFiles(p, true): the
    # base-class recursive iterator round-trips paths through
    # java.io.File(URI), which rejects non-file schemes
    n = 0
    stack = [p]
    while stack:
        for st in fs.listStatus(stack.pop()):
            if st.isDirectory():
                stack.append(st.getPath())
            elif suffix is None or str(st.getPath().getName()).endswith(
                suffix
            ):
                n += 1
    return n


def fs_rename(spark: SparkSession, src: str, dst: str) -> None:
    """Move ``src`` to a non-existent ``dst``; raises on failure —
    Hadoop's rename reports failure as a False return, which silent
    callers would turn into the exact class of quiet corruption the
    URI rejection used to prevent."""
    fs, p_src, jvm = _fs_path(spark, src)
    p_dst = jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(p_src, p_dst):
        raise OSError(f"Hadoop FS rename failed: {src!r} -> {dst!r}")


def fs_read_text(spark: SparkSession, path: str) -> str | None:
    """Small-file text read; None when absent."""
    fs, p, jvm = _fs_path(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return str(jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8"))
    finally:
        stream.close()


def fs_write_text(
    spark: SparkSession, path: str, text: str, overwrite: bool = True
) -> None:
    """Small-file text write through ``FileSystem.create``. With
    ``overwrite=False`` this IS the CAS primitive — it throws when the
    path exists (see module docstring for per-scheme atomicity)."""
    fs, p, _ = _fs_path(spark, path)
    out = fs.create(p, bool(overwrite))
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


#: exception CLASSES that mean "the path already exists" — classified
#: by class name only, never by message text: an unrelated FS error
#: whose message happens to contain "already exists" must propagate,
#: not read as 'lock busy' and silently spin out the lease timeout.
_EXISTS_EXCEPTION_CLASSES = frozenset({
    "org.apache.hadoop.fs.FileAlreadyExistsException",  # local, HDFS, S3A 412
    "org.apache.hadoop.fs.PathExistsException",
    "java.nio.file.FileAlreadyExistsException",
    # another client holds the create lease on this path — busy, not broken
    "org.apache.hadoop.hdfs.protocol.AlreadyBeingCreatedException",
})


def _is_exists_exception(jex) -> bool:
    """True iff the Java exception (or any link of its cause chain)
    is one of the known path-exists classes. RemoteException is
    unwrapped via the server-side class name it carries."""
    seen = 0
    while jex is not None and seen < 16:  # cycle guard
        seen += 1
        name = str(jex.getClass().getName())
        if name in _EXISTS_EXCEPTION_CLASSES:
            return True
        if name == "org.apache.hadoop.ipc.RemoteException":
            if str(jex.getClassName() or "") in _EXISTS_EXCEPTION_CLASSES:
                return True
        jex = jex.getCause()
    return False


def fs_create_exclusive(spark: SparkSession, path: str, text: str) -> bool:
    """Create-if-absent: True on success, False when the path already
    exists; any OTHER failure propagates (an FS error must not read as
    'lock busy' and spin out the whole timeout). Exists-classification
    is by exception CLASS NAME only — substring-matching the message
    would misread e.g. a permission error mentioning an existing
    sibling as contention (ADVICE r7)."""
    try:
        fs_write_text(spark, path, text, overwrite=False)
        return True
    except Exception as e:  # Py4JJavaError — py4j not imported directly
        if _is_exists_exception(getattr(e, "java_exception", None)):
            return False
        raise


#: schemes whose CAS atomicity depends on the connector version —
#: S3A maps create(overwrite=false) to a conditional If-None-Match put
#: only from Hadoop 3.4.1; below that it is check-then-put (a razor-thin
#: race two concurrent FIRST acquirers could both win).
_CHECK_THEN_PUT_SCHEMES = ("s3a", "s3", "s3n")
_warned_non_atomic_cas: set[str] = set()


def _hadoop_version(spark: SparkSession) -> tuple[int, ...]:
    v = str(spark.sparkContext._jvm.org.apache.hadoop.util.VersionInfo.getVersion())
    parts = []
    for tok in v.split("-")[0].split("."):
        if not tok.isdigit():
            break
        parts.append(int(tok))
    return tuple(parts) or (0,)


def _warn_if_cas_not_atomic(spark: SparkSession, target_dir: str) -> None:
    """One-time (per scheme per process) warning when the lease's CAS
    primitive is check-then-put on this stack — the docstring states
    the weakening; this puts it where the operator actually sees it
    (ADVICE r7 #2). Version probe failures warn too: an unknown stack
    must not silently read as atomic."""
    scheme = (target_dir.split("://", 1)[0].lower()
              if "://" in target_dir else "")
    if scheme not in _CHECK_THEN_PUT_SCHEMES or scheme in _warned_non_atomic_cas:
        return
    try:
        atomic = _hadoop_version(spark) >= (3, 4, 1)
    except Exception:
        atomic = False
    if not atomic:
        import warnings

        _warned_non_atomic_cas.add(scheme)
        warnings.warn(
            f"CAS lease on {scheme}:// with a Hadoop connector below "
            "3.4.1: create(overwrite=false) is check-then-put, not a "
            "conditional write — two concurrent FIRST acquirers can "
            "both win the lease. Upgrade hadoop-aws to >= 3.4.1 for "
            "real CAS, or serialize writers externally.",
            RuntimeWarning,
            stacklevel=4,
        )


@contextlib.contextmanager
def fs_cas_write_lock(
    spark: SparkSession,
    target_dir: str,
    timeout_sec: float = 120.0,
    name: str = ".write_lock.cas",
):
    """Single-writer lease for a Hadoop-FS directory via create-exclusive
    marker — the CAS commit the local flock cannot provide on object
    stores. Poll-acquire bounded by ``timeout_sec``; the marker records
    host/pid/time for post-mortems; released by deleting the marker.

    A crashed holder's marker does NOT evaporate (no kernel on an
    object store): contenders time out with the holder's identity in
    the error, and the operator clears a known-dead holder with
    ``fs_force_unlock``. No staleness auto-break — see module
    docstring for why guessing loses races to live-but-slow holders.
    """
    _warn_if_cas_not_atomic(spark, target_dir)
    fs_mkdirs(spark, target_dir)
    lock = target_dir.rstrip("/") + "/" + name
    token = f"{socket.gethostname()} pid={os.getpid()} t={time.time()}"
    deadline = time.monotonic() + timeout_sec
    while not fs_create_exclusive(spark, lock, token):
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"CAS write lease busy > {timeout_sec}s: {lock} held by "
                f"{fs_read_text(spark, lock)!r}. If that holder is dead, "
                "clear it with fs_force_unlock(spark, target_dir)."
            )
        time.sleep(0.25)
    try:
        yield
    finally:
        fs_delete(spark, lock, recursive=False)


def fs_force_unlock(
    spark: SparkSession, target_dir: str, name: str = ".write_lock.cas"
) -> bool:
    """Operator escape hatch: remove a dead holder's CAS marker. True
    if a marker was removed. NEVER call against a live holder — there
    is no way to distinguish one here; that judgment is the operator's."""
    return fs_delete(
        spark, target_dir.rstrip("/") + "/" + name, recursive=False
    )
