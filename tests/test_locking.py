"""dir_write_lock semantics: kernel-managed exclusion (flock), crash
release, live-holder safety, unlink-race safety, URI rejection.

These pin the round-6 redesign: the pre-round-6 O_CREAT|O_EXCL +
staleness-heuristic lock could (a) break a LIVE holder that outran the
600 s window, (b) admit two writers when two waiters both judged a lock
stale, and (c) have a holder's cleanup unlink a successor's lock. flock
has none of these: the kernel drops the lock with the holder's process,
so there is no staleness guess to lose."""

from __future__ import annotations

import os
import subprocess
import sys
import threading
import time

import pytest

from real_time_trip_processing_spark.locking import dir_write_lock


def test_rejects_uri_scheme_targets(tmp_path):
    """A Hadoop-FS URI must fail LOUDLY: os-level locking on
    's3a://bucket/x' would create a mangled local dir and provide no
    exclusion while the caller believes it holds the lock."""
    for uri in (
        "s3a://bucket/lake",
        "hdfs://nn:8020/idx",
        "file://x/y",
        "file:/x/y",      # single-slash Hadoop URI forms must be
        "hdfs:/nn/idx",   # caught too — os.open would otherwise
    ):                    # create a mangled local './file:' dir
        with pytest.raises(ValueError, match="local-filesystem"):
            with dir_write_lock(uri):
                pass
    # plain local paths (absolute or relative) still work
    with dir_write_lock(str(tmp_path / "ok")):
        pass


def test_threads_mutually_exclude(tmp_path):
    """flock is per open-file-description, so two threads of ONE process
    (the Spark driver shape: concurrent append + streaming batch) still
    exclude each other — POSIX record locks would NOT (they merge
    within a process)."""
    target = str(tmp_path / "d")
    holders = []
    overlap = []

    def work(i):
        with dir_write_lock(target, timeout_sec=30):
            holders.append(i)
            if len(holders) > len(set(holders)):
                overlap.append(i)
            t0 = time.monotonic()
            while time.monotonic() - t0 < 0.05:
                pass
            holders.remove(i)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(6)]
    concurrent = []

    # sharper overlap detector: sample the holder set from outside
    def watch(stop):
        while not stop.is_set():
            if len(holders) > 1:
                concurrent.append(tuple(holders))
            time.sleep(0.005)

    stop = threading.Event()
    w = threading.Thread(target=watch, args=(stop,))
    w.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    w.join()
    assert not overlap and not concurrent
    assert not os.path.exists(os.path.join(target, ".write_lock"))


def test_live_holder_is_never_broken(tmp_path):
    """A waiter must TIME OUT against a live holder — never steal the
    lock, no matter how long the holder runs (the old stale_sec break
    admitted a second writer under any long build)."""
    target = str(tmp_path / "d")
    entered = threading.Event()
    release = threading.Event()

    def hold():
        with dir_write_lock(target):
            entered.set()
            release.wait(10)

    t = threading.Thread(target=hold)
    t.start()
    assert entered.wait(5)
    with pytest.raises(TimeoutError):
        with dir_write_lock(target, timeout_sec=0.4):
            pass
    release.set()
    t.join()


def test_killed_holder_releases_immediately(tmp_path):
    """SIGKILL on the holder frees the lock at once (kernel-managed) —
    no orphan file blocks waiters and no staleness window applies."""
    target = str(tmp_path / "d")
    child = subprocess.Popen(
        [
            sys.executable,
            "-c",
            (
                "import sys, time;"
                f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r});"
                "from real_time_trip_processing_spark.locking import dir_write_lock\n"
                f"with dir_write_lock({target!r}):\n"
                "    print('held', flush=True)\n"
                "    time.sleep(60)\n"
            ),
        ],
        stdout=subprocess.PIPE,
        text=True,
    )
    try:
        assert child.stdout.readline().strip() == "held"
        child.kill()
        child.wait(10)
        t0 = time.monotonic()
        with dir_write_lock(target, timeout_sec=10):
            pass
        assert time.monotonic() - t0 < 5  # released with the process
    finally:
        if child.poll() is None:
            child.kill()


def test_unlink_race_hammer(tmp_path):
    """Rapid acquire/release churn across threads: the release-time
    unlink must never let two holders in (acquisition stat-verifies the
    locked inode against the lock path and retries on mismatch).
    A lost increment would expose a mutual-exclusion hole."""
    target = str(tmp_path / "d")
    counter = {"n": 0}
    rounds = 40

    def work():
        for _ in range(rounds):
            with dir_write_lock(target, timeout_sec=60):
                v = counter["n"]
                time.sleep(0.0005)  # widen the window a torn writer needs
                counter["n"] = v + 1

    threads = [threading.Thread(target=work) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert counter["n"] == 4 * rounds
    assert not os.path.exists(os.path.join(target, ".write_lock"))


def test_lake_lock_degrades_on_remote_schemes(tmp_path):
    """A remote lake root must RUN, not fail at entry — rejecting here
    would remove documented remote-lake functionality (round-6 review
    finding). Round 7: WITH a session the remote root takes the real
    CAS lease (tests/test_ivf_uri.py::test_lake_lock_takes_cas_lease);
    WITHOUT one — the only case where no lease can exist — it still
    degrades to unlocked with a loud warning. Local roots still
    flock."""
    import warnings

    from real_time_trip_processing_spark.operators.maintenance import (
        _lake_write_lock,
    )

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        with _lake_write_lock("hdfs://nn:8020/lake"):  # no session passed
            pass
    assert len(w) == 1 and "UNLOCKED" in str(w[0].message)

    # file:// is the LOCAL filesystem: it must take the REAL lock on
    # the decoded path so a file:///lake writer and a /lake writer
    # exclude each other (round-6 review: it previously ran unlocked)
    froot = str(tmp_path / "flake")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        with _lake_write_lock(f"file://{froot}"):
            import pytest

            with pytest.raises(TimeoutError):
                with dir_write_lock(froot, timeout_sec=0.3):
                    pass
    assert not w

    local = str(tmp_path / "lake")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        with _lake_write_lock(local):
            # the local path takes the real lock: a second waiter
            # inside the window must time out
            import pytest

            with pytest.raises(TimeoutError):
                with dir_write_lock(local, timeout_sec=0.3):
                    pass
    assert not w
