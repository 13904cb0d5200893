"""Round-8 fsio/locking hardening (ADVICE r7 + VERDICT #4/#5):

- ``fs_create_exclusive`` classifies 'path exists' by exception CLASS
  NAME only — an unrelated FS error whose message contains "already
  exists" must propagate, not read as 'lock busy' and silently spin
  out the whole lease timeout;
- ``SPARK_GRAFT_FORCE_CAS_LOCK=1`` outside pytest emits a RuntimeWarning
  (the override weakens flock/CAS mutual exclusion with no other
  runtime signal);
- CAS acquisition on a pre-3.4.1 S3A stack warns that the primitive is
  check-then-put (the docstring caveat, surfaced where the operator
  sees it).
"""

from __future__ import annotations

import warnings

import pytest

from real_time_trip_processing_spark import fsio
from real_time_trip_processing_spark.fsio import (
    _is_exists_exception,
    fs_create_exclusive,
)


class _FakeJavaClass:
    def __init__(self, name):
        self._name = name

    def getName(self):
        return self._name


class _FakeJex:
    """Shape-compatible stand-in for a py4j Java exception object."""

    def __init__(self, cls_name, msg="", cause=None, remote_cls=None):
        self._cls = _FakeJavaClass(cls_name)
        self._msg = msg
        self._cause = cause
        self._remote_cls = remote_cls

    def getClass(self):
        return self._cls

    def getMessage(self):
        return self._msg

    def getCause(self):
        return self._cause

    def getClassName(self):  # only meaningful on RemoteException
        return self._remote_cls


class _FakePy4JError(Exception):
    def __init__(self, jex):
        super().__init__(str(jex.getMessage()))
        self.java_exception = jex


def test_exists_classification_is_by_class_name():
    assert _is_exists_exception(
        _FakeJex("org.apache.hadoop.fs.FileAlreadyExistsException")
    )
    assert _is_exists_exception(
        _FakeJex("org.apache.hadoop.fs.PathExistsException")
    )
    # the trap the round-7 substring match fell into: message mentions
    # "already exists" but the failure is NOT contention
    assert not _is_exists_exception(
        _FakeJex(
            "java.io.IOException",
            "Permission denied; note: a sibling already exists there",
        )
    )
    assert not _is_exists_exception(_FakeJex("java.io.IOException", ""))
    assert not _is_exists_exception(None)


def test_exists_classification_walks_cause_chain():
    inner = _FakeJex("org.apache.hadoop.fs.FileAlreadyExistsException")
    outer = _FakeJex("java.io.IOException", "wrapped", cause=inner)
    assert _is_exists_exception(outer)
    # cycle guard: self-referential cause chain terminates
    loop = _FakeJex("java.io.IOException", "loop")
    loop._cause = loop
    assert not _is_exists_exception(loop)


def test_exists_classification_unwraps_remote_exception():
    rex = _FakeJex(
        "org.apache.hadoop.ipc.RemoteException",
        "already exists on the namenode",
        remote_cls="org.apache.hadoop.fs.FileAlreadyExistsException",
    )
    assert _is_exists_exception(rex)
    rex_other = _FakeJex(
        "org.apache.hadoop.ipc.RemoteException",
        "file already exists (but the server-side class says otherwise)",
        remote_cls="org.apache.hadoop.security.AccessControlException",
    )
    assert not _is_exists_exception(rex_other)


def test_create_exclusive_propagates_non_exists_errors(spark, monkeypatch):
    """The failure mode the ADVICE named: a real FS error whose message
    happens to contain 'already exists' must raise immediately, not
    return False and poll until the lease timeout."""
    err = _FakePy4JError(
        _FakeJex("java.io.IOException", "quota exceeded; already exists?")
    )

    def boom(*a, **kw):
        raise err

    monkeypatch.setattr(fsio, "fs_write_text", boom)
    with pytest.raises(_FakePy4JError):
        fs_create_exclusive(spark, "file:///tmp/never-created", "x")


def test_create_exclusive_real_contention_still_false(spark, tmp_path):
    p = "file://" + str(tmp_path / "marker")
    assert fs_create_exclusive(spark, p, "first")
    assert not fs_create_exclusive(spark, p, "second")


def test_force_cas_override_warns_outside_pytest(spark, tmp_path, monkeypatch):
    from real_time_trip_processing_spark.functions.ivf_index import _index_lock

    monkeypatch.setenv("SPARK_GRAFT_FORCE_CAS_LOCK", "1")
    monkeypatch.delenv("PYTEST_CURRENT_TEST", raising=False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        with _index_lock("file://" + str(tmp_path / "i"), spark):
            pass
    assert any(
        issubclass(x.category, RuntimeWarning)
        and "FORCE_CAS_LOCK" in str(x.message)
        for x in w
    )


def test_force_cas_override_silent_inside_pytest(spark, tmp_path, monkeypatch):
    from real_time_trip_processing_spark.functions.ivf_index import _index_lock

    monkeypatch.setenv("SPARK_GRAFT_FORCE_CAS_LOCK", "1")
    assert "PYTEST_CURRENT_TEST" in __import__("os").environ
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        with _index_lock("file://" + str(tmp_path / "i"), spark):
            pass
    assert not [x for x in w if "FORCE_CAS_LOCK" in str(x.message)]


@pytest.fixture(autouse=True)
def _reset_cas_warning_memo():
    fsio._warned_non_atomic_cas.clear()
    yield
    fsio._warned_non_atomic_cas.clear()


def test_cas_warns_on_pre_341_s3a(spark, monkeypatch):
    monkeypatch.setattr(fsio, "_hadoop_version", lambda s: (3, 3, 6))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fsio._warn_if_cas_not_atomic(spark, "s3a://bucket/idx")
        # one-time: second call on the same scheme stays silent
        fsio._warn_if_cas_not_atomic(spark, "s3a://bucket/other")
    hits = [x for x in w if "check-then-put" in str(x.message)]
    assert len(hits) == 1
    assert issubclass(hits[0].category, RuntimeWarning)


def test_cas_silent_on_341_plus_or_non_s3(spark, monkeypatch):
    monkeypatch.setattr(fsio, "_hadoop_version", lambda s: (3, 4, 1))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fsio._warn_if_cas_not_atomic(spark, "s3a://bucket/idx")
        fsio._warn_if_cas_not_atomic(spark, "file:///tmp/idx")
        fsio._warn_if_cas_not_atomic(spark, "/plain/local")
    assert not [x for x in w if "check-then-put" in str(x.message)]


def test_cas_warns_when_version_probe_fails(spark, monkeypatch):
    def boom(s):
        raise RuntimeError("no VersionInfo")

    monkeypatch.setattr(fsio, "_hadoop_version", boom)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fsio._warn_if_cas_not_atomic(spark, "s3a://bucket/idx")
    assert [x for x in w if "check-then-put" in str(x.message)]


def test_hadoop_version_parses_real_stack(spark):
    v = fsio._hadoop_version(spark)
    assert isinstance(v, tuple) and v >= (3,)
