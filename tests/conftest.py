from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_trip_processing_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
REFERENCE_DATA = "/root/reference/data"

#: compiled MockRemoteFileSystem (tools/mock_fs) — a RawLocal-backed
#: Hadoop FS registered as the NON-file ``mock://`` scheme, so the
#: genuinely-remote dispatch branches (local_form() -> None, CAS lease,
#: FS-API staging) run on their true path instead of only via forced-CAS
#: file: URIs. Compiled on demand when javac + the hadoop jar exist.
MOCK_FS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "mock_fs",
)


def _mock_fs_classpath() -> str | None:
    cls = os.path.join(MOCK_FS_DIR, "sparkgraft", "MockRemoteFileSystem.class")
    if os.path.exists(cls):
        return MOCK_FS_DIR
    src = cls[: -len(".class")] + ".java"
    javac = shutil.which("javac")
    import pyspark

    jars = glob.glob(
        os.path.join(
            os.path.dirname(pyspark.__file__), "jars", "hadoop-client-api-*.jar"
        )
    )
    if not (javac and jars and os.path.exists(src)):
        return None
    try:
        subprocess.run(
            [javac, "-cp", jars[0], src],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        return None
    return MOCK_FS_DIR if os.path.exists(cls) else None


@pytest.fixture(scope="session")
def spark():
    cp = _mock_fs_classpath()
    extra = {"spark.driver.extraClassPath": cp} if cp else None
    s = get_spark("rtp-tests", shuffle_partitions=8, extra_conf=extra)
    if cp:
        # fs.<scheme>.impl is runtime-mutable on the Hadoop conf — only
        # the classpath had to be set before the JVM launched
        s.sparkContext._jsc.hadoopConfiguration().set(
            "fs.mock.impl", "sparkgraft.MockRemoteFileSystem"
        )
        s._mock_fs_ready = True
    yield s
    s.stop()


@pytest.fixture(scope="session")
def mock_fs(spark):
    """Path -> mock:// URI factory; skips when the mock FS class could
    not be compiled (no javac / no hadoop jar)."""
    if not getattr(spark, "_mock_fs_ready", False):
        pytest.skip("mock:// filesystem unavailable (javac or hadoop jar missing)")
    return lambda p: "mock://" + str(p)
