from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_trip_processing_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
REFERENCE_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rtp-tests", shuffle_partitions=8)
    yield s
    s.stop()
