from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from axosyslog_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8, shuffle_partitions=8)
    s.conf.set("spark.sql.session.timeZone", "UTC")
    yield s
