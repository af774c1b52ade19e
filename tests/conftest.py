from __future__ import annotations

import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, ".")

from webcrawler_go_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.session.timeZone": "UTC"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def state_dir():
    d = tempfile.mkdtemp(prefix="crawl-state-")
    yield d
    shutil.rmtree(d, ignore_errors=True)
