import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from layout_parser_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "lps-tests",
        master="local[4]",
        extra_conf={"spark.sql.shuffle.partitions": "4"},
    )
    yield s


@pytest.fixture(scope="session")
def ev(spark):
    """Evaluate column expressions against a single-row DataFrame and
    return the collected Row."""

    def _ev(*cols):
        return spark.range(1).select(*cols).collect()[0]

    return _ev
