import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")


@pytest.fixture(scope="session")
def spark():
    from geist_spark.session import get_spark

    s = get_spark("geist_spark_tests")
    yield s


def event_df(spark, *events: str):
    """Helper: build a one-column events DataFrame (value: string)."""
    return spark.createDataFrame([(e,) for e in events], "value string")
