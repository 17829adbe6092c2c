import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meresco_lucene_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="mls-tests",
        cores=int(os.environ.get("SPARK_TEST_CPUS", "4")),
        shuffle_partitions=4,
        driver_memory="4g",
    )
    yield s


SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"
