import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from ib_tool_spark.pipeline import get_spark

    s = get_spark(app="ib_tool_spark_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
