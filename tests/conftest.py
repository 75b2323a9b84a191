import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dexspark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="dexspark-tests",
        master=os.environ.get("DEXSPARK_TEST_MASTER", "local[4]"),
        shuffle_partitions=4,
        extra_conf={"spark.sql.sources.partitionOverwriteMode": "dynamic"},
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_warehouse(tmp_path):
    return str(tmp_path)
