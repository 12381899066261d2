from __future__ import annotations

import pytest

from grass_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "grass_spark_tests", cores=4, shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/grass_spark_test_warehouse"},
    )
    yield s
