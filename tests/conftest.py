from __future__ import annotations

import pytest

from etl_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        app_name="etl_spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/etl_spark_warehouse"},
    )
    yield s
