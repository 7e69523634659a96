from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from json_time_series_extractor_spark.plans.session import get_spark

    session = get_spark(
        app_name="jtse-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield session
