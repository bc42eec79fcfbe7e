from __future__ import annotations

import pytest

from etl_opensky_spark.session import get_spark


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    spark = get_spark(
        app_name="etl_opensky_spark_tests",
        shuffle_partitions=4,
        warehouse_dir=str(warehouse),
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield spark


def rows(df):
    """Deterministic list-of-tuples view of a small DataFrame."""
    return sorted(tuple(r) for r in df.collect())
