from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from ditto_spark.session import get_spark

    s = get_spark("ditto_spark_tests", cores=4, shuffle_partitions=4)
    yield s
