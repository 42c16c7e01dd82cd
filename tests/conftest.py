from __future__ import annotations

import pytest

from connected_components_3d_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cc3d-spark-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
