from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from gh_crawler_spark.session import get_spark

    s = get_spark("tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
