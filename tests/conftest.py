from __future__ import annotations

import pytest

from variant_load_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="vlp-tests", shuffle_partitions=4)
    yield s
