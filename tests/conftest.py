from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark import (
        get_spark,
    )

    # Small local session for tests: fewer cores/partitions than the bench
    # config so the suite stays fast on tiny data.
    spark = get_spark(
        app_name="fabric-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield spark
