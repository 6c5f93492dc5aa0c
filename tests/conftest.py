from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from aind_exaspim_data_transformation_spark.session import get_spark

    spark = get_spark("engine-tests", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
