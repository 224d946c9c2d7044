from __future__ import annotations

import pytest

from project_samanvay_a_true_hybrid_htap_database_spark import SamanvayEngine, get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="samanvay-tests", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture()
def engine(spark):
    return SamanvayEngine(spark)
