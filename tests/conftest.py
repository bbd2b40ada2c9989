import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("LHP_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from lakehouse_plumber_spark import get_spark

    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def testdata(spark):
    from lakehouse_plumber_spark import register_testdata

    return register_testdata(spark, SF_DIR)


@pytest.fixture()
def runner(spark, tmp_path):
    from lakehouse_plumber_spark.runner import PipelineRunner
    from lakehouse_plumber_spark.tables import ParquetTableStore

    return PipelineRunner(spark, store=ParquetTableStore(spark=spark, root=str(tmp_path)))
