from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from generative_ai_vector_db_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_T2 = os.environ.get("SPARK_GRAFT_T2_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    import tempfile

    s = get_session(
        app_name="gavd-spark-tests",
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[8]"),
        shuffle_partitions=8,
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        extra_conf={
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="gavd_wh_")
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def sf_dir_t2():
    return SF_DIR_T2
