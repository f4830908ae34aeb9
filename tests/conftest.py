from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_TEST_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from etl_utils_spark.session import get_spark

    spark = get_spark(
        app_name="etl-utils-spark-tests",
        cpus=8,
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="etl_spark_wh_")
        },
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_TEST_DIR


@pytest.fixture(scope="session")
def spark_prop(spark):
    """Alias for hypothesis-driven tests (session-scoped reuse is the
    point — health checks for function-scoped fixtures are suppressed
    at the test site)."""
    return spark
