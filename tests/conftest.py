import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")

if REPO not in sys.path:
    sys.path.insert(0, REPO)

# opt in to the mock:// test scheme BEFORE any Spark JVM spawns, so
# executor python workers inherit the flag (the production remote-FS
# registry is empty by default — see sources/remote_fs.py)
os.environ.setdefault("WARCIO_SPARK_MOCK_FS", "1")


def reference_corpus_dir():
    return os.path.join(REFERENCE, "test", "data")


@pytest.fixture(scope="session")
def corpus_dir():
    return reference_corpus_dir()


@pytest.fixture(scope="session")
def warcio():
    """The reference library itself, used as a runtime ORACLE (never copied)."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import warcio  # noqa

    return warcio


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("warcio_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.path.join(TESTDATA, "sf0.001")
