import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("basenine-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "churn10k: reference-scale 10,000-connection churn parity "
        "(client_test.go:180-185); opt-in via BN_CHURN_10K=1 — "
        "~30-60 s of pure socket churn, excluded from the CI budget",
    )
