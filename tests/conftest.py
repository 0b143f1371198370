from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import SparkSession

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # warehouse dir is a static conf (needed by bucketed-table tests);
    # keep metastore artifacts out of the repo tree
    warehouse = tempfile.mkdtemp(prefix="svs_warehouse_")
    s = (
        SparkSession.builder.master("local[4]")
        .appName("svs-tests")
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SVS_TEST_DRIVER_MEM", "4g"))
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("WARN")
    yield s
    s.stop()
