import sys

import pytest

sys.path.insert(0, "/root/repo")

from iceberg_hybrid_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", shuffle_partitions=4, extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests",
    })
    yield spark


@pytest.fixture()
def tmp_table_root(tmp_path):
    return str(tmp_path / "tbl")
