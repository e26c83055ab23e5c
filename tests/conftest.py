import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lamindb_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("lamindb-spark-tests", cpus=4)
    # small data → small shuffle fan-out keeps tests fast
    s.conf.set("spark.sql.shuffle.partitions", "4")
    yield s
    s.stop()


@pytest.fixture()
def lakehouse(spark, tmp_path):
    from lamindb_spark.catalog.lakehouse import Lakehouse

    return Lakehouse(spark, str(tmp_path / "lake"))


SF_DIR = "/root/testdata/sf0.001"
