import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from tradingview_data_pipeline_spark.session import get_spark
    s = get_spark("tests", master="local[4]",
                  extra_conf={
                      "spark.sql.shuffle.partitions": "4",
                      "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="wh_"),
                  })
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
