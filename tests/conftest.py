from __future__ import annotations

import pytest

from nilinker_spark.config import get_spark
from nilinker_spark.fixtures.kb import make_kb
from nilinker_spark.fixtures.webtext import make_webtext


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="nilinker_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def kb():
    return make_kb(seed=42)


@pytest.fixture(scope="session")
def webtext_rows(kb):
    return make_webtext(kb, seed=42, n_rows=400)


@pytest.fixture(scope="session")
def webtext_df(spark, kb, webtext_rows):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(webtext_rows, schema).cache()
