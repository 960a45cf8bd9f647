from __future__ import annotations

import pytest

from amanogawa_spark.fixtures.pages import generate_pages
from amanogawa_spark.session import get_spark


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    # warehouse in a temp dir so bucketed-table tests never write build
    # artifacts into the repo root
    wh = str(tmp_path_factory.mktemp("spark_warehouse"))
    s = get_spark(
        cpus=8,
        app_name="amanogawa_tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s


@pytest.fixture(scope="session")
def corpus():
    return generate_pages(n_pages=300, seed=7)


@pytest.fixture(scope="session")
def pages_df(spark, corpus):
    df = spark.createDataFrame(corpus.pages)
    df = df.persist()
    df.count()
    return df
