from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from kafka_pyspark_bigdata_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con


def assert_oracle_match(spark, duck, fn, sql, sf_dir=SF_SMOKE):
    """Spark-vs-DuckDB compare (same normalization as tools/check_oracle)."""
    sys.path.insert(0, "/root/repo/tools")
    from check_oracle import compare

    sdf = fn(spark, sf_dir).toPandas()
    odf = duck.execute(sql).df()
    problems = compare("q", sdf, odf)
    assert not problems, problems
    return sdf
