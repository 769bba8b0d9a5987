"""Oracle-compare every relational query at sf0.001 (fast smoke of the same
gate the driver runs at sf0.01)."""

from __future__ import annotations

import pytest

from kafka_pyspark_bigdata_spark.plans import relational

from conftest import assert_oracle_match


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_oracle(spark, duck, name):
    assert_oracle_match(
        spark, duck, relational.QUERIES[name], relational.ORACLES[name]
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"l_returnflag", "sum_qty", "count_order"} <= set(df.columns)


def test_registry_consistency():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 17
