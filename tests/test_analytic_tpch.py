"""Oracle smoke for the analytic window/set/sketch module and the
extended TPC-H shapes at sf0.001 (same compare as the driver gate)."""

from __future__ import annotations

import pytest

from kafka_pyspark_bigdata_spark.plans import analytic, tpch_extra

from conftest import assert_oracle_match

CASES = [(analytic, n) for n in sorted(analytic.QUERIES)] + [
    (tpch_extra, n) for n in sorted(tpch_extra.QUERIES)
]


@pytest.mark.parametrize("mod,name", CASES, ids=[n for _, n in CASES])
def test_plan_oracle(spark, duck, mod, name):
    assert_oracle_match(spark, duck, mod.QUERIES[name], mod.ORACLES[name])


def test_quantiles_monotone_and_mad_bounds(spark):
    SF = "/root/testdata/sf0.001"
    q = analytic.q_quantiles_exact(spark, SF).collect()
    for r in q:
        assert r.p25 <= r.p50 <= r.p75 <= r.p95
    m = analytic.q_mad_outliers(spark, SF).collect()
    for r in m:
        assert 0 <= r.n_outliers <= r.n and r.mad >= 0
