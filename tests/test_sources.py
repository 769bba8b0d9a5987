"""Oracle-compare the source/sink contract queries at sf0.001."""

from __future__ import annotations

import pytest

from kafka_pyspark_bigdata_spark.sources import queries as src

from conftest import assert_oracle_match


@pytest.mark.parametrize("name", sorted(src.QUERIES))
def test_source_oracle(spark, duck, name):
    assert_oracle_match(spark, duck, src.QUERIES[name], src.ORACLES[name])


def test_binaryfile_scan_is_bounded_and_declarative(spark):
    """The scratch layout is capped at BINARYFILE_N_DOCS files and the
    scan itself plans as a FileScan (no driver-side reads)."""
    df = src.q_binaryfile_scan(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert 0 < len(rows) <= src.BINARYFILE_N_DOCS
    assert all(r.n_bytes > 0 and len(r.content_md5) == 32 for r in rows)
    assert "binaryFile" in df._jdf.queryExecution().executedPlan().toString()
