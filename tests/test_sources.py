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


def test_variant_shred_typed_extraction(spark):
    """parse_json -> try_variant_get must agree with the string-path
    get_json_object extraction row-for-row (same parse, binary encoding)."""
    from pyspark.sql import functions as F
    from kafka_pyspark_bigdata_spark.sources.batch import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    both = ev.select(
        F.try_variant_get(F.parse_json("props"), "$.k", "int").alias("v"),
        F.get_json_object("props", "$.k").cast("int").alias("s"),
    )
    assert both.filter(~F.col("v").eqNullSafe(F.col("s"))).count() == 0
