"""Oracle smoke + invariants for the corpus-quality operators
(repetition stats, PII scrub)."""

from __future__ import annotations

import pytest

from kafka_pyspark_bigdata_spark.operators import quality

from conftest import SF_SMOKE, assert_oracle_match


@pytest.mark.parametrize("name", sorted(quality.QUERIES))
def test_quality_oracle(spark, duck, name):
    assert_oracle_match(spark, duck, quality.QUERIES[name], quality.ORACLES[name])


def test_repetition_bounds(spark):
    """Fractions live in [0,1]; the top unigram occurs at least as often
    as the top bigram (a bigram's count is bounded by its first word's)."""
    df = quality.text_repetition(spark, SF_SMOKE)
    assert df.filter("dup_word_frac < 0 OR dup_word_frac > 1").count() == 0
    assert df.filter("top_unigram_frac <= 0 OR top_unigram_frac > 1").count() == 0
    assert df.filter("top_bigram_n > top_unigram_n").count() == 0


def test_pii_scrub_redacts_all(spark):
    """After redaction the injected email+phone are gone from every head;
    every doc detects at least one of each (the synthetic header)."""
    df = quality.text_pii_scrub(spark, SF_SMOKE)
    assert df.filter("n_emails < 1 OR n_phones < 1").count() == 0
    assert df.filter("redacted_head LIKE '%@example.com%'").count() == 0
    assert df.filter("redacted_head NOT LIKE '%<EMAIL>%'").count() == 0


def test_quality_floor_decile_bound(spark):
    """A P10 floor can drop at most ceil(n/10) documents per language, and
    kept + dropped must tile the language exactly."""
    from kafka_pyspark_bigdata_spark.operators import quality

    for r in quality.corpus_quality_floor(spark, "/root/testdata/sf0.001").collect():
        assert r.n_kept + r.n_dropped == r.n_docs
        assert r.n_dropped <= (r.n_docs + 9) // 10
