"""Invariants for the round-3 corpus/statistics additions: n-gram
novelty, equi-depth histogram, and native session_window parity.
(Oracle equality for each is covered by the parametrized module tests;
these pin the semantic contracts.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_pyspark_bigdata_spark.operators import dedup
from kafka_pyspark_bigdata_spark.plans import advanced, analytic
from kafka_pyspark_bigdata_spark.sources.batch import load_table

from conftest import SF_SMOKE


def test_novelty_first_doc_is_all_novel(spark):
    """The smallest doc_id in the corpus sees every shingle first, so its
    novelty is exactly 1.0; total novel shingles == distinct corpus
    shingles (each counted exactly once at its first occurrence)."""
    df = dedup.corpus_ngram_novelty(spark, SF_SMOKE).cache()
    first = df.orderBy("doc_id").first()
    assert first.novelty_ppm == 1_000_000
    n_novel_total = df.agg(F.sum("n_novel")).first()[0]
    n_distinct_shingles = (
        dedup.with_shingles(load_table(spark, SF_SMOKE, "documents"))
        .select(F.explode("shingles").alias("s"))
        .select("s")
        .distinct()
        .count()
    )
    assert n_novel_total == n_distinct_shingles
    df.unpersist()


def test_equidepth_buckets_balanced(spark):
    """Bucket populations sum to the table count; buckets are value-
    disjoint and ordered; each bucket holds ≥ floor(n/B) rows minus the
    largest tie run (a distinct value never splits across buckets)."""
    df = analytic.q_hist_equidepth(spark, SF_SMOKE).collect()
    li_n = load_table(spark, SF_SMOKE, "lineitem").count()
    assert sum(r.n_rows for r in df) == li_n
    for a, b in zip(df, df[1:]):
        assert a.hi_cents < b.lo_cents
    assert all(r.lo_cents <= r.hi_cents for r in df)
    assert len(df) <= analytic.EQUIDEPTH_BUCKETS


def test_geo_grid_pairs_matches_bruteforce(spark):
    """The grid-bucketed spatial join finds EXACTLY the brute-force
    all-pairs in-radius set (candidate completeness: RADIUS ≤ CELL ⇒
    the 3×3 neighborhood covers every in-radius pair)."""
    from kafka_pyspark_bigdata_spark.operators.geo import (
        GEO_RADIUS,
        _points,
        geo_grid_pairs,
    )

    got = {
        (r.user_a, r.user_b, r.dist_sq)
        for r in geo_grid_pairs(spark, SF_SMOKE).collect()
    }
    pts = {(r.user_id, r.lat, r.lon) for r in _points(spark, SF_SMOKE).collect()}
    want = set()
    pl = sorted(pts)
    for i, (ua, la, lo) in enumerate(pl):
        for ub, lb, lo2 in pl[i + 1 :]:
            d2 = (la - lb) ** 2 + (lo - lo2) ** 2
            if d2 <= GEO_RADIUS * GEO_RADIUS:
                want.add((ua, ub, d2))
    assert got == want
    assert len(got) > 0


def test_bloom_fpr_consistent_with_prune(spark):
    """The bloom eval's confusion counts line up with q_bloom_prune's
    member/candidate sets: zero false negatives (bloom invariant), and
    fpr_ppm is the integer-ppm of the reported counts."""
    from kafka_pyspark_bigdata_spark.plans.lakehouse import sketch_bloom_fpr_eval

    r = sketch_bloom_fpr_eval(spark, SF_SMOKE).first()
    assert r.n_false_negatives == 0
    assert r.fpr_ppm == r.n_false_positives * 1_000_000 // r.n_nonmembers
    assert 0 < r.n_bits_set <= 512


def test_session_window_native_matches_islands(spark):
    """Native session_window conserves events and produces the same
    session count as the gap-island formulation at the same 4h gap
    (the fixture has no events exactly on the gap boundary, where the
    two formulations' >= vs > conventions would differ)."""
    native = advanced.q_session_window_native(spark, SF_SMOKE)
    ev_n = load_table(spark, SF_SMOKE, "events").count()
    agg = native.agg(
        F.sum("n_events").alias("tot"), F.count(F.lit(1)).alias("n_sessions")
    ).first()
    assert agg.tot == ev_n
    islands = advanced.q_sessionize(spark, SF_SMOKE).count()
    assert agg.n_sessions == islands


def test_simhash_pairs_match_bruteforce(spark):
    """Hamming-band candidate generation is COMPLETE and exact: the pair
    set equals brute-force hamming ≤ 3 over all wide-fingerprint pairs
    (pigeonhole: 3 flipped bits cannot dirty all 4 bands)."""
    from kafka_pyspark_bigdata_spark.operators.dedup import (
        SIMHASH_HAM_MAX,
        _wide_simhash,
        dedup_simhash_pairs,
    )

    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup_simhash_pairs(spark, SF_SMOKE).collect()
    }
    fps = sorted(
        (r.doc_id, r.simhash) for r in _wide_simhash(spark, SF_SMOKE).collect()
    )
    want = set()
    for i, (da, fa) in enumerate(fps):
        for db, fb in fps[i + 1 :]:
            hd = bin(fa ^ fb).count("1")
            if hd <= SIMHASH_HAM_MAX:
                want.add((da, db, hd))
    assert got == want


def test_cusum_closed_form_matches_recursion(spark):
    """The prefix-min closed form equals the textbook CUSUM recursion
    s_t = max(0, s_{t-1} + x_t), replayed in the driver per type."""
    from collections import defaultdict

    from kafka_pyspark_bigdata_spark.plans.behavioral import q_cusum_anomaly
    from kafka_pyspark_bigdata_spark.sources.batch import load_table

    got = q_cusum_anomaly(spark, SF_SMOKE).collect()
    daily = defaultdict(dict)
    for r in (
        load_table(spark, SF_SMOKE, "events")
        .selectExpr("event_type", "CAST(ts AS DATE) AS d")
        .groupBy("event_type", "d")
        .count()
        .collect()
    ):
        daily[r.event_type][str(r.d)] = r["count"]
    for et, days in daily.items():
        n, tot = len(days), sum(days.values())
        s = 0
        expect = {}
        for d in sorted(days):
            s = max(0, s + days[d] * n - tot)
            expect[d] = s
        for r in (x for x in got if x.event_type == et):
            assert r.cusum_scaled == expect[r.d], (et, r.d)
            assert r.cusum_scaled >= 0


def test_jl_distortion_concentrates(spark):
    """JL lemma sanity: per-vector norm distortion is positive and its
    corpus mean sits near 1 (within 25% for 16 ±1 directions on 64-dim
    inputs) — the property that makes oblivious projection usable."""
    from kafka_pyspark_bigdata_spark.operators.similarity import (
        emb_jl_projection_eval,
    )

    rows = emb_jl_projection_eval(spark, SF_SMOKE).collect()
    assert all(r.distortion_ppm >= 0 for r in rows)
    mean = sum(r.distortion_ppm for r in rows) / len(rows)
    assert 750_000 < mean < 1_250_000, mean


def test_ohlc_and_twap_invariants(spark):
    """OHLC bars: low ≤ open/close ≤ high, positive volume; TWAP sits
    inside each user's [min, max] value range (weighted-mean bound)."""
    from kafka_pyspark_bigdata_spark.plans.behavioral import (
        q_ohlc_bars,
        q_time_weighted_avg,
    )

    bars = q_ohlc_bars(spark, SF_SMOKE)
    assert (
        bars.filter(
            "open < low OR open > high OR close < low OR close > high"
            " OR volume < 1"
        ).count()
        == 0
    )
    ev = load_table(spark, SF_SMOKE, "events").selectExpr(
        "user_id", "CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents"
    )
    bounds = ev.groupBy("user_id").agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    joined = q_time_weighted_avg(spark, SF_SMOKE).join(bounds, "user_id")
    assert joined.filter("twap_cents < lo OR twap_cents > hi").count() == 0


def test_vocab_growth_monotone_and_bounded(spark):
    """Vocabulary growth: both curves are nondecreasing, vocab never
    exceeds cumulative tokens, and the final vocab equals the corpus's
    distinct token count."""
    from kafka_pyspark_bigdata_spark.operators.text import (
        load_documents,
        text_vocab_growth,
        with_tokens,
    )

    rows = text_vocab_growth(spark, SF_SMOKE).collect()
    for a, b in zip(rows, rows[1:]):
        assert b.cum_tokens >= a.cum_tokens and b.vocab_size >= a.vocab_size
    assert all(r.vocab_size <= r.cum_tokens for r in rows)
    n_types = (
        with_tokens(load_documents(spark, SF_SMOKE))
        .select(F.explode("toks").alias("t"))
        .distinct()
        .count()
    )
    assert rows[-1].vocab_size == n_types


def test_dau_mau_bounds(spark):
    """DAU ≤ MAU on every day (30-day window contains the day), so
    stickiness ≤ 1e6 ppm; all counts positive."""
    from kafka_pyspark_bigdata_spark.plans.behavioral import q_dau_mau_stickiness

    rows = q_dau_mau_stickiness(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 < r.dau <= r.mau
        assert 0 < r.stickiness_ppm <= 1_000_000
