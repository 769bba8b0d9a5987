"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 as a smoke check.
``queries()``/``oracle_sql()`` aggregate every implemented operator's
(spark, sf_dir) -> DataFrame callable and its DuckDB oracle SQL from the
engine's query modules. Queries without an oracle entry (ML / streaming —
not SQL-expressible) get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"

# ROWS-ONLY BY CONTRACT — the complete list of queries() entries with no
# oracle_sql() counterpart, so the driver record's `no_oracle` rows are
# self-explaining. All are RandomForest model internals (training,
# inference, importances, grid/permutation sweeps — not SQL-expressible)
# except streaming_count_batcher (count-triggered micro-batch boundaries
# are an execution artifact, not a relational result). Each has pytest
# coverage asserting its semantic contract instead.
ROWS_ONLY = frozenset({
    "ml_lift_deciles",
    "ml_classifier_auc",
    "ml_calibration_bins",
    "ml_isotonic_calibration",
    "ml_quality_classifier",
    "ml_permutation_importance",
    "ml_grid_search",
    "ml_feature_importances",
    "ml_eval_rmse",
    "ml_predict_grid",
    "ml_sensitivity_quantity",
    "ml_optimal_hour",
    "ml_predict_loaded",
    "ml_incremental_versions",
    "streaming_count_batcher",
})


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    from kafka_pyspark_bigdata_spark.plans import relational

    return relational.q1_pricing_summary(spark, SF0001)


def _modules():
    # Registration order drives the driver's correctness sweep, which covers
    # only a prefix of the registry (~50 queries in round 2). Modules the
    # driver has never verified — and the families fixed this round — come
    # first; the relational/TPC-H core (driver-green in rounds 1 AND 2)
    # registers last.
    import importlib

    mods = []
    # Never-driver-verified families first (CORRECTNESS_r01/r02 covered
    # relational, advanced, tpch_extra, and the head of analytic): the
    # LLM-pipeline operator modules, then lakehouse/sources/streaming/ml,
    # then the already-twice-green families.
    for modpath in (
        "kafka_pyspark_bigdata_spark.operators.timeseries",
        "kafka_pyspark_bigdata_spark.plans.mining",
        "kafka_pyspark_bigdata_spark.operators.geo",
        "kafka_pyspark_bigdata_spark.plans.behavioral",
        "kafka_pyspark_bigdata_spark.operators.dedup",
        "kafka_pyspark_bigdata_spark.operators.similarity",
        "kafka_pyspark_bigdata_spark.operators.text",
        "kafka_pyspark_bigdata_spark.operators.quality",
        "kafka_pyspark_bigdata_spark.operators.multimodal",
        "kafka_pyspark_bigdata_spark.operators.pipeline",
        "kafka_pyspark_bigdata_spark.plans.lakehouse",
        "kafka_pyspark_bigdata_spark.sources.queries",
        "kafka_pyspark_bigdata_spark.streaming.queries",
        "kafka_pyspark_bigdata_spark.ml.queries",
        "kafka_pyspark_bigdata_spark.plans.analytic",
        "kafka_pyspark_bigdata_spark.plans.advanced",
        "kafka_pyspark_bigdata_spark.plans.relational",
        "kafka_pyspark_bigdata_spark.plans.tpch_extra",
    ):
        try:
            mods.append(importlib.import_module(modpath))
        except ModuleNotFoundError:
            pass
    return mods


# Round-11 rotation. Coverage remains closed (driver union r01..r10 =
# all 351 then-registered names, set-equal both directions per VERDICT
# r10). This round adds 9 queries, ALL oracle-backed (-> 360 = 345
# oracle-backed + 15 rows-only). The ~50-name driver window is spent
# on: (1) the 9 r11 additions, (2) the 8 names whose CODE PATH changed
# this round (the gopher-repetition claim cap + zero-token guard, the
# abtt qa zero-guard, and the six ml_* queries now sharing cached
# seed-42 fits), then (3) re-verification depth ordered by the age of
# each name's LAST driver check (computed from CORRECTNESS_r01..r10):
# the 13 names last checked in r01, then the r02 tail — the true
# oldest checks in the record.
_PRIORITY = [
    # -- new in r11 (9) --
    "dedup_repeated_lines",
    "quality_fineweb_rules",
    "text_tokenizer_fertility",
    "graph_hits",
    "ts_changepoint_cusum",
    "q_zorder_clustering",
    "emb_matryoshka_eval",
    "corpus_upsampling_epochs",
    "emb_sq_recall",
    # -- code path changed in r11 (guards + shared fits, 8) --
    "quality_gopher_repetition",
    "emb_abtt_postprocess",
    "ml_eval_rmse",
    "ml_lift_deciles",
    "ml_permutation_importance",
    "ml_classifier_auc",
    "ml_calibration_bins",
    "ml_isotonic_calibration",
    # -- oldest driver checks: last verified in r01 (13) --
    "ann_lsh_bucketed",
    "ann_topk_bruteforce",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "mm_decode_image",
    "mm_frame_sample",
    "streaming_hourly_window",
    "text_fingerprint",
    "text_langid",
    "text_quality",
    "text_token_stats",
    # -- next-oldest: last verified in r02 (the TPC-H/analytic tail; the
    #    remainder past the ~50-name window rolls to r12) --
    "q2_min_metric_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_priority_counts",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_parts_supplier_cnt",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_discounted_revenue",
    "q20_part_promotion",
    "q21_waiting_supplier",
    "q22_rich_idle_customers",
    "q_argmax_events",
    "q_count_distinct_suppliers",
    "q_cube_order_stats",
    "q_exact_median",
    "q_histogram_drift",
    "q_key_skew_stats",
    "q_nested_collect_explode",
    "q_pivot_user_events",
    "q_quantiles_exact",
    "q_range_join_error_context",
    "q_skyline_pareto",
    "sketch_join_cardinality",
]


def _ordered(raw: dict) -> dict:
    out = {k: raw[k] for k in _PRIORITY if k in raw}
    out.update(raw)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(getattr(mod, "QUERIES", {}))
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLES", {}))
    return _ordered(out)
