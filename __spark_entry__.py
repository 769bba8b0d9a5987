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


# Round-12 rotation. Coverage remains closed (driver union r01..r11 =
# all 360 then-registered names, set-equal both directions per VERDICT
# r11). This round adds 12 queries, ALL oracle-backed (-> 372 = 357
# oracle-backed + 15 rows-only). Per the r11 ADVICE rule, the window's
# "changed" set covers any name whose PLAN OR ORACLE SQL text changed
# since its last driver check. The ~50-name driver window is spent on:
# (1) the 12 r12 additions; (2) the 2 names whose plan AND oracle
# changed this round (the fineweb array_sort hoist + strlen->length,
# the repeated-lines chunk pin + strlen->length); (3) emb_mrl_recall,
# whose ORACLE builder was fixed in r11 (6c82798) but sat outside the
# r11 window — the exact gap the new rule closes; then (4)
# re-verification depth ordered by the age of each name's LAST driver
# check (computed from CORRECTNESS_r01..r11): the 11 names last
# checked in r02, then the r03 tail in name order (the remainder of
# r03 — 15 names from q_recursive_bom on — rolls to r13).
_PRIORITY = [
    # -- new in r12 (12) --
    "text_bpe_multiround",
    "corpus_dsir_selection",
    "corpus_unimax_budget",
    "corpus_doremi_weights",
    "cluster_prototype_prune",
    "text_readability_fk",
    "ts_matrix_profile_paa",
    "sketch_ddsketch_quantile",
    "emb_ood_mahalanobis",
    "q_vacuum_eligibility",
    "graph_resource_allocation",
    # -- plan + oracle changed in r12 (2) --
    "quality_fineweb_rules",
    "dedup_repeated_lines",
    # -- oracle changed in r11, missed by the r11 window (1) --
    "emb_mrl_recall",
    # -- oldest driver checks: last verified in r02 (11) --
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
    # -- next-oldest: last verified in r03 (first 27 in name order;
    #    the rest of r03 rolls to r13) --
    "ann_mrr_eval",
    "corpus_ablation_grid",
    "corpus_epoch_shuffle",
    "corpus_span_corruption",
    "dedup_record_linkage",
    "ml_target_encoding",
    "q_array_analytics",
    "q_arrow_udf_checksum",
    "q_asof_click_purchase",
    "q_collated_group",
    "q_encoding_stats",
    "q_funnel",
    "q_hilbert_skipping",
    "q_ingest_quarantine",
    "q_interval_concurrency",
    "q_lateral_topk",
    "q_lead_gap",
    "q_merge_upsert",
    "q_nested_roundtrip",
    "q_not_in_null_trap",
    "q_observe_metrics",
    "q_pandas_api_rollup",
    "q_python_datasource",
    "q_range_frame_sum",
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
