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


# Round-10 rotation. Coverage remains closed (driver union r01..r09 =
# all 342 then-registered names, set-equal both directions per VERDICT
# r09). This round adds 9 queries: 8 oracle-backed plus the rows-only
# ml_isotonic_calibration (-> 351 = 336 oracle-backed + 15 rows-only).
# The ~50-name driver window is spent on: (1) the 9 r10 additions,
# (2) the 3 names whose CODE PATH changed this round (review fixes:
# emb_isotropy_score's overflow-safe divisor, cluster_kcenter_greedy's
# seed guard, ml_calibration_bins' plan pin), then (3) re-verification
# depth: the rows-only contract entries and the relational/TPC-H core
# whose last driver check is oldest (r01/r02, re-covered r09 — keep
# them in the window tail so any driver budget beyond the must-checks
# lands on the oldest names).
_PRIORITY = [
    # -- new in r10 (9) --
    "quality_gopher_repetition",
    "emb_abtt_postprocess",
    "ann_ivf_spill",
    "q_partition_evolution",
    "quality_ccnet_buckets",
    "ann_filtered_search",
    "ts_holt_linear",
    "dedup_keep_best_quality",
    "ml_isotonic_calibration",
    # -- code path changed in r10 (review fixes, 3) --
    "emb_isotropy_score",
    "cluster_kcenter_greedy",
    "ml_calibration_bins",
    # -- re-verification depth: rows-only contract entries (fast ones) --
    "streaming_count_batcher",
    "ml_feature_importances",
    "ml_predict_grid",
    "ml_sensitivity_quantity",
    "ml_optimal_hour",
    "ml_lift_deciles",
    "ml_eval_rmse",
    "ml_predict_loaded",
    # -- re-verification depth: oldest-verified relational/TPC-H core --
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q_tz_daily_rollup",
    "q_top_customers",
    "q_rollup_acctbal",
    "q_window_top_orders",
    "q_semi_join",
    "q_anti_join",
    "q_distinct_flags",
    "q_union_all",
    "q_topk_orders",
    "q_between_sort",
    "q_cast_default_json",
    "q_null_drop",
    "q_mean_impute",
    "q_sweep_hours",
    "q_events_hourly",
    # -- slow rows-only tail (2.7-6.6s each at sf0.01) --
    "ml_permutation_importance",
    "ml_classifier_auc",
    "ml_quality_classifier",
    "ml_grid_search",
    "ml_incremental_versions",
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
