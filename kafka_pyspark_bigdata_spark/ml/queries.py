"""ML driver-contract queries (rows-only checks — model training/inference
is not SQL-expressible, so no DuckDB oracle; the driver records row counts).

Models are trained on the fixture tables (deterministic: seed=42, fixed
file layout, fixed partitioning) and cached per sf_dir so the four queries
share two trainings.
"""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table
from . import serving, trainer

LINEITEM_FEATURES = ["l_quantity", "l_discount", "l_tax", "l_linenumber"]
LINEITEM_LABEL = "l_extendedprice"
EVENTS_FEATURES = ["hour", "dow"]
EVENTS_LABEL = "value"

_model_cache: dict[tuple[str, str], PipelineModel] = {}


def _lineitem_model(spark: SparkSession, sf_dir: str) -> PipelineModel:
    key = (sf_dir, "lineitem")
    if key not in _model_cache:
        df = load_table(spark, sf_dir, "lineitem")
        _model_cache[key] = trainer.train(df, LINEITEM_FEATURES, LINEITEM_LABEL)
    return _model_cache[key]


def _events_model(spark: SparkSession, sf_dir: str) -> PipelineModel:
    key = (sf_dir, "events")
    if key not in _model_cache:
        df = load_table(spark, sf_dir, "events").select(
            F.hour("ts").alias("hour"),
            F.dayofweek("ts").alias("dow"),
            "value",
        )
        _model_cache[key] = trainer.train(df, EVENTS_FEATURES, EVENTS_LABEL)
    return _model_cache[key]


def ml_feature_importances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O19: feature-importance extract + DESC sort, as a DataFrame."""
    model = _lineitem_model(spark, sf_dir)
    return trainer.feature_importances(spark, model, LINEITEM_FEATURES)


def ml_predict_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O20-O23: in-memory row source with explicit schema → batch
    inference over a fixed 30-point grid."""
    model = _lineitem_model(spark, sf_dir)
    grid = [
        {"l_quantity": float(q), "l_discount": d, "l_tax": 0.05, "l_linenumber": 1.0}
        for q in range(1, 11)
        for d in (0.0, 0.05, 0.10)
    ]
    rows = [
        tuple(serving.coerce_features(g, LINEITEM_FEATURES)[0]) for g in grid
    ]
    df = spark.createDataFrame(rows, serving.serving_schema(LINEITEM_FEATURES))
    return model.transform(df).select(
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_discount").cast("double").alias("discount"),
        F.col("prediction").alias("predicted_price"),
    )


def ml_sensitivity_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O24: sensitivity sweep via explode — vary l_quantity 1..50 around a
    fixed base row; association is a column, not list order."""
    model = _lineitem_model(spark, sf_dir)
    base = {"l_quantity": 10.0, "l_discount": 0.05, "l_tax": 0.04, "l_linenumber": 2.0}
    return serving.sensitivity_sweep(
        spark,
        model,
        base,
        LINEITEM_FEATURES,
        "l_quantity",
        [float(v) for v in range(1, 51)],
    )


def ml_optimal_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O25-O27: hour-grid sweep on the events model, BETWEEN band filter,
    ascending sort."""
    model = _events_model(spark, sf_dir)
    base = {"hour": 0.0, "dow": 4.0}
    return serving.optimal_time(
        spark,
        model,
        base,
        EVENTS_FEATURES,
        hours=list(range(24)),
        minute_of_hour=30,
        target_min=30.0,
        target_max=70.0,
        hour_col="hour",
        minute_col="minute_unused",
    )


QUERIES = {
    "ml_feature_importances": ml_feature_importances,
    "ml_predict_grid": ml_predict_grid,
    "ml_sensitivity_quantity": ml_sensitivity_quantity,
    "ml_optimal_hour": ml_optimal_hour,
}

# Not SQL-expressible (model training/inference) → no ORACLES entries;
# the driver records rows-only checks for these.
ORACLES: dict[str, str] = {}
