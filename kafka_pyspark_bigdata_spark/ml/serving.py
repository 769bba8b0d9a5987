"""Serving-side query semantics (reference api.py re-expressed as pure
DataFrame functions — the Flask shell is deliberately absent; these ARE the
three endpoints' dataflows).

- ``predict_one``: validate/coerce a feature dict (missing→0.0 with a
  warning list, non-numeric→ValueError; api.py:49-73), build a one-row
  DataFrame with the explicit serving schema (api.py:41-47), transform,
  fetch the scalar prediction (api.py:89-92).
- ``sensitivity_sweep``: the /analyze/sensitivity fan-out (api.py:130-210)
  as explode-over-values: the varied value STAYS A COLUMN, so the
  reference's fragile order-based re-association (api.py:166-210) is
  deleted, not ported — association is free, the whole sweep is one plan.
- ``optimal_time``: the /suggest/optimal-time hour grid (api.py:257-298):
  explode hours → override Phour/Pmin → transform → BETWEEN filter →
  ORDER BY prediction ASC.

Train/serve skew note: missing features default to 0.0 at serving
(api.py:57-59) while training mean-imputes (spark_trainer.py:70) —
intentional reference semantics, preserved (documented, not "fixed").
"""

from __future__ import annotations

from numbers import Number

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import FloatType, StructField, StructType


def serving_schema(feature_cols: list[str]) -> StructType:
    """All-nullable FloatType in canonical order (api.py:41-47)."""
    return StructType([StructField(c, FloatType(), True) for c in feature_cols])


def coerce_features(
    payload: dict, feature_cols: list[str]
) -> tuple[list[float], list[str]]:
    """missing→0.0 (collected in a warning list), non-numeric→ValueError
    (api.py:49-73). Numeric strings like "12.5" are accepted — the
    reference coerces with ``float(val)`` (api.py:61-65), which parses
    strings; only values float() rejects are collected as bad. NOTE this
    deliberately also admits booleans as 1.0/0.0 (float(True) succeeds),
    matching the reference's float(val) behavior for JSON true/false."""
    values, missing, bad = [], [], []
    for c in feature_cols:
        v = payload.get(c)
        if v is None:
            values.append(0.0)
            missing.append(c)
        elif isinstance(v, Number) and not isinstance(v, bool):
            values.append(float(v))
        else:
            try:
                values.append(float(v))
            except (TypeError, ValueError):
                bad.append(c)
    if bad:
        raise ValueError(f"non-numeric features: {bad}")
    return values, missing


def predict_one(
    spark: SparkSession,
    model: PipelineModel,
    payload: dict,
    feature_cols: list[str],
) -> tuple[float, list[str]]:
    values, missing = coerce_features(payload, feature_cols)
    df = spark.createDataFrame([tuple(values)], serving_schema(feature_cols))
    pred = model.transform(df).select("prediction").first()[0]
    return float(pred), missing


def sweep_frame(
    spark: SparkSession,
    base: dict,
    feature_cols: list[str],
    varied_feature: str,
    values: list[float],
) -> DataFrame:
    """One row per variation value, built by exploding the value array over
    the base row — `varied_value` rides along as a column."""
    base_vals, _ = coerce_features(base, feature_cols)
    base_row = spark.createDataFrame(
        [tuple(base_vals)], serving_schema(feature_cols)
    )
    exploded = base_row.select(
        "*",
        F.explode(F.array(*[F.lit(float(v)).cast("float") for v in values])).alias(
            "varied_value"
        ),
    )
    return exploded.withColumn(varied_feature, F.col("varied_value"))


def sensitivity_sweep(
    spark: SparkSession,
    model: PipelineModel,
    base: dict,
    feature_cols: list[str],
    varied_feature: str,
    values: list[float],
) -> DataFrame:
    """/analyze/sensitivity as one plan: explode → transform. Returns
    (varied_feature, varied_value, predicted) rows, association intact."""
    if varied_feature not in feature_cols:
        raise ValueError(f"unknown feature: {varied_feature}")
    swept = sweep_frame(spark, base, feature_cols, varied_feature, values)
    return model.transform(swept).select(
        F.lit(varied_feature).alias("varied_feature"),
        F.col("varied_value").cast("double").alias("varied_value"),
        F.col("prediction").alias("predicted"),
    )


def optimal_time(
    spark: SparkSession,
    model: PipelineModel,
    base: dict,
    feature_cols: list[str],
    hours: list[int],
    minute_of_hour: int,
    target_min: float,
    target_max: float,
    hour_col: str = "Phour",
    minute_col: str = "Pmin",
) -> DataFrame:
    """/suggest/optimal-time as one plan: hour grid → overrides →
    transform → BETWEEN → ORDER BY ASC. Invalid hours are screened by a
    filter (api.py:261-264 skip semantics)."""
    valid = [int(h) for h in hours if isinstance(h, int) and not isinstance(h, bool)]
    swept = sweep_frame(
        spark, base, feature_cols, hour_col, [float(h) for h in valid]
    ).filter(F.col("varied_value").between(0, 23))
    swept = swept.withColumn(minute_col, F.lit(float(minute_of_hour)).cast("float"))
    return (
        model.transform(swept)
        .select(
            F.col("varied_value").cast("int").alias("hour"),
            F.lit(int(minute_of_hour)).alias("minute"),
            F.col("prediction").alias("predicted"),
        )
        .filter(F.col("predicted").between(float(target_min), float(target_max)))
        .orderBy(F.asc("predicted"), F.asc("hour"))
    )


def result_json(df: DataFrame) -> list[dict]:
    """Struct/JSON result shaping (O28): rows → JSON-able dicts. Driver-side
    by design — results here are already small (post-LIMIT/filter)."""
    return [row.asDict(recursive=True) for row in df.collect()]
