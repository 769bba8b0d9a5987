"""Thin Flask shell over the serving dataflows (reference api.py:77-313).

The three endpoints are glue only: route → model resolve (404) → payload
checks (400) → the pure DataFrame functions in ``ml.serving`` → reference
response shapes. All query semantics live in serving.py — this module adds
no dataflow of its own (SURVEY.md §7 M3: "Flask shell last, thinnest
possible").

Parity notes (cited to the reference):
- model dict is keyed by version string; absent/None → 404
  (api.py:79-81,110-111,229-230)
- predict response keys ``model_version_used / input_features /
  predicted_duration / missing_features_defaulted`` (api.py:94-99)
- sensitivity rows ``varied_feature / value / predicted_duration /
  base_features_snapshot`` with per-variation validation errors kept as
  error rows (api.py:142-147,185-210); all-errors → 200 with only error
  rows (api.py:149-151)
- optimal-time: target_duration_min defaults 0, minute_of_hour defaults 0
  and must be 0-59 (api.py:241-255); invalid hours are skipped
  (api.py:261-264); empty grid → 200 with a message (api.py:281-282);
  suggestions sorted by predicted duration ascending (api.py:298)

Flask is optional at import (the engine itself never needs it): building
the app without Flask installed raises at ``create_app`` time.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession

from . import serving, trainer

try:  # pragma: no cover - exercised implicitly by import
    from flask import Flask, jsonify, request
except ImportError:  # pragma: no cover
    Flask = None


def create_app(
    spark: SparkSession,
    models: dict,
    feature_cols: list[str] | None = None,
) -> "Flask":
    """Build the Flask app over a model dict (version-string → PipelineModel
    or None, as produced by ``trainer.load_models`` — api.py:23-37)."""
    if Flask is None:
        raise RuntimeError("flask is not installed; the engine works without it")
    feature_cols = feature_cols or trainer.BIKE_FEATURES
    app = Flask("kafka_pyspark_bigdata_spark")

    def _resolve(version: str):
        model = models.get(version)
        if model is None:
            return None, (
                jsonify({"error": f"Model 'model_{version}' not loaded or not found."}),
                404,
            )
        return model, None

    @app.route("/predict/duration/<version>", methods=["POST"])
    def predict_duration(version: str):
        model, err = _resolve(version)
        if err:
            return err
        data = request.get_json(silent=True)
        if not data:
            return jsonify({"error": "No input data provided"}), 400
        try:
            predicted, missing = serving.predict_one(spark, model, data, feature_cols)
        except ValueError as ve:
            return jsonify({"error": str(ve)}), 400
        return jsonify(
            {
                "model_version_used": f"model_{version}",
                "input_features": data,
                "predicted_duration": predicted,
                "missing_features_defaulted": missing or None,
            }
        )

    @app.route("/analyze/sensitivity/<version>", methods=["POST"])
    def analyze_sensitivity(version: str):
        model, err = _resolve(version)
        if err:
            return err
        payload = request.get_json(silent=True)
        if not payload:
            return jsonify({"error": "No input payload provided"}), 400
        base = payload.get("base_features")
        feat = payload.get("variable_feature_name")
        values = payload.get("variation_values")
        if not all([base, feat, values]):
            return (
                jsonify(
                    {
                        "error": "Missing 'base_features', 'variable_feature_name',"
                        " or 'variation_values' in payload."
                    }
                ),
                400,
            )
        if feat not in feature_cols:
            return (
                jsonify(
                    {"error": f"Invalid 'variable_feature_name': {feat}. Not a model feature."}
                ),
                400,
            )
        if not isinstance(values, list):
            return jsonify({"error": "'variation_values' must be a list."}), 400

        # Per-variation validation: failures become error rows, survivors go
        # through ONE exploded sweep plan (the order-based re-association of
        # api.py:166-210 is deleted — the varied value rides as a column).
        # The sweep stores features as float32, so re-association keys must
        # be the float32-ROUNDED value (float(0.1) would miss the rounded
        # 0.10000000149... coming back from Spark).
        def _f32(v) -> float:
            return float(np.float32(float(v)))

        valid, row_err = [], {}
        for v in values:
            try:
                serving.coerce_features({**base, feat: v}, feature_cols)
                valid.append(float(v))
            except (TypeError, ValueError) as ve:
                row_err[repr(v)] = str(ve)
        predicted = {}
        if valid:
            swept = serving.sensitivity_sweep(spark, model, base, feature_cols, feat, valid)
            for r in swept.collect():
                predicted[r["varied_value"]] = float(r["predicted"])
        results = []
        for v in values:
            if repr(v) in row_err:
                results.append(
                    {
                        "varied_feature": feat,
                        "value": v,
                        "error": row_err[repr(v)],
                        "predicted_duration": None,
                    }
                )
            else:
                results.append(
                    {
                        "varied_feature": feat,
                        "value": v,
                        "predicted_duration": predicted[_f32(v)],
                        "base_features_snapshot": {**base, feat: v},
                    }
                )
        return jsonify(
            {"model_version_used": f"model_{version}", "analysis_results": results}
        )

    @app.route("/suggest/optimal-time/<version>", methods=["POST"])
    def suggest_optimal_time(version: str):
        model, err = _resolve(version)
        if err:
            return err
        payload = request.get_json(silent=True)
        if not payload:
            return jsonify({"error": "No input payload provided"}), 400
        base = payload.get("base_conditions")
        t_max = payload.get("target_duration_max")
        t_min = payload.get("target_duration_min", 0)
        hours = payload.get("hours_to_evaluate")
        minute = payload.get("minute_of_hour", 0)
        if not all([base, hours]) or t_max is None:
            return (
                jsonify(
                    {
                        "error": "Missing 'base_conditions', 'hours_to_evaluate',"
                        " or 'target_duration_max'."
                    }
                ),
                400,
            )
        if not isinstance(hours, list):
            return (
                jsonify({"error": "'hours_to_evaluate' must be a list of integers (0-23)."}),
                400,
            )
        try:
            t_max, t_min, minute = float(t_max), float(t_min), int(minute)
            if not (0 <= minute <= 59):
                raise ValueError("minute_of_hour must be between 0 and 59.")
        except (TypeError, ValueError) as ve:
            return (
                jsonify({"error": f"Invalid type for target durations or minute: {ve}"}),
                400,
            )
        valid_hours = [
            h for h in hours if isinstance(h, int) and not isinstance(h, bool) and 0 <= h <= 23
        ]
        if not valid_hours:
            return (
                jsonify(
                    {"message": "No valid hours to evaluate after validation.", "suggestions": []}
                ),
                200,
            )
        try:
            df = serving.optimal_time(
                spark, model, base, feature_cols, valid_hours, minute, t_min, t_max
            )
            rows = serving.result_json(df)
        except ValueError as ve:
            return jsonify({"error": str(ve)}), 400
        return jsonify(
            {
                "model_version_used": f"model_{version}",
                "target_duration_min": t_min,
                "target_duration_max": t_max,
                "suggestions": [
                    {
                        "hour_of_day": r["hour"],
                        "minute_of_hour": r["minute"],
                        "predicted_duration": r["predicted"],
                        "within_target_range": True,
                    }
                    for r in rows
                ],
            }
        )

    return app
