"""Flask shell parity tests (reference api.py:77-313): routes, 404/400
semantics, response shapes — all through the test client, no server."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

pytest.importorskip("flask")

from kafka_pyspark_bigdata_spark.ml import trainer
from kafka_pyspark_bigdata_spark.ml.api import create_app


@pytest.fixture(scope="module")
def client(spark):
    rs = np.random.RandomState(7)
    n = 120
    data = {c: rs.uniform(0, 10, n) for c in trainer.BIKE_FEATURES}
    data["Duration"] = 4.0 * data["Distance"] + rs.normal(0, 1, n)
    df = spark.createDataFrame(pd.DataFrame(data))
    model = trainer.train(
        df, trainer.BIKE_FEATURES, trainer.BIKE_LABEL, num_trees=3, max_depth=3
    )
    app = create_app(spark, {"1": model, "2": None})
    app.config["TESTING"] = True
    with app.test_client() as c:
        yield c


FULL = {c: 1.0 for c in trainer.BIKE_FEATURES}


def test_predict_ok_and_missing_defaulted(client):
    r = client.post("/predict/duration/1", json={"Distance": 3.5})
    assert r.status_code == 200
    body = r.get_json()
    assert body["model_version_used"] == "model_1"
    assert isinstance(body["predicted_duration"], float)
    assert "Distance" not in body["missing_features_defaulted"]
    assert "Temp" in body["missing_features_defaulted"]
    # full payload → no defaults (api.py:97-98 returns null, not [])
    r2 = client.post("/predict/duration/1", json=FULL)
    assert r2.get_json()["missing_features_defaulted"] is None


def test_predict_404_on_absent_or_unloaded_model(client):
    assert client.post("/predict/duration/9", json=FULL).status_code == 404
    # version present in the dict but failed to load (api.py:79-81)
    assert client.post("/predict/duration/2", json=FULL).status_code == 404


def test_predict_400_on_empty_or_non_numeric(client):
    assert client.post("/predict/duration/1", json={}).status_code == 400
    r = client.post("/predict/duration/1", json={"Distance": "far"})
    assert r.status_code == 400
    assert "non-numeric" in r.get_json()["error"]


def test_sensitivity_rows_keep_input_order_and_errors(client):
    r = client.post(
        "/analyze/sensitivity/1",
        json={
            "base_features": dict(FULL),
            "variable_feature_name": "Distance",
            "variation_values": [1.0, "bogus", 5.0],
        },
    )
    assert r.status_code == 200
    rows = r.get_json()["analysis_results"]
    assert [row["value"] for row in rows] == [1.0, "bogus", 5.0]
    assert rows[0]["predicted_duration"] is not None
    assert rows[0]["base_features_snapshot"]["Distance"] == 1.0
    assert rows[1]["predicted_duration"] is None and "error" in rows[1]
    assert rows[2]["predicted_duration"] is not None


def test_sensitivity_payload_validation(client):
    base = {"base_features": FULL, "variation_values": [1.0]}
    assert client.post("/analyze/sensitivity/1", json=base).status_code == 400
    r = client.post(
        "/analyze/sensitivity/1",
        json={**base, "variable_feature_name": "NotAFeature"},
    )
    assert r.status_code == 400
    r2 = client.post(
        "/analyze/sensitivity/1",
        json={**base, "variable_feature_name": "Distance", "variation_values": "x"},
    )
    assert r2.status_code == 400


def test_optimal_time_sorted_and_screens_hours(client):
    r = client.post(
        "/suggest/optimal-time/1",
        json={
            "base_conditions": dict(FULL),
            "target_duration_max": 1e9,
            "hours_to_evaluate": [8, "noon", 99, 17, True],
            "minute_of_hour": 30,
        },
    )
    assert r.status_code == 200
    body = r.get_json()
    sugg = body["suggestions"]
    assert {s["hour_of_day"] for s in sugg} <= {8, 17}  # invalid hours skipped
    durations = [s["predicted_duration"] for s in sugg]
    assert durations == sorted(durations)  # api.py:298 ascending
    assert all(s["minute_of_hour"] == 30 and s["within_target_range"] for s in sugg)
    assert body["target_duration_min"] == 0.0  # default (api.py:241)


def test_optimal_time_empty_grid_and_400s(client):
    r = client.post(
        "/suggest/optimal-time/1",
        json={
            "base_conditions": dict(FULL),
            "target_duration_max": 100,
            "hours_to_evaluate": [99, -1],
        },
    )
    assert r.status_code == 200
    assert r.get_json()["suggestions"] == []
    # missing target_duration_max
    assert (
        client.post(
            "/suggest/optimal-time/1",
            json={"base_conditions": dict(FULL), "hours_to_evaluate": [8]},
        ).status_code
        == 400
    )
    # out-of-range minute
    assert (
        client.post(
            "/suggest/optimal-time/1",
            json={
                "base_conditions": dict(FULL),
                "target_duration_max": 100,
                "hours_to_evaluate": [8],
                "minute_of_hour": 75,
            },
        ).status_code
        == 400
    )


def test_sensitivity_handles_non_float32_representable_values(client):
    """Regression: variation values like 0.1 are stored as float32 in the
    sweep; re-association must key on the float32-rounded value or the
    endpoint 500s."""
    r = client.post(
        "/analyze/sensitivity/1",
        json={
            "base_features": dict(FULL),
            "variable_feature_name": "Distance",
            "variation_values": [0.1, 0.3, 2.7],
        },
    )
    assert r.status_code == 200
    rows = r.get_json()["analysis_results"]
    assert all(row["predicted_duration"] is not None for row in rows)


def test_optimal_time_rejects_non_scalar_targets_with_400(client):
    """Regression: TypeError from float([100]) must surface as 400, not 500."""
    r = client.post(
        "/suggest/optimal-time/1",
        json={
            "base_conditions": dict(FULL),
            "target_duration_max": [100],
            "hours_to_evaluate": [8],
        },
    )
    assert r.status_code == 400
