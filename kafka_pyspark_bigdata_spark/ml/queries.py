"""ML driver-contract queries (rows-only checks — model training/inference
is not SQL-expressible, so no DuckDB oracle; the driver records row counts).

Models are trained on the fixture tables (deterministic: seed=42, fixed
file layout, fixed partitioning) and cached per sf_dir so the four queries
share two trainings.
"""

from __future__ import annotations

import os

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType
from pyspark.sql.window import Window

from ..sources.batch import load_table, scratch_dir
from . import serving, trainer

LINEITEM_FEATURES = ["l_quantity", "l_discount", "l_tax", "l_linenumber"]
LINEITEM_LABEL = "l_extendedprice"
EVENTS_FEATURES = ["hour", "dow"]
EVENTS_LABEL = "value"

# Keyed by (applicationId, sf_dir, table): a fitted model handle is bound
# to the JVM that trained it, so a restarted SparkSession must retrain
# rather than reuse a stale Py4J reference. Values are PipelineModel or a
# bare fitted classifier (the purchase RF).
_model_cache: dict[tuple[str, str, str], object] = {}


def _app_id(spark: SparkSession) -> str:
    return spark.sparkContext.applicationId


def _lineitem_model(spark: SparkSession, sf_dir: str) -> PipelineModel:
    key = (_app_id(spark), sf_dir, "lineitem")
    if key not in _model_cache:
        df = load_table(spark, sf_dir, "lineitem")
        _model_cache[key] = trainer.train(df, LINEITEM_FEATURES, LINEITEM_LABEL)
    return _model_cache[key]


def _events_model(spark: SparkSession, sf_dir: str) -> PipelineModel:
    key = (_app_id(spark), sf_dir, "events")
    if key not in _model_cache:
        df = load_table(spark, sf_dir, "events").select(
            F.hour("ts").alias("hour"),
            F.dayofweek("ts").alias("dow"),
            "value",
        )
        _model_cache[key] = trainer.train(df, EVENTS_FEATURES, EVENTS_LABEL)
    return _model_cache[key]


def _lineitem_split_model(spark: SparkSession, sf_dir: str) -> PipelineModel:
    """The RF regressor trained on the hash-deterministic 80% lineitem
    split — shared by ml_eval_rmse, ml_lift_deciles and
    ml_permutation_importance, which previously each re-fit the IDENTICAL
    model (same frame, same features/label, fixed seed → deterministic
    ensemble, so sharing the handle cannot change any output; it removes
    two full RF fits from every driver sweep). Cached per
    (applicationId, sf_dir) like the serving models above."""
    from ..operators.pipeline import TRAIN_BUCKETS, hash_bucket_expr

    key = (_app_id(spark), sf_dir, "lineitem_split")
    if key not in _model_cache:
        df = load_table(spark, sf_dir, "lineitem").withColumn(
            "bucket", hash_bucket_expr("l_orderkey")
        )
        train_df = df.filter(F.col("bucket") < TRAIN_BUCKETS)
        _model_cache[key] = trainer.train(
            train_df, LINEITEM_FEATURES, LINEITEM_LABEL
        )
    return _model_cache[key]


def _purchase_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared (hour, dow, value, label, bucket) projection behind the
    purchase classifier — one definition so the train/eval splits are
    bit-identical across every consumer."""
    from ..operators.pipeline import hash_bucket_expr

    return load_table(spark, sf_dir, "events").select(
        F.hour("ts").alias("hour"),
        F.dayofweek("ts").alias("dow"),
        "value",
        (F.col("event_type") == "purchase").cast("double").alias("label"),
        hash_bucket_expr("event_id").alias("bucket"),
    )


def _purchase_assembler():
    from pyspark.ml.feature import VectorAssembler

    return VectorAssembler(
        inputCols=["hour", "dow", "value"], outputCol="features"
    )


def _purchase_classifier(spark: SparkSession, sf_dir: str):
    """The seed-42 purchase RandomForestClassifier fitted on the 80%
    events split. ml_classifier_auc and ml_calibration_bins fit the
    IDENTICAL estimator (numTrees=10, maxDepth=5, seed=42) on the
    IDENTICAL frame, so one cached fit serves both — and
    ml_isotonic_calibration transitively, taking a full classifier fit
    out of the driver's rows-only sweep tail. Deterministic fit ⇒
    outputs unchanged."""
    from pyspark.ml.classification import RandomForestClassifier

    key = (_app_id(spark), sf_dir, "purchase_clf")
    if key not in _model_cache:
        from ..operators.pipeline import TRAIN_BUCKETS

        train = _purchase_assembler().transform(
            _purchase_events(spark, sf_dir).filter(
                F.col("bucket") < TRAIN_BUCKETS
            )
        )
        clf = RandomForestClassifier(
            featuresCol="features",
            labelCol="label",
            numTrees=10,
            maxDepth=5,
            seed=42,
        )
        model = clf.fit(train)
        _strip_training_summary(model)
        _model_cache[key] = model
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


def ml_predict_loaded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O18 round trip: save the trained pipeline to disk, load it back
    (spark_trainer.py:82-84 → api.py:24-37 handoff), and prove the loaded
    model reproduces the in-memory model's grid predictions bit-for-bit."""
    model = _lineitem_model(spark, sf_dir)
    base_dir = scratch_dir("models", sf_dir)
    trainer.save_model(model, base_dir, 1, LINEITEM_FEATURES)
    loaded = trainer.load_model(base_dir, 1)
    grid = [
        {"l_quantity": float(q), "l_discount": d, "l_tax": 0.05, "l_linenumber": 1.0}
        for q in range(1, 11)
        for d in (0.0, 0.05, 0.10)
    ]
    rows = [tuple(serving.coerce_features(g, LINEITEM_FEATURES)[0]) for g in grid]
    df = spark.createDataFrame(rows, serving.serving_schema(LINEITEM_FEATURES))
    mem = model.transform(df).select(
        "l_quantity", "l_discount", F.col("prediction").alias("pred_mem")
    )
    disk = loaded.transform(df).select(
        "l_quantity", "l_discount", F.col("prediction").alias("pred_loaded")
    )
    return (
        mem.join(disk, ["l_quantity", "l_discount"])
        .select(
            F.col("l_quantity").cast("double").alias("quantity"),
            F.col("l_discount").cast("double").alias("discount"),
            "pred_loaded",
            (F.col("pred_loaded") == F.col("pred_mem")).alias("matches_in_memory"),
        )
        .orderBy("quantity", "discount")
    )


INCR_BATCH_SIZE = 300
INCR_MAX_BATCHES = 3


def ml_incremental_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole ingest→train chain as ONE query
    (producer→consumer→trainer, spark_trainer.py:107-109): stream events →
    count-batcher lands 3 exact-size CSV micro-batch files → v1..v3 train
    on cumulative file prefixes → one importance table per version,
    unioned. Rows-only check: 3 versions × 2 features = 6 rows."""
    from ..streaming.batcher import run_count_batched_stream
    from ..streaming.queries import _events_stream

    stream = _events_stream(spark, sf_dir).select(
        F.hour("ts").cast("double").alias("hour"),
        F.dayofweek("ts").cast("double").alias("dow"),
        "value",
    )
    out_dir = scratch_dir("incr_train", sf_dir)
    batcher = run_count_batched_stream(
        stream,
        out_dir=out_dir,
        checkpoint_dir=os.path.join(out_dir, "_ckpt"),
        batch_size=INCR_BATCH_SIZE,
        max_batches=INCR_MAX_BATCHES,
        fmt="csv",
    )
    batch_paths = [
        os.path.join(batcher.data_dir, f"batch_id={k}")
        for k in range(batcher.batches_written())
    ]
    schema = StructType(
        [StructField(c, DoubleType(), True) for c in ["hour", "dow", "value"]]
    )
    models = trainer.train_incremental(
        spark, batch_paths, EVENTS_FEATURES, EVENTS_LABEL, schema, num_trees=5
    )
    per_version = [
        trainer.feature_importances(spark, m, EVENTS_FEATURES).select(
            F.lit(v).alias("version"),
            "feature",
            (F.col("importance") >= 0.0).alias("importance_valid"),
        )
        for v, m in sorted(models.items())
    ]
    out = per_version[0]
    for df in per_version[1:]:
        out = out.unionByName(df)
    return out.orderBy("version", "feature")


def ml_eval_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval loop closure: hash-deterministic 80/20 split of lineitem
    (same content-addressed bucketing as operators.pipeline), train on the
    train side only, score RMSE/MAE on the held-out side — one aggregate
    over the transformed eval frame, computed distributed (no collect of
    predictions)."""
    from ..operators.pipeline import TRAIN_BUCKETS, hash_bucket_expr

    df = load_table(spark, sf_dir, "lineitem").withColumn(
        "bucket", hash_bucket_expr("l_orderkey")
    )
    eval_df = df.filter(F.col("bucket") >= TRAIN_BUCKETS)
    model = _lineitem_split_model(spark, sf_dir)
    prepared = trainer.cast_prune(eval_df, LINEITEM_FEATURES, LINEITEM_LABEL)
    scored = model.transform(prepared).select(
        (F.col("prediction") - F.col(LINEITEM_LABEL)).alias("err")
    )
    return scored.agg(
        F.count("*").alias("n_eval"),
        F.sqrt(F.avg(F.col("err") * F.col("err"))).alias("rmse"),
        F.avg(F.abs("err")).alias("mae"),
    )


LIFT_DECILES = 10
# Range partitions for the two-phase exact-ntile rank: cluster-sized, not
# data-sized (each holds ~1/P of the eval slice; raise with executor count).
LIFT_RANGE_PARTS = 32


def two_phase_ntile(scored: DataFrame, d: int) -> DataFrame:
    """Exact NTILE(d) over (prediction DESC, tie ASC) WITHOUT a global
    window: repartitionByRange + per-partition row_number + a <=P-row
    prefix-sum offset, then SQL NTILE's remainder rule as integer
    arithmetic. Returns the input columns plus `decile`. Factored out of
    ml_lift_deciles so the bit-identity test (tests/test_ml.py) can
    compare THIS assignment against `F.ntile` on the same frame."""
    from pyspark.sql.window import Window

    ranged = (
        scored.repartitionByRange(LIFT_RANGE_PARTS, F.desc("prediction"), F.asc("tie"))
        .withColumn("pid", F.spark_partition_id())
        # Pin the range partitioning ONCE (graph_kcore pattern): this frame
        # feeds two plan subtrees (counts -> broadcast offsets, and ranked).
        # RangePartitioner samples boundaries with an RDD-lineage-derived
        # seed; without pinning, correctness would rest on ReuseExchange
        # deduplicating the two shuffle instances — an optimizer rule, not
        # the query shape. localCheckpoint materializes one physical
        # partitioning that both consumers read.
        .localCheckpoint(eager=False)
    )
    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    # prefix-sum over <=LIFT_RANGE_PARTS aggregate rows (reduced input —
    # not a fact-scale window), broadcast back with the exact total
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off"),
        F.sum("cnt").over(
            Window.orderBy("pid").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_total"),
    )
    w_local = Window.partitionBy("pid").orderBy(F.desc("prediction"), F.asc("tie"))
    ranked = (
        ranged.withColumn("rn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "pid")
        .withColumn("rank", F.col("off") + F.col("rn"))
    )
    # SQL NTILE(D) with n rows: q = n DIV D, r = n % D; the first r
    # buckets hold q+1 rows. ceil-division written as (x + d - 1) DIV d.
    # The ELSE divisor is clamped with GREATEST(q, 1) so the expression is
    # total: when n_total < d, q = 0 and every rank satisfies the WHEN
    # branch (rank <= n_total = r*1), but the clamp keeps the ELSE defined
    # regardless of branch order or future edits (ANSI mode turns a dead
    # 0-divisor into a runtime DIVIDE_BY_ZERO otherwise).
    ntile = (
        f"CASE WHEN rank <= (n_total % {d}) * (n_total DIV {d} + 1) "
        f"THEN (rank + n_total DIV {d}) DIV (n_total DIV {d} + 1) "
        f"ELSE (n_total % {d}) + (rank - (n_total % {d}) * (n_total DIV {d} + 1) "
        f"+ n_total DIV {d} - 1) DIV GREATEST(n_total DIV {d}, 1) END"
    )
    return ranked.withColumn("decile", F.expr(ntile).cast("int")).drop(
        "pid", "rn", "off", "n_total", "rank"
    )


def ml_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / calibration table on the held-out split: score the
    eval frame, rank by prediction into 10 ntile buckets (deterministic
    l_orderkey+l_linenumber tie-break), and per decile report count,
    mean prediction, and mean actual — the regression analog of the
    lift chart (is the model's top decile actually the biggest, and is
    it calibrated?).

    Exact ntile WITHOUT a global window (r06): a single-partition sort
    over the scored eval slice was the registry's one remaining
    fact-proportional GWin. The scale shape is the two-phase ranged
    rank (the q_weighted_median pattern): repartitionByRange on
    (prediction DESC, tie ASC) — range boundaries come from Spark's
    sampler, and their placement cannot change any rank, only which
    partition computes it — then per-partition row_number (partitioned
    window), plus a prefix-sum offset from the per-partition counts
    (a <=P-row aggregate). global_rank = offset + local rank, and the
    decile is SQL NTILE's exact remainder rule (first n%D buckets get
    one extra row) as integer arithmetic. The decile ASSIGNMENT is
    bit-identical to the F.ntile window form (asserted per-row by
    tests/test_ml.py::test_lift_deciles_bit_identical_to_ntile_window;
    the per-decile float averages agree up to partial-agg summation
    order); every stage is distributed and only the 10-row table
    reaches the driver."""
    from ..operators.pipeline import TRAIN_BUCKETS, hash_bucket_expr

    df = load_table(spark, sf_dir, "lineitem").withColumn(
        "bucket", hash_bucket_expr("l_orderkey")
    )
    eval_df = df.filter(F.col("bucket") >= TRAIN_BUCKETS)
    model = _lineitem_split_model(spark, sf_dir)
    prepared = trainer.cast_prune(
        eval_df.withColumn("tie", F.expr("l_orderkey * 10 + l_linenumber")),
        LINEITEM_FEATURES,
        LINEITEM_LABEL,
        keep=["tie"],
    )
    scored = model.transform(prepared).select("prediction", "tie", LINEITEM_LABEL)
    return (
        two_phase_ntile(scored, LIFT_DECILES)
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("prediction").alias("avg_pred"),
            F.avg(LINEITEM_LABEL).alias("avg_actual"),
        )
        .orderBy("decile")
    )


# 2 cells, not 4: each cell is a full RF fit, and this query's sf0.01
# runtime (6.6s at 2x2) was the single largest consumer of the driver's
# correctness-sweep budget. Two cells still exercise the search + rank
# contract; the axis you'd actually sweep at scale is parallel anyway.
GRID_NUM_TREES = (5, 10)
GRID_MAX_DEPTH = (3,)


def ml_grid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperparameter grid search with a held-out split: train one
    RandomForest per (numTrees, maxDepth) cell on the hash-deterministic
    80% split, score RMSE on the held-out 20%, rank cells best-first.

    The train/eval frames are cached once and reused by every cell —
    the grid loop re-fits models, never re-reads data. Each cell's
    evaluation is a distributed aggregate (no predictions collected);
    only the 4-row score table reaches the driver. At scale this is the
    embarrassingly parallel axis (cells are independent); the
    sequential loop here matches single-tenant local execution."""
    from ..operators.pipeline import TRAIN_BUCKETS, hash_bucket_expr

    df = load_table(spark, sf_dir, "lineitem").withColumn(
        "bucket", hash_bucket_expr("l_orderkey")
    )
    train_df = trainer.cast_prune(
        df.filter(F.col("bucket") < TRAIN_BUCKETS), LINEITEM_FEATURES, LINEITEM_LABEL
    ).cache()
    eval_df = trainer.cast_prune(
        df.filter(F.col("bucket") >= TRAIN_BUCKETS), LINEITEM_FEATURES, LINEITEM_LABEL
    ).cache()
    rows = []
    for nt in GRID_NUM_TREES:
        for md in GRID_MAX_DEPTH:
            model = trainer.build_pipeline(
                LINEITEM_FEATURES, LINEITEM_LABEL, num_trees=nt, max_depth=md
            ).fit(train_df)
            r = (
                model.transform(eval_df)
                .select((F.col("prediction") - F.col(LINEITEM_LABEL)).alias("err"))
                .agg(
                    F.count(F.lit(1)).alias("n_eval"),
                    F.sqrt(F.avg(F.col("err") * F.col("err"))).alias("rmse"),
                )
                .first()
            )
            rows.append((nt, md, r["n_eval"], float(r["rmse"])))
    train_df.unpersist()
    eval_df.unpersist()
    out = spark.createDataFrame(
        rows, "num_trees int, max_depth int, n_eval long, rmse double"
    )
    w = Window.orderBy(F.asc("rmse"), F.asc("num_trees"), F.asc("max_depth"))
    return out.withColumn("rank", F.row_number().over(w)).orderBy("rank")



def _strip_training_summary(model) -> None:
    """Drop a fitted classifier's trainingSummary before using the model
    inside a transform: the summary holds a SparkSession reference that
    rides into the scoring closure, and a SparkSession that has EVER
    registered an ``observe()`` metric carries a non-serializable
    ObservationManager — making every later model.transform fail with
    "Task not serializable" (the q_observe_metrics ↔ classifier
    interaction found by the full-registry sweep). Scala's
    private[ml] setSummary is public in bytecode, so py4j can clear it.
    """
    from pyspark import SparkContext

    jvm = SparkContext._active_spark_context._jvm
    model._java_obj.setSummary(jvm.scala.Option.empty())


def ml_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classification head + exact AUC evaluation: a RandomForest
    CLASSIFIER (seed=42 — same determinism contract as the reference's
    regressor, spark_trainer.py:76) predicts whether an event is a
    purchase from (hour, dow, value), on a hash-deterministic 80/20
    split; the held-out ROC-AUC is computed EXACTLY with the rank
    statistic (Mann-Whitney U) as a pure DataFrame aggregation — per
    distinct score: positives × (2·negatives-strictly-below + ties),
    summed, over 2·n_pos·n_neg — integer arithmetic until one final
    division, no collect of scores, ties handled by the standard
    half-credit convention.

    Plan: score-side groupBy (one partial-agg shuffle, |distinct scores|
    rows — RF probabilities take few distinct values), one ordered
    window over that small aggregate, one final row. Scales as an
    aggregation, not a sort of all predictions."""
    from pyspark.ml.functions import vector_to_array

    from ..operators.pipeline import TRAIN_BUCKETS

    ev = _purchase_events(spark, sf_dir)
    assembler = _purchase_assembler()
    train = assembler.transform(ev.filter(F.col("bucket") < TRAIN_BUCKETS))
    evald = assembler.transform(ev.filter(F.col("bucket") >= TRAIN_BUCKETS))
    # 10 trees: the AUC protocol (exact rank statistic) is the operator's
    # contract, not the ensemble size — half the fit cost keeps this
    # rows-only entry inside the driver's sweep budget with AUC ~unchanged.
    # The fit itself is the shared cached purchase classifier.
    model = _purchase_classifier(spark, sf_dir)
    scored = model.transform(evald).select(
        vector_to_array("probability").getItem(1).alias("score"), "label"
    )
    per_score = scored.groupBy("score").agg(
        F.sum(F.col("label").cast("long")).alias("pos"),
        F.sum((F.lit(1) - F.col("label")).cast("long")).alias("neg"),
    )
    w = (
        Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per_score.withColumn(
        "neg_below", F.sum("neg").over(w) - F.col("neg")
    )
    stats = ranked.agg(
        F.sum(F.col("pos") * (2 * F.col("neg_below") + F.col("neg"))).alias(
            "u2"
        ),
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
    )
    tcount = train.agg(F.count(F.lit(1)).alias("n_train"))
    return stats.crossJoin(F.broadcast(tcount)).select(
        "n_train",
        (F.col("n_pos") + F.col("n_neg")).alias("n_eval"),
        "n_pos",
        "n_neg",
        (
            F.col("u2").cast("double")
            / (2.0 * F.col("n_pos") * F.col("n_neg")).cast("double")
        ).alias("auc"),
    )


CALIB_BINS = 10


def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the purchase classifier: bucket held-out
    predictions into 10 equal-WIDTH probability bins and report, per
    bin, the mean predicted probability vs the observed positive rate —
    the calibration readout (Niculescu-Mizil & Caruana 2005, public)
    that AUC cannot show: a model can rank perfectly and still be badly
    mis-calibrated, which matters whenever scores gate downstream
    thresholds (quality filtering included). The summary row carries ECE
    (expected calibration error) in ppm: Σ n_bin·|mean_pred − obs_rate|
    / n_eval, fixed-point.

    Same train/score protocol as ml_classifier_auc (seed=42,
    hash-deterministic split). Plan: one scored pass → one 10-key
    partial-agg shuffle; predictions are quantized to ppm BEFORE the
    mean so the per-bin sums are integers (the only doubles are final
    displays). Rows-only contract: the model output is not
    SQL-derivable, and the protocol invariants (bin edges tile [0,1],
    counts sum to n_eval, ECE recomputes from the rows) are pytest-
    pinned instead."""
    from pyspark.ml.functions import vector_to_array

    from ..operators.pipeline import TRAIN_BUCKETS

    ev = _purchase_events(spark, sf_dir)
    evald = _purchase_assembler().transform(
        ev.filter(F.col("bucket") >= TRAIN_BUCKETS)
    )
    model = _purchase_classifier(spark, sf_dir)
    scored = model.transform(evald).select(
        F.floor(
            vector_to_array("probability").getItem(1) * 1_000_000 + F.lit(0.5)
        )
        .cast("bigint")
        .alias("p_ppm"),
        F.col("label").cast("long").alias("y"),
    )
    bins = (
        scored.withColumn(
            "bin",
            F.least(
                F.lit(CALIB_BINS - 1),
                F.expr(f"CAST(p_ppm * {CALIB_BINS} div 1000000 AS INT)"),
            ),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("p_ppm").alias("sum_p_ppm"),
            F.sum("y").alias("n_pos"),
        )
        .select(
            "bin",
            "n",
            F.expr("sum_p_ppm div n").alias("mean_pred_ppm"),
            F.expr("n_pos * 1000000 div n").alias("obs_rate_ppm"),
        )
        .withColumn(
            "gap_ppm", F.abs(F.col("mean_pred_ppm") - F.col("obs_rate_ppm"))
        )
        # bins feeds both the per-bin output and the ECE row; without a pin
        # the scored pass (model.transform over the eval split) and the
        # 10-key aggregation execute twice per action — the cross-branch
        # plan-duplication trap pinned elsewhere (q_deletion_vectors base,
        # ts_sax_symbols seg).
        .localCheckpoint(eager=False)
    )
    ece = bins.agg(
        F.lit(-1).alias("bin"),
        F.sum("n").alias("n"),
        F.lit(None).cast("bigint").alias("mean_pred_ppm"),
        F.lit(None).cast("bigint").alias("obs_rate_ppm"),
        F.expr("sum(n * gap_ppm) div sum(n)").alias("gap_ppm"),
    )
    return bins.unionByName(ece).orderBy("bin")


def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration of the purchase classifier via
    pool-adjacent-violators (PAV — Zadrozny & Elkan 2002, public): take
    the reliability-diagram bins from ml_calibration_bins and pool any
    adjacent bins whose observed positive rate DECREASES with predicted
    probability, yielding the monotone non-decreasing calibrated rate a
    downstream threshold can actually trust. Output: the per-bin rows
    with a ``calibrated_ppm`` column (equal within each pool) and the
    pool id each bin landed in.

    PAV runs driver-side over the <= CALIB_BINS-row bin table — the
    model-state pattern (k-means centroids, power-iteration vectors):
    the data-sized work is ml_calibration_bins' one scored pass + 10-key
    aggregate; pooling 10 rows is not a distributed problem. Pool means
    are exact integer rationals (Σ n_i·obs_i) kept unreduced until the
    final single truncating division per pool. Rows-only contract: the
    model scores behind the bins are not SQL-derivable (same as
    ml_calibration_bins); the PAV invariants — monotone calibrated
    rates, weighted-sum preservation per pool — are pytest-pinned.
    """
    bins = [
        r
        for r in ml_calibration_bins(spark, sf_dir).collect()
        if r.bin >= 0
    ]
    bins.sort(key=lambda r: r.bin)
    # PAV on (weight n, value obs_rate_ppm): pool stack of [num, den, idxs]
    pools: list[list] = []
    for i, r in enumerate(bins):
        pools.append([r.n * r.obs_rate_ppm, r.n, [i]])
        # merge while the previous pool's mean exceeds the new one's
        while len(pools) >= 2 and (
            pools[-2][0] * pools[-1][1] > pools[-1][0] * pools[-2][1]
        ):
            num, den, idxs = pools.pop()
            pools[-1][0] += num
            pools[-1][1] += den
            pools[-1][2].extend(idxs)
    out = []
    for pool_id, (num, den, idxs) in enumerate(pools):
        cal = num // den
        for i in idxs:
            r = bins[i]
            out.append(
                (
                    int(r.bin),
                    int(r.n),
                    int(r.mean_pred_ppm),
                    int(r.obs_rate_ppm),
                    pool_id,
                    int(cal),
                )
            )
    return spark.createDataFrame(
        sorted(out),
        "bin int, n long, mean_pred_ppm long, obs_rate_ppm long,"
        " pool_id int, calibrated_ppm long",
    ).orderBy("bin")


def ml_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODEL-BASED corpus quality filtering (the published
    FineWeb-Edu/phi-style pattern): train a logistic regression on
    hashed text features to predict the heuristic gate's verdict, then
    measure how well the model reproduces it on held-out documents —
    the step that lets a pipeline replace brittle hand rules with a
    learned scorer it can THRESHOLD at any recall.

    Featurization is the vocabulary-free hashing trick (HashingTF over
    the token array — nothing to broadcast or keep consistent across a
    100 TB corpus); the label is the composite C4/Gopher-style gate
    from operators/quality.corpus_filter_verdict; the split is
    hash-deterministic; and the held-out ROC-AUC is the exact
    Mann-Whitney rank statistic as a DataFrame aggregation (same
    integer-exact formulation as ``ml_classifier_auc`` — no collect,
    no approximate sampling). Rows-only contract: model fitting is not
    SQL-expressible.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF
    from pyspark.ml.functions import vector_to_array

    from ..operators.pipeline import TRAIN_BUCKETS, hash_bucket_expr
    from ..operators.quality import corpus_filter_verdict
    from ..operators.text import load_documents, with_tokens

    verdict = corpus_filter_verdict(spark, sf_dir).select(
        "doc_id", F.col("keep").cast("double").alias("label")
    )
    docs = (
        with_tokens(load_documents(spark, sf_dir))
        .select("doc_id", "toks", hash_bucket_expr("doc_id").alias("bucket"))
        .join(verdict, "doc_id")
    )
    tf = HashingTF(inputCol="toks", outputCol="features", numFeatures=64)
    # localCheckpoint: the verdict-gate pipeline above (a full quality
    # query + tokenize + join) feeds THREE consumers (LR fit, held-out
    # scoring, the n_train count) — pin its output once instead of
    # recomputing the gate per consumer. Eager + tiny (one row per doc).
    feats = tf.transform(docs).localCheckpoint()
    train = feats.filter(F.col("bucket") < TRAIN_BUCKETS)
    evald = feats.filter(F.col("bucket") >= TRAIN_BUCKETS)
    # 12 iterations converge this 64-feature LR to the same held-out
    # ranking (AUC drift < 1e-3); the protocol, not the iteration count,
    # is the contract — halves the slowest rows-only sweep entry
    lr = LogisticRegression(
        featuresCol="features", labelCol="label", maxIter=12, regParam=0.01
    )
    model = lr.fit(train)
    _strip_training_summary(model)
    scored = model.transform(evald).select(
        vector_to_array("probability").getItem(1).alias("score"), "label"
    )
    per_score = scored.groupBy("score").agg(
        F.sum(F.col("label").cast("long")).alias("pos"),
        F.sum((F.lit(1) - F.col("label")).cast("long")).alias("neg"),
    )
    w = (
        Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per_score.withColumn(
        "neg_below", F.sum("neg").over(w) - F.col("neg")
    )
    stats = ranked.agg(
        F.sum(F.col("pos") * (2 * F.col("neg_below") + F.col("neg"))).alias("u2"),
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
    )
    tcount = train.agg(F.count(F.lit(1)).alias("n_train"))
    return stats.crossJoin(F.broadcast(tcount)).select(
        "n_train",
        (F.col("n_pos") + F.col("n_neg")).alias("n_eval"),
        "n_pos",
        "n_neg",
        (
            F.col("u2").cast("double")
            / (2.0 * F.col("n_pos") * F.col("n_neg")).cast("double")
        ).alias("auc"),
    )



TE_FOLDS = 5


def ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target (mean) encoding — the leakage-safe categorical
    feature every tabular pipeline reaches for: each (category, fold)
    cell is encoded with the target mean computed over the OTHER folds
    only, so a training row never sees its own label through the
    feature.

    Two partial-agg shuffles (per-fold, per-category) + a broadcast
    join-back; the subtraction trick ((sum_cat − sum_fold) / (n_cat −
    n_fold)) means the "leave-fold-out" mean costs no extra pass.
    Deterministic folds (o_orderkey % K) and integer-cents DIV keep it
    oracle-exact — the one ml-module query with a full SQL oracle.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("category"),
        F.expr("CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)").alias("cents"),
        F.expr(f"o_orderkey % {TE_FOLDS}").alias("fold"),
    )
    per_fold = o.groupBy("category", "fold").agg(
        F.count(F.lit(1)).alias("n_fold"), F.sum("cents").alias("sum_fold")
    )
    per_cat = o.groupBy("category").agg(
        F.count(F.lit(1)).alias("n_cat"), F.sum("cents").alias("sum_cat")
    )
    return (
        per_fold.join(F.broadcast(per_cat), "category")
        .select(
            "category",
            "fold",
            "n_fold",
            F.expr(
                "CASE WHEN n_cat - n_fold > 0 "
                "THEN (sum_cat - sum_fold) DIV (n_cat - n_fold) "
                "ELSE NULL END"
            ).alias("oof_mean_cents"),
        )
        .orderBy("category", "fold")
    )


ML_TARGET_ENC_SQL = f"""
WITH o AS (
  SELECT o_orderpriority AS category,
         CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
         o_orderkey % {TE_FOLDS} AS fold
  FROM orders
), per_fold AS (
  SELECT category, fold, COUNT(*) AS n_fold, SUM(cents) AS sum_fold
  FROM o GROUP BY category, fold
), per_cat AS (
  SELECT category, COUNT(*) AS n_cat, SUM(cents) AS sum_cat
  FROM o GROUP BY category
)
SELECT f.category, f.fold, f.n_fold,
       CASE WHEN n_cat - n_fold > 0
            THEN CAST((sum_cat - sum_fold) // (n_cat - n_fold) AS BIGINT)
            ELSE NULL END AS oof_mean_cents
FROM per_fold f JOIN per_cat c ON f.category = c.category
ORDER BY f.category, f.fold
"""



def ml_permutation_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-agnostic permutation importance: how much does held-out RMSE
    degrade when ONE feature's values are decoupled from their rows? The
    explainability counterpart to impurity-based feature_importances —
    it measures the trained model's actual reliance, works for any
    estimator, and is the standard audit when impurity importances are
    suspected biased toward high-cardinality features.

    The permutation is a deterministic cyclic shift: eval rows ordered
    by (hash-bucket row ordering via xxhash64, row id), each row takes
    the NEXT row's feature value (lead, wrapping the last row to the
    first) — a derangement with no RNG, so the readout is reproducible
    at any parallelism. One model fit; F+1 distributed scoring passes
    (F = 4 features), each a single aggregate — predictions never reach
    the driver. Rows-only entry: model internals are not
    SQL-expressible.
    """
    from pyspark.sql.window import Window as W

    from ..operators.pipeline import TRAIN_BUCKETS, hash_bucket_expr

    df = load_table(spark, sf_dir, "lineitem").withColumn(
        "bucket", hash_bucket_expr("l_orderkey")
    )
    eval_df = trainer.cast_prune(
        df.filter(F.col("bucket") >= TRAIN_BUCKETS),
        LINEITEM_FEATURES,
        LINEITEM_LABEL,
        keep=["l_orderkey"],
    ).withColumn(
        # The shift-order key must be a TOTAL order: duplicate
        # (features, label) rows collide under a value-only hash, leaving
        # tie order to partition scheduling. Folding the unique row key
        # (l_orderkey, l_linenumber) into the hash — l_linenumber is
        # already a feature column — and both as orderBy tie-breaks makes
        # the derangement deterministic at any parallelism.
        "rid",
        F.xxhash64(
            *[F.col(c) for c in LINEITEM_FEATURES],
            F.col(LINEITEM_LABEL),
            F.col("l_orderkey"),
        ),
    ).localCheckpoint()
    model = _lineitem_split_model(spark, sf_dir)

    def rmse(frame: DataFrame) -> float:
        row = (
            model.transform(frame)
            .select((F.col("prediction") - F.col(LINEITEM_LABEL)).alias("err"))
            .agg(F.sqrt(F.avg(F.col("err") * F.col("err"))).alias("rmse"))
            .first()
        )
        return float(row.rmse)

    base = rmse(eval_df)
    w = W.orderBy("rid", "l_orderkey", "l_linenumber")
    out = []
    for feat in LINEITEM_FEATURES:
        shifted = F.coalesce(
            F.lead(feat).over(w), F.first(feat).over(w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        )
        permuted = eval_df.withColumn(feat, shifted)
        out.append((feat, base, rmse(permuted)))
    return spark.createDataFrame(
        [(f, b, p, p - b) for f, b, p in out],
        "feature string, rmse_base double, rmse_permuted double, delta double",
    ).orderBy(F.desc("delta"))


QUERIES = {
    "ml_target_encoding": ml_target_encoding,
    "ml_permutation_importance": ml_permutation_importance,
    "ml_quality_classifier": ml_quality_classifier,
    "ml_lift_deciles": ml_lift_deciles,
    "ml_classifier_auc": ml_classifier_auc,
    "ml_calibration_bins": ml_calibration_bins,
    "ml_isotonic_calibration": ml_isotonic_calibration,
    "ml_grid_search": ml_grid_search,
    "ml_feature_importances": ml_feature_importances,
    "ml_eval_rmse": ml_eval_rmse,
    "ml_predict_grid": ml_predict_grid,
    "ml_sensitivity_quantity": ml_sensitivity_quantity,
    "ml_optimal_hour": ml_optimal_hour,
    "ml_predict_loaded": ml_predict_loaded,
    "ml_incremental_versions": ml_incremental_versions,
}

# Not SQL-expressible (model training/inference) → no ORACLES entries;
# the driver records rows-only checks for these.
ORACLES: dict[str, str] = {"ml_target_encoding": ML_TARGET_ENC_SQL}
