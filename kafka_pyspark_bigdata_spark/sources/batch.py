"""Batch sources/sinks (reference O1/O10/O11 re-expressed).

The reference reads CSV with a python ``csv.DictReader`` (producer.py:33-35)
and lands CSV micro-batches re-read by ``spark.read.csv`` over cumulative
path lists (spark_trainer.py:43-46). Here everything is a declarative scan:
parquet for the driver fixtures (columnar, predicate-pushdown-able,
splittable — the only sane format at 100 TB), CSV with an explicit schema
for reference parity (never ``inferSchema`` — a schema inference pass is a
full extra scan of the data).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists but owned by someone else
    return True


def _prune_dead_siblings(parent: str, prefix: str) -> None:
    """Remove sibling scratch dirs ``{prefix}p<pid>`` whose owning process
    has exited. Repeated driver/bench/test runs each leave one per-pid dir
    (some holding sizable sf0.1 roundtrip artifacts); without this, the
    accumulation under /tmp/kpbd_scratch is unbounded."""
    try:
        entries = os.listdir(parent)
    except OSError:
        return
    for name in entries:
        if not name.startswith(prefix):
            continue
        suffix = name[len(prefix):]
        if not suffix.isdigit() or int(suffix) == os.getpid():
            continue
        if not _pid_alive(int(suffix)):
            shutil.rmtree(os.path.join(parent, name), ignore_errors=True)


def scratch_dir(tag: str, sf_dir: str) -> str:
    """Fixed per-(tag, sf, pid) scratch path, WIPED on each call: repeated
    driver/bench/oracle runs in one process reuse one directory instead of
    leaking a new mkdtemp per invocation, while the pid suffix keeps two
    CONCURRENT processes against the same SF (e.g. bench + a verify sweep)
    from racing on the same path during the wipe/overwrite. Sibling dirs
    left by EXITED pids are pruned on each call so the scratch root stays
    bounded across runs."""
    parent = os.path.join(tempfile.gettempdir(), "kpbd_scratch")
    prefix = f"{tag}_{os.path.basename(sf_dir.rstrip('/'))}_p"
    _prune_dead_siblings(parent, prefix)
    base = os.path.join(parent, f"{prefix}{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    return base


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Scan-PLAN memo (r12): building a parquet scan costs ~78 ms on the
# driver per call (footer/schema read + py4j round-trips), and the query
# builders call load_table thousands of times across a bench run — tens
# of seconds of pure plan-construction overhead. A DataFrame is an
# immutable lazy plan, so the SAME object can seed every query that
# reads the table: each action still scans the parquet files from disk —
# nothing row-shaped is ever held here (the (applicationId, sf_dir) key
# and the stale-app pruning mirror the ml fit-sharing convention in
# ml/queries.py). _PSCAN memoizes parallelize_scan's repartition
# decision for exactly those cached frames (identity-checked so a
# recycled id() can never alias a different frame).
_SCAN_CACHE: dict[tuple[str, str, str, float], DataFrame] = {}
_PSCAN_CACHE: dict[int, tuple[DataFrame, DataFrame]] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Column pruning + filter pushdown reach the
    parquet reader automatically because this stays declarative.

    The ``events`` fixture stores TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects; we read nanos as long (session conf) and convert
    to microsecond timestamps in the plan — same truncation DuckDB applies
    when casting TIMESTAMP_NS to its microsecond TIMESTAMP.
    """
    # The table dir's mtime in the key (the _DUP_PAIRS_CACHE convention)
    # invalidates the memoized scan if a fixture is rewritten in place
    # within one application — a cached DataFrame's file listing would
    # otherwise go stale (r12 advice item).
    try:
        mtime = os.path.getmtime(table_path(sf_dir, name))
    except OSError:
        mtime = -1.0
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"), name, mtime)
    hit = _SCAN_CACHE.get(key)
    if hit is not None:
        return hit
    # evict other-application entries and superseded-mtime entries for
    # this same table (the rewritten fixture's old listing)
    stale = [
        k for k in _SCAN_CACHE if k[0] != key[0] or k[:3] == key[:3]
    ]
    if stale:
        for k in stale:
            del _SCAN_CACHE[k]
        _PSCAN_CACHE.clear()

    path = table_path(sf_dir, name)
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and isinstance(field.dataType, TimestampNTZType):
            # Fixture may land as TIMESTAMP_NTZ; event-time functions
            # (unix_micros, withWatermark) demand TIMESTAMP. The session
            # timezone is pinned to UTC (session.py), so the cast is
            # value-identical — and it matches the DuckDB oracles, which
            # normalize via CAST(ts AS TIMESTAMP).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _SCAN_CACHE[key] = df
    return df


def parallelize_scan(df: DataFrame, min_ratio: int = 2) -> DataFrame:
    """Repartition a scan that arrived with too few partitions for the
    cluster (the small-file case: one parquet file → one task → one core
    doing all the compute downstream).

    On a real 100 TB table the scan has thousands of 128 MiB splits and
    this is a no-op (``getNumPartitions`` already ≥ cores); locally, the
    fixtures are single files, and compute-heavy operators (shingling,
    hashing, cosine) would otherwise run single-threaded. The shuffle this
    inserts moves only the small input, never fires on big inputs.

    The decision is memoized for load_table's cached scan frames (the
    ``.rdd`` probe is a full analysis+planning round-trip, ~36 ms per
    call); the plan and values are identical either way.
    """
    ent = _PSCAN_CACHE.get(id(df))
    if ent is not None and ent[0] is df:
        return ent[1]
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * min_ratio <= target:
        out = df.repartition(target)
    else:
        out = df
    # memoize only frames that live in _SCAN_CACHE: their strong refs
    # keep id(df) stable, and the cache stays bounded by table count
    if any(v is df for v in _SCAN_CACHE.values()):
        _PSCAN_CACHE[id(df)] = (df, out)
    return out


def read_csv(spark: SparkSession, paths: list[str] | str, schema: StructType) -> DataFrame:
    """CSV scan with header and explicit schema (reference O1).

    A multi-path list is an implicit UNION ALL (reference O11,
    spark_trainer.py:43-46): Spark plans one scan over all files, which is
    strictly better than N scans + N-1 union nodes.
    """
    return spark.read.option("header", True).schema(schema).csv(paths)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink with header (reference O10, consumer.py:61-67)."""
    df.write.option("header", True).mode(mode).csv(path)


def write_bucketed(
    df: DataFrame, table: str, key: str, num_buckets: int = 32, path: str | None = None
) -> None:
    """Persist a table hash-bucketed (and per-file sorted) on its join key.

    This is the shuffle-elimination primitive for repeated fact-fact joins
    at 100 TB: two tables bucketed on the same key with the same bucket
    count join WITHOUT an Exchange on either side (Catalyst recognizes the
    co-partitioning from the catalog), turning the usual
    shuffle-sort-merge into a zero-movement per-bucket merge. Worth it for
    any join key used more than once — e.g. lineitem⋈orders on the order
    key, which every TPC-H-shaped query in plans/ hits. Exercised
    end-to-end (write → catalog scan → exchange-free SMJ, value-hash
    oracle) by ``sources/queries.q_bucketed_join``.

    The frame is pre-repartitioned on the bucket hash so each bucket is
    exactly ONE file — that is the condition under which the reader
    trusts the per-bucket sort order, and it caps file count at
    num_buckets instead of tasks × buckets. ``path`` makes the table
    EXTERNAL at that location (scratch-friendly); bucketing metadata
    still lives in the session catalog either way.
    """
    writer = (
        df.repartition(num_buckets, F.col(key))
        .write.bucketBy(num_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
