"""Streaming driver-contract queries: real Structured Streaming runs
(file source, availableNow trigger) whose bounded results are checkable.

``streaming_hourly_window`` even gets an exact SQL oracle: a tumbling
1-hour window over a bounded replay is semantically identical to the batch
hourly rollup, so the DuckDB comparison validates the streaming plan's
values, not just its row count.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..functions.numeric import dsum_sql
from .batcher import run_count_batched_stream
from .windows import tumbling_agg

BATCH_SIZE = 2000
MAX_BATCHES = 3


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source streaming replay of the events fixture (the broker-free
    stand-in for the Kafka source; see streaming.kafka for the real one)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    for field in stream.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, LongType):
            stream = stream.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    return stream


def streaming_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window over a streamed replay of events,
    landed in a memory sink — value-identical to the batch rollup."""
    stream = _events_stream(spark, sf_dir)
    agg = tumbling_agg(stream, ts_col="ts", width="1 hour")
    name = f"hourly_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("window_start")


STREAMING_HOURLY_SQL = f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n_events, {dsum_sql('value')} AS sum_value
FROM events GROUP BY 1 ORDER BY window_start
"""


def streaming_count_batcher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-based micro-batcher end to end (O9/O10): stream events →
    exact-size batch files (cap + remainder-flush semantics) → per-file row
    counts. Rows-only check: file sizing is the operator's contract."""
    stream = _events_stream(spark, sf_dir)
    out_dir = tempfile.mkdtemp(prefix="count_batcher_")
    ckpt = os.path.join(out_dir, "_ckpt")
    batcher = run_count_batched_stream(
        stream,
        out_dir=out_dir,
        checkpoint_dir=ckpt,
        batch_size=BATCH_SIZE,
        max_batches=MAX_BATCHES,
    )
    return (
        batcher.result(spark)
        .groupBy("batch_id")
        .agg(F.count("*").alias("n_rows"))
        .orderBy("batch_id")
    )


QUERIES = {
    "streaming_hourly_window": streaming_hourly_window,
    "streaming_count_batcher": streaming_count_batcher,
}

ORACLES = {
    "streaming_hourly_window": STREAMING_HOURLY_SQL,
}
