"""Kafka source/sink wiring (reference O4-O8 re-expressed on Structured
Streaming).

The reference uses kafka-python with a per-row JSON serializer
(producer.py:19-23,62) and a polling consumer with manual json.loads +
validity filtering (consumer.py:19-49). Here both directions are
declarative plans:

- source: `readStream.format("kafka")` → `from_json` with an EXPLICIT
  schema (never first-message-wins inference — the consumer.py:51-52
  dynamic-header behavior is a documented bug, not a feature) → corrupt
  records become null structs and are filtered (O8 skip semantics).
- sink: `to_json(struct(*))` → `writeStream.format("kafka")` with
  checkpointing (exactly-once to Kafka transactional not required by the
  reference; at-least-once matches).
- rate limiting (producer.py:69 sleep) maps to `maxOffsetsPerTrigger`;
  the bounded 30,005-row replay (producer.py:14) maps to availableNow +
  the row cap.

This container has no Kafka broker or connector jar, so these builders are
exercised by unit tests only up to plan construction with a file/rate
source stand-in; the format("kafka") paths raise a clear error if invoked
without the spark-sql-kafka package on the classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def decode_json_stream(raw: DataFrame, schema: StructType) -> DataFrame:
    """value bytes → validated struct rows (O8). Corrupt or non-object
    payloads parse to an all-null struct (PERMISSIVE mode); dropping rows
    whose re-encoded struct is empty mirrors the consumer.py:47-49
    skip-non-dict semantics (a message carrying none of the schema's
    fields is equally useless)."""
    return (
        raw.select(
            F.from_json(F.col("value").cast("string"), schema).alias("d")
        )
        .filter(F.col("d").isNotNull() & (F.to_json(F.col("d")) != F.lit("{}")))
        .select("d.*")
    )


def encode_json(df: DataFrame) -> DataFrame:
    """struct → JSON bytes for the Kafka value (O4, producer.py:21)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: StructType,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """O7: Kafka streaming source with explicit-schema JSON decode."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:  # O6 rate limiting
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return decode_json_stream(reader.load(), schema)


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
):
    """O5: Kafka streaming sink (JSON-encoded values)."""
    return (
        encode_json(df)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
