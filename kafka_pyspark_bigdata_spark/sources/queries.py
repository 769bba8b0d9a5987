"""Source/sink driver-contract queries: prove the CSV and JSON codecs are
LOSSLESS by round-tripping fixture data through them and hash-comparing an
aggregate against the oracle computed on the original parquet.

Covers reference O1/O10 (CSV scan/sink with header — producer.py:33-35,
consumer.py:61-67) and O4/O8 (JSON encode/decode — producer.py:21,
consumer.py:24) with value-exact oracles, not just unit tests: Spark's CSV
writer emits shortest-round-trip doubles (Java ``Double.toString``) and the
explicit-schema reader parses them back to the identical bits, so the
post-round-trip aggregate must hash-match the parquet-side oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.numeric import dsum, dsum_sql
from ..streaming.kafka import decode_json_stream, encode_json
from .batch import load_table, read_csv, scratch_dir, write_csv

_RT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
    ]
)


def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → CSV files with header (O10) → explicit-schema scan (O1) →
    aggregate. The oracle aggregates the original parquet: a hash match
    proves the text codec loses nothing."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    out = os.path.join(scratch_dir("csv_rt", sf_dir), "events_csv")
    write_csv(ev, out)
    back = read_csv(spark, out, _RT_SCHEMA)
    return (
        back.groupBy("event_type")
        .agg(F.count("*").alias("n_rows"), dsum("value").alias("sum_value"))
        .orderBy("event_type")
    )


Q_CSV_ROUNDTRIP_SQL = f"""
SELECT event_type, COUNT(*) AS n_rows, {dsum_sql('value')} AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → ``to_json(struct(*))`` value bytes (O4) → ``from_json``
    with explicit schema + validity filter (O8) → aggregate, all in ONE
    plan (the batch shape of the Kafka value codec path)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    decoded = decode_json_stream(encode_json(ev), _RT_SCHEMA)
    return (
        decoded.groupBy("event_type")
        .agg(F.count("*").alias("n_rows"), dsum("value").alias("sum_value"))
        .orderBy("event_type")
    )


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON-lines files → explicit-schema scan → aggregate: the
    third file format (after parquet fixtures and CSV batches), same
    losslessness contract."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    out = os.path.join(scratch_dir("jsonl_rt", sf_dir), "events_jsonl")
    ev.write.mode("overwrite").json(out)
    back = spark.read.schema(_RT_SCHEMA).json(out)
    return (
        back.groupBy("event_type")
        .agg(F.count("*").alias("n_rows"), dsum("value").alias("sum_value"))
        .orderBy("event_type")
    )


QUERIES = {
    "q_csv_roundtrip": q_csv_roundtrip,
    "q_json_roundtrip": q_json_roundtrip,
    "q_jsonl_roundtrip": q_jsonl_roundtrip,
}

ORACLES = {
    "q_csv_roundtrip": Q_CSV_ROUNDTRIP_SQL,
    "q_json_roundtrip": Q_CSV_ROUNDTRIP_SQL,
    "q_jsonl_roundtrip": Q_CSV_ROUNDTRIP_SQL,
}
