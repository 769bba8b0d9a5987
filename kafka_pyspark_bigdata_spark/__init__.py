"""kafka_pyspark_bigdata_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference pipeline (krisadityabcde/Kafka_PySpark_BigData:
Kafka ingest -> micro-batch landing -> incremental ML training -> three
parameter-sweep inference queries), extended with the operators a
large-scale LLM-training-data pipeline needs (dedup, similarity search,
multimodal columns, text analysis).

Architecture: everything is a DataFrame logical plan (Catalyst optimizes;
Tungsten executes). Streaming is Structured Streaming. Python stays out of
the hot path: row-level logic is expressed with `pyspark.sql.functions`;
Arrow-batched `mapInPandas`/`applyInPandas` is used only where built-in
operators genuinely cannot express the semantics (multimodal decode).

Designed for 100 TB / 1000-executor scale even though tested on local[32]:
explicit schemas everywhere, broadcast joins for dimension tables, partial
(map-side) aggregation everywhere, no driver-side collect in any operator,
AQE-friendly shuffle sizing, and LSH-bucketed variants for the quadratic
similarity operators.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
