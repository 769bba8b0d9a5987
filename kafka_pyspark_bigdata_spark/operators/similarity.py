"""Similarity search over embedding columns (array<float>).

Two paths:

- **Brute-force top-k** (`ann_topk_bruteforce`): broadcast the (small)
  query set against the corpus, compute cosine JVM-side with
  zip_with/aggregate (no Python in the loop), take top-k per query. Exact;
  cost O(|Q|·n) — the right baseline, and still the right answer at scale
  whenever |Q| is small because the corpus is scanned once, map-side only,
  with no shuffle of the corpus (the final top-k shuffles only |Q|·k rows).

- **LSH-bucketed** (`ann_lsh_bucketed`): random-hyperplane signatures
  (deterministic, seeded) bucket the corpus; each query searches only its
  bucket. Candidates drop from n to n/2^bits on average — the 100 TB path,
  trading recall for a bounded candidate set. The hyperplanes are literal
  constants, so the DuckDB oracle replicates the algorithm exactly.

- **IVF** (`ann_ivf`): inverted-file ANN — the standard coarse-quantizer
  design (Faiss-style IVF-Flat, public knowledge). Corpus vectors are
  assigned to their nearest of `IVF_NLIST` coarse centroids; each query
  probes its `IVF_NPROBE` nearest lists and scans only those candidates.
  Centroids here are the first `IVF_NLIST` corpus vectors (deterministic
  data-sampled init at every SF); at 100 TB they'd come from a k-means
  sample, but either way they are driver-resident state inlined as
  literals, so the corpus assignment is a pure map-side expression — ZERO
  shuffle for list assignment, and the probe join broadcasts |Q|·nprobe
  rows against the assigned corpus (map-side again). The only shuffle is
  the final per-query top-k window over the candidate set.

All are value-exact against the oracle: cosine is computed in double and
rounded to 6 decimals (reduction error over 64 terms ~1e-14).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.batch import load_table
from .dedup import _cos_sql, cosine_expr

TOP_K = 5
N_QUERIES = 10  # query set = vec_id < 10
LSH_BITS = 6
EMB_DIM = 64
_LSH_SEED = 7

# Deterministic hyperplanes, shared verbatim with the SQL oracle as literals.
_HYPERPLANES: list[list[float]] = [
    [float(x) for x in row]
    for row in np.random.RandomState(_LSH_SEED).standard_normal((LSH_BITS, EMB_DIM))
]


def _dot_with_literal(vec_col: str, plane: list[float]) -> Column:
    lit_arr = F.array(*[F.lit(x) for x in plane])
    return F.aggregate(
        F.zip_with(vec_col, lit_arr, lambda u, v: u.cast("double") * v),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def bucket_expr(vec_col: str) -> Column:
    """LSH bucket id: sign bits of the hyperplane dot products."""
    out = F.lit(0)
    for j, plane in enumerate(_HYPERPLANES):
        out = out + F.when(_dot_with_literal(vec_col, plane) > 0, F.lit(2**j)).otherwise(
            F.lit(0)
        )
    return out.cast("int")


def _plane_sql(plane: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"


def _bucket_sql(vec_col: str) -> str:
    terms = []
    for j, plane in enumerate(_HYPERPLANES):
        dot = (
            f"list_sum(list_transform(list_zip({vec_col}, {_plane_sql(plane)}),"
            f" p -> CAST(p[1] AS DOUBLE) * p[2]))"
        )
        terms.append(f"CASE WHEN {dot} > 0 THEN {2**j} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS INTEGER)"


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for each of the first 10 vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine_expr("qv", "cv").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


ANN_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         {_cos_sql('qv', 'c.embedding')} AS cosine
  FROM q JOIN embeddings c ON query_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {TOP_K} ORDER BY query_id, rank
"""


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5: each query only scores corpus vectors in its own
    random-hyperplane bucket. Join key is the bucket id — a plain shuffle
    (or broadcast) equi-join; candidates per query shrink by ~2^bits."""
    emb = load_table(spark, sf_dir, "embeddings")
    with_bucket = emb.select(
        "vec_id", "embedding", bucket_expr("embedding").alias("bucket")
    )
    q = with_bucket.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "bucket"
    )
    c = with_bucket.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"), "bucket"
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine_expr("qv", "cv").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


def _ann_lsh_sql() -> str:
    return f"""
WITH wb AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM wb WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         {_cos_sql('qv', 'c.embedding')} AS cosine
  FROM q JOIN wb c USING (bucket)
  WHERE query_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {TOP_K} ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------

IVF_NLIST = 16
IVF_NPROBE = 4


def _cosine_to_lit(vec_col: str, vec: list[float]) -> Column:
    """Cosine between an array<float> column and a literal vector, double
    math + round-6 — the same contract as ``cosine_expr`` so the DuckDB
    oracle (which computes the centroid side from the table) agrees."""
    lit_arr = F.array(*[F.lit(float(x)) for x in vec])
    dot = F.aggregate(
        F.zip_with(vec_col, lit_arr, lambda u, v: u.cast("double") * v),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    col_norm = F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda u: u.cast("double") * u.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    lit_norm = math.sqrt(sum(float(x) * float(x) for x in vec))
    return F.round(dot / (col_norm * F.lit(lit_norm)), 6)


def _centroid_sim_array(vec_col: str, cents: list[tuple[int, list[float]]]) -> Column:
    """array<struct<s: similarity, ncid: -centroid_id>> — struct ordering
    makes array_max/array_sort pick highest similarity with ties broken
    toward the SMALLEST centroid id (ncid is negated)."""
    return F.array(
        *[
            F.struct(
                _cosine_to_lit(vec_col, vec).alias("s"),
                F.lit(-cid).alias("ncid"),
            )
            for cid, vec in cents
        ]
    )


def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN: top-5 per query, scanning only the query's IVF_NPROBE
    nearest centroid lists.

    The centroid table (IVF_NLIST rows) is collected once at plan-build
    time and inlined as literals — corpus list-assignment is then a
    map-side expression over the scan (no join, no shuffle), exactly how a
    production IVF keeps its coarse quantizer in executor memory. A
    (query, neighbor) pair can appear in at most one probed list (each
    corpus vector lives in exactly one list), so no candidate dedup is
    needed before the top-k window.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cents = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < IVF_NLIST)
        .select("vec_id", "embedding")
        .collect()
    )
    sim_arr = _centroid_sim_array("embedding", cents)
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        (-F.array_max(sim_arr)["ncid"]).cast("int").alias("list_id"),
    )
    # top-NPROBE lists per query: sort asc by (s, ncid), reverse → desc by
    # s with ties toward smaller centroid id, take the first NPROBE.
    probes = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.explode(
                F.slice(F.reverse(F.array_sort(sim_arr)), 1, IVF_NPROBE)
            ).alias("pr"),
        )
        .select("query_id", "qv", (-F.col("pr.ncid")).cast("int").alias("list_id"))
    )
    scored = (
        F.broadcast(probes)
        .join(corpus, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine_expr("qv", "cv").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


ANN_IVF_SQL = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {IVF_NLIST}
),
sims AS (
  SELECT e.vec_id, e.embedding, c.cid,
         {_cos_sql('e.embedding', 'c.cv')} AS sim
  FROM embeddings e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id AS neighbor_id, embedding AS cv, cid AS list_id FROM (
    SELECT vec_id, embedding, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
    FROM sims
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, embedding AS qv, cid AS list_id FROM (
    SELECT vec_id, embedding, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
    FROM sims WHERE vec_id < {N_QUERIES}
  ) WHERE rn <= {IVF_NPROBE}
),
scored AS (
  SELECT query_id, neighbor_id, {_cos_sql('qv', 'cv')} AS cosine
  FROM probes JOIN assigned USING (list_id)
  WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {TOP_K} ORDER BY query_id, rank
"""


QUERIES = {
    "ann_topk_bruteforce": ann_topk_bruteforce,
    "ann_lsh_bucketed": ann_lsh_bucketed,
    "ann_ivf": ann_ivf,
}

ORACLES = {
    "ann_topk_bruteforce": ANN_TOPK_SQL,
    "ann_lsh_bucketed": _ann_lsh_sql(),
    "ann_ivf": ANN_IVF_SQL,
}
