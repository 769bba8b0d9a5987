"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design (the whole point of these ops at 100 TB):

- **exact**: hash-groupBy on an md5 fingerprint — one shuffle of
  (16-byte key, id), the canonical distributed dedup.
- **n-gram Jaccard**: inverted-index self-join (explode shingles, join on
  shingle, count per pair) — candidate pairs are generated only for docs
  that SHARE a shingle, never the n² cross join. Shuffle keys are shingles;
  AQE's skew-join handles hot shingles (a doc-frequency cap is the standard
  extra mitigation, applied identically in the oracle).
- **MinHash+LSH**: per-doc signatures (min of md5 over shingles, k
  independent salts — map-side only), banded into b buckets; docs sharing a
  band bucket become candidates; exact Jaccard verifies. Work is
  O(candidates), not O(n²) — this is the scale path for fuzzy dedup.
- **SimHash**: 16-bit fingerprint from token-hash bit votes — map-side
  explode + partial-agg sums; near-dups collide on the fingerprint key.
- **embedding cosine**: exact pairwise at small n (oracle-checkable);
  the LSH-bucketed variant for scale lives in operators/similarity.

Everything is expressed with built-in functions (md5, array ops, explode,
groupBy) — no Python in the hot path — and every operator has a value-exact
DuckDB oracle built from the same md5/tokenization contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table
from .text import NORMALIZED_SQL, TOKENS_SQL, normalized_text_expr, with_tokens

# MinHash/LSH parameters: 16 hashes in 4 bands of 4 rows → catches
# Jaccard >= ~0.7 with high probability; verified exactly afterwards.
NUM_HASHES = 16
NUM_BANDS = 4
ROWS_PER_BAND = 4
MINHASH_VERIFY_THRESHOLD = 0.7
JACCARD_THRESHOLD = 0.8
COSINE_DUP_THRESHOLD = 0.45


# ---------------------------------------------------------------------------
# shared shingling
# ---------------------------------------------------------------------------

def with_shingles(df: DataFrame) -> DataFrame:
    """Distinct word-3-gram shingles; docs with <3 tokens are dropped (no
    shingle support)."""
    return (
        with_tokens(df)
        .filter(F.size("toks") >= 3)
        .withColumn(
            "shingles",
            F.expr(
                "array_distinct(transform(sequence(0, size(toks)-3),"
                " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"
            ),
        )
    )


SHINGLES_CTE = f"""
tok AS (SELECT doc_id, {TOKENS_SQL} AS toks FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                        for i in range(1, len(t)-1)]) AS shingles
  FROM (SELECT doc_id, toks AS t FROM tok WHERE len(toks) >= 3)
)
"""


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: one row per distinct normalized text,
    with the canonical (minimum) doc_id and the copy count."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.md5(F.encode(normalized_text_expr(), "UTF-8")).alias("fp")
        )
        .groupBy("fp")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count("*").alias("n_copies"))
        .orderBy("canonical_doc_id")
    )


DEDUP_EXACT_SQL = f"""
SELECT md5({NORMALIZED_SQL}) AS fp,
       MIN(doc_id) AS canonical_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1 ORDER BY canonical_doc_id
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard (inverted-index join)
# ---------------------------------------------------------------------------

def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with 3-gram-shingle Jaccard >= 0.8.

    Candidate generation is an inverted-index self-join on shingle;
    |A∩B| comes from the pair-count, |A|,|B| from per-doc sizes. All
    integer arithmetic + one exact double division.
    """
    sh = with_shingles(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "shingles", F.size("shingles").alias("n_sh")
    )
    inv = sh.select("doc_id", "n_sh", F.explode("shingles").alias("sh"))
    a, b = inv.alias("a"), inv.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return (
        common.select("doc_a", "doc_b", "n_common", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


DEDUP_NGRAM_SQL = f"""
WITH {SHINGLES_CTE},
inv AS (
  SELECT doc_id, len(shingles) AS n_sh, UNNEST(shingles) AS s FROM sh
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS n_common
  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, n_common,
       CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jaccard
FROM pairs
WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _sig(i: int) -> Column:
    """MinHash signature i: lexicographic min of salted md5 over shingles.
    Min-wise hashing over the md5 ordering — deterministic and portable."""
    return F.array_min(
        F.transform(
            "shingles", lambda s: F.md5(F.encode(F.concat(F.lit(f"{i}:"), s), "UTF-8"))
        )
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard-verified at >= 0.7.

    Signatures and band keys are map-side expressions; candidates come from
    b small equi-joins on band keys (shuffle keys are 16-byte hashes,
    volume O(n·b) not O(n²)); the exact verify touches only candidates.
    """
    docs = with_shingles(load_table(spark, sf_dir, "documents"))
    sigs = docs.select(
        "doc_id",
        "shingles",
        *[_sig(i).alias(f"sig{i}") for i in range(NUM_HASHES)],
    )
    bands = sigs.select(
        "doc_id",
        "shingles",
        *[
            F.md5(
                F.encode(
                    F.concat_ws(
                        "|",
                        *[
                            f"sig{b * ROWS_PER_BAND + r}"
                            for r in range(ROWS_PER_BAND)
                        ],
                    ),
                    "UTF-8",
                )
            ).alias(f"band{b}")
            for b in range(NUM_BANDS)
        ],
    )
    cand = None
    for b in range(NUM_BANDS):
        lhs = bands.select(
            F.col("doc_id").alias("doc_a"),
            F.col("shingles").alias("sh_a"),
            F.col(f"band{b}").alias("bk"),
        )
        rhs = bands.select(
            F.col("doc_id").alias("doc_b"),
            F.col("shingles").alias("sh_b"),
            F.col(f"band{b}").alias("bk"),
        )
        pairs = lhs.join(rhs, "bk").filter(F.col("doc_a") < F.col("doc_b"))
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.select("doc_a", "doc_b", "sh_a", "sh_b").dropDuplicates(
        ["doc_a", "doc_b"]
    )
    n_common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = n_common.cast("double") / (
        F.size("sh_a") + F.size("sh_b") - n_common
    )
    return (
        cand.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= MINHASH_VERIFY_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


def _minhash_sql() -> str:
    sig_exprs = ",\n         ".join(
        f"MIN(md5('{i}:' || s)) AS sig{i}" for i in range(NUM_HASHES)
    )
    band_exprs = ",\n         ".join(
        "md5("
        + " || '|' || ".join(
            f"sig{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
        )
        + f") AS band{b}"
        for b in range(NUM_BANDS)
    )
    band_union = "\n  UNION ALL\n".join(
        f"  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b"
        f" FROM bands a JOIN bands b ON a.band{b} = b.band{b}"
        f" AND a.doc_id < b.doc_id"
        for b in range(NUM_BANDS)
    )
    return f"""
WITH {SHINGLES_CTE},
sigs AS (
  SELECT doc_id,
         {sig_exprs}
  FROM (SELECT doc_id, UNNEST(shingles) AS s FROM sh)
  GROUP BY doc_id
),
bands AS (
  SELECT doc_id,
         {band_exprs}
  FROM sigs
),
cand AS (
  SELECT DISTINCT doc_a, doc_b FROM (
{band_union}
  )
),
verified AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
           / (len(x.shingles) + len(y.shingles)
              - len(list_intersect(x.shingles, y.shingles))) AS jaccard
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc_a
  JOIN sh y ON y.doc_id = c.doc_b
)
SELECT doc_a, doc_b, jaccard FROM verified
WHERE jaccard >= {MINHASH_VERIFY_THRESHOLD}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprint per document: each distinct token votes
    ±1 on every bit of its md5-derived hash; fingerprint bit = sign of the
    vote sum. Explode + partial-agg — fully distributed, one shuffle on
    doc_id."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(F.array_distinct("toks")).alias("tok"))
    h = F.conv(F.substring(F.md5(F.encode("tok", "UTF-8")), 1, 4), 16, 10).cast(
        "bigint"
    )
    votes = tok.select("doc_id", h.alias("h")).groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(h >> {b}) & 1") == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    fp = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return votes.select("doc_id", fp.cast("bigint").alias("simhash")).orderBy(
        "doc_id"
    )


def _simhash_sql() -> str:
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"CASE WHEN v{b} > 0 THEN {2**b} ELSE 0 END" for b in range(SIMHASH_BITS)
    )
    return f"""
WITH tok AS (SELECT doc_id, {TOKENS_SQL} AS toks FROM documents),
t AS (SELECT DISTINCT doc_id, UNNEST(toks) AS tok FROM tok),
h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 4))::BIGINT AS h FROM t),
votes AS (
  SELECT doc_id,
         {votes}
  FROM h GROUP BY doc_id
)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash
FROM votes ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def cosine_expr(a: str, b: str, scale: int = 6) -> Column:
    """Cosine similarity between two array<float> columns, computed in
    double and rounded to 6 decimals (64-term reduction error ~1e-14, so
    rounding is engine-portable)."""
    def dot(x: str, y: str) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda u, v: u.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def norm(x: str) -> Column:
        return F.sqrt(
            F.aggregate(
                F.transform(x, lambda u: u.cast("double") * u.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )

    return F.round(dot(a, b) / (norm(a) * norm(b)), scale)


def _cos_sql(a: str, b: str) -> str:
    return (
        f"ROUND(list_sum(list_transform(list_zip({a}, {b}),"
        f" p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
        f" / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        f" * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)"
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine >= 0.45 over all pairs (exact at
    oracle scale; the LSH-bucketed variant in operators/similarity is the
    100 TB path — same verify expression, candidates from hyperplane
    buckets instead of the cross join)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_expr("va", "vb").alias("cosine"))
        .filter(F.col("cosine") >= COSINE_DUP_THRESHOLD)
        .orderBy("id_a", "id_b")
    )


DEDUP_EMBEDDING_SQL = f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_cos_sql('a.embedding', 'b.embedding')} AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {_cos_sql('a.embedding', 'b.embedding')} >= {COSINE_DUP_THRESHOLD}
ORDER BY id_a, id_b
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding_cosine": dedup_embedding_cosine,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": DEDUP_NGRAM_SQL,
    "dedup_minhash_lsh": _minhash_sql(),
    "dedup_simhash": _simhash_sql(),
    "dedup_embedding_cosine": DEDUP_EMBEDDING_SQL,
}
