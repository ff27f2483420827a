"""Similarity search over ``embeddings`` (LLM-pipeline extension set):
brute-force cosine top-k (the exact baseline) and an LSH-bucketed
approximate variant (the scale path).

Vector math is pure Spark SQL array expressions (functions/vector.py):
zip_with + aggregate run inside codegen — no Python, no UDF. At 100 TB
the brute-force variant is a broadcast of the (small) query set against
a full scan of the corpus — embarrassingly parallel, one pass; the LSH
variant replaces the full scan with a bucket equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vector import cosine_similarity, dot, l2_norm
from . import query

#: vec_ids used as the query set for the retrieval ops (arbitrary but
#: fixed; same ids in the SQL oracles).
_QUERY_IDS = (0, 1, 2)


@query(
    "similarity_pairs",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id IN {_QUERY_IDS}),
         pair AS (
           SELECT q.vec_id AS query_id, e.vec_id,
                  (SELECT sum(CAST(a AS DOUBLE) * CAST(b AS DOUBLE))
                   FROM (SELECT unnest(q.embedding) AS a,
                                unnest(e.embedding) AS b)) AS dp,
                  (SELECT sqrt(sum(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)))
                   FROM (SELECT unnest(q.embedding) AS a)) AS nq,
                  (SELECT sqrt(sum(CAST(b AS DOUBLE) * CAST(b AS DOUBLE)))
                   FROM (SELECT unnest(e.embedding) AS b)) AS ne
           FROM q CROSS JOIN embeddings e
           WHERE e.vec_id NOT IN {_QUERY_IDS})
    SELECT query_id, vec_id,
           CAST(round(dp / (nq * ne), 4) AS DOUBLE) AS cosine
    FROM pair
    WHERE dp / (nq * ne) >= 0.15
    """,
)
def similarity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All corpus vectors with cosine ≥ 0.15 against 3 fixed query
    vectors — the thresholded (not top-k) form, so output membership is
    robust to last-bit float noise; score rounded to 4 decimals for
    hash parity."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = e.filter(~F.col("vec_id").isin(*_QUERY_IDS))
    cos = cosine_similarity(F.col("q_emb"), F.col("embedding"))
    return (
        corpus.crossJoin(F.broadcast(q))
        .select("query_id", "vec_id", cos.alias("cosine_raw"))
        .filter(F.col("cosine_raw") >= 0.15)
        .select(
            "query_id",
            "vec_id",
            F.round("cosine_raw", 4).cast("double").alias("cosine"),
        )
    )


@query("knn_bruteforce")
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 nearest neighbors (cosine) for each fixed query
    vector: broadcast queries × corpus scan → window top-k per query.

    Rows-only driver check (top-k membership at a float boundary isn't
    bit-stable across engines); pytest asserts exact agreement with a
    NumPy reference at sf0.001 instead.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = e.filter(~F.col("vec_id").isin(*_QUERY_IDS))
    scored = corpus.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        cosine_similarity(F.col("q_emb"), F.col("embedding")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id", F.round("cosine", 4).cast("double").alias("cosine"), "rank")
    )


@query("knn_lsh_approx")
def knn_lsh_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via random-hyperplane LSH (signed projections).

    Signature: sign of dot(v, h_j) for 24 seeded-Gaussian hyperplanes
    (literal arrays built once on the driver — constant-folded into the
    plan, no per-row hashing). Banding: 8 bands × 3 bits; candidates
    share at least one band; ranked by exact cosine within candidates.

    Scale: corpus signatures are one pass; the query side is broadcast.
    The full scan of brute force becomes an equi-join on band buckets.
    pytest measures recall@10 ≥ 0.5 vs knn_bruteforce at sf0.001.
    """
    import random

    e = load_table(spark, sf_dir, "embeddings")
    dim = 64
    n_planes, band_bits, n_bands = 24, 3, 8
    rng = random.Random(20240813)
    planes = [
        F.array(*[F.lit(rng.gauss(0.0, 1.0)) for _ in range(dim)])
        for _ in range(n_planes)
    ]

    def signature(emb: F.Column) -> F.Column:
        out = F.lit(0)
        for j, p in enumerate(planes):
            out = out + F.when(dot(emb, p) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        return out.cast("int")

    corpus = e.filter(~F.col("vec_id").isin(*_QUERY_IDS)).withColumn(
        "sig", signature(F.col("embedding"))
    )
    q = (
        e.filter(F.col("vec_id").isin(*_QUERY_IDS))
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
        .withColumn("q_sig", signature(F.col("q_emb")))
    )

    def bands(sig: F.Column, prefix: str) -> list[F.Column]:
        mask = (1 << band_bits) - 1
        return [
            F.shiftrightunsigned(sig, band_bits * c)
            .bitwiseAND(F.lit(mask))
            .alias(f"{prefix}{c}")
            for c in range(n_bands)
        ]

    corpus_b = corpus.select("vec_id", "embedding", "sig", *bands(F.col("sig"), "cb"))
    q_b = q.select("query_id", "q_emb", "q_sig", *bands(F.col("q_sig"), "qb"))
    band_match = None
    for c in range(n_bands):
        m = F.col(f"cb{c}") == F.col(f"qb{c}")
        band_match = m if band_match is None else (band_match | m)
    cands = corpus_b.crossJoin(F.broadcast(q_b)).filter(band_match)
    scored = cands.select(
        "query_id",
        "vec_id",
        cosine_similarity(F.col("q_emb"), F.col("embedding")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id",
            "vec_id",
            F.round("cosine", 4).cast("double").alias("cosine"),
            "rank",
        )
    )


@query(
    "embedding_norms",
    oracle="""
    SELECT label,
           count(*) AS n_vectors,
           CAST(round(min(nrm), 4) AS DOUBLE) AS min_norm,
           CAST(round(max(nrm), 4) AS DOUBLE) AS max_norm
    FROM (
      SELECT label,
             (SELECT sqrt(sum(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)))
              FROM (SELECT unnest(embedding) AS a)) AS nrm
      FROM embeddings)
    GROUP BY label
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-column hygiene op: L2-norm stats per label (catches
    zero/denormal vectors before they poison cosine math)."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", l2_norm(F.col("embedding")).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.min("nrm"), 4).cast("double").alias("min_norm"),
            F.round(F.max("nrm"), 4).cast("double").alias("max_norm"),
        )
    )
