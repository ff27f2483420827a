"""Product-quantized ANN — the compressed-corpus scale path.

Implements PQ (Jégou, Douze & Schmid 2011, "Product Quantization for
Nearest Neighbor Search", IEEE TPAMI 33(1)) over the ``embeddings``
table: split each L2-normalized d-dim vector into ``m`` subvectors,
k-means each subspace into ``ksub`` centroids, and store each vector as
``m`` small codes. With d=64 float32 and m=8/ksub=16 the corpus
shrinks 32× (256 B → 8 B per vector), which is the difference between
"the index fits in cluster memory" and "every query is an IO scan" at
100 TB: a 100 TB float32 corpus PQ-encodes to ~3 TB of codes.

Search is ADC (asymmetric distance computation): the QUERY stays
unquantized; per query one tiny lookup table T[m][ksub] of
subvector·centroid dot products is built on the driver, and a corpus
row's approximate cosine is ``Σ_j T[j][code_j]`` — m table lookups per
row, no float multiply on the scan side, vectorized here as one numpy
gather per Arrow batch. Ranking then re-ranks the top ``refine`` ADC
candidates by EXACT cosine (the standard refine step), so recall
degrades gracefully: ADC only has to get the true neighbors into the
candidate pool, not order them.

Composition with IVF (:mod:`.similarity`): `ivf_pq_topk` routes each
query to its ``nprobe`` nearest coarse cells first (IVF-PQ, the FAISS
``IVFx,PQy`` index shape) — partition pruning cuts the candidate set
by nprobe/K and ADC cuts the bytes per candidate by ~32×; the two
wins multiply.

Scale shape: training is one bounded 256-row driver sample (the same
deterministic xxhash64-ordered sample the IVF quantizer uses); encode
is one Arrow-batched corpus pass with the (m·ksub·dsub ≈ 8 KB)
codebook broadcast in the UDF closure; search scans only codes.
Nothing driver-side ever touches the corpus.

No reference-file citation: the reference (791-LoC Glue/Hudi report
job) has no vector search; grounding is the public PQ paper and the
brief's similarity-search extension mandate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vector import cosine_similarity
from .similarity import (
    _QUERY_IDS,
    _probe_cells,
    _query_matrix,
    _train_ivf_centroids,
    _ivf_cell_udf,
)

#: trained codebooks per (applicationId, corpus_id, m, ksub) — tiny
#: numpy arrays (m·ksub·dsub floats), so a plain dict cache; evicted
#: alongside the other similarity caches on app change.
_PQ_CACHE: dict[tuple[str, str, int, int], np.ndarray] = {}


def train_pq_codebooks(
    e: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 10,
    *,
    corpus_id: str,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Train the ``(m, ksub, d/m)`` PQ codebooks: per-subspace Lloyd's
    k-means on a deterministic 256-row sample of L2-NORMALIZED vectors
    (normalizing first makes ADC sums approximate cosine directly).
    Deterministic: sample order is xxhash64(id), centroids seed from
    the first ``ksub`` sample rows, no RNG anywhere — two trainings on
    the same corpus are byte-identical, which is what lets tests pin
    recall and lets a production run re-derive the codebooks instead
    of versioning them.
    """
    from . import evict_dead_app_entries

    key = (e.sparkSession.sparkContext.applicationId, corpus_id, m, ksub)
    evict_dead_app_entries(_PQ_CACHE, key[0])
    hit = _PQ_CACHE.get(key)
    if hit is not None:
        return hit
    sample = np.stack(
        [
            np.asarray(r[emb_col], dtype=np.float64)
            for r in e.select(id_col, emb_col)
            .orderBy(F.xxhash64(id_col))
            .limit(256)
            .collect()
        ]
    )
    d = sample.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m} subvectors")
    if ksub > len(sample):
        raise ValueError(
            f"ksub={ksub} exceeds the {len(sample)}-row training sample"
        )
    # same zero-norm clamp as pq_encode: one all-zero vector in the
    # sample must not NaN-poison every codebook (and the deterministic
    # cache would then pin the poisoned books for the app's lifetime)
    sample /= np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-30
    )
    dsub = d // m
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        cent = sub[:ksub].copy()
        for _ in range(iters):
            # squared-L2 assignment via the expanded form; argmin over
            # ksub candidates per sample row
            d2 = (
                (sub**2).sum(axis=1, keepdims=True)
                - 2.0 * (sub @ cent.T)
                + (cent**2).sum(axis=1)
            )
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    _PQ_CACHE[key] = books
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    emb_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """One Arrow-batched pass: append ``code_col`` = the vector's m
    sub-codes (array<smallint>; values < ksub ≤ 2¹⁵ — parquet's RLE/
    dictionary encoding stores them at ~byte cost). Vectors are
    L2-normalized before coding (matching training); NULL embeddings
    code to NULL."""
    m, ksub, dsub = codebooks.shape
    books = codebooks  # closure capture

    @F.pandas_udf("array<smallint>")
    def encode(emb: pd.Series) -> pd.Series:
        out: list = []
        mask = emb.notna()
        if not mask.any():
            return pd.Series([None] * len(emb))
        X = np.stack(emb[mask].to_numpy()).astype(np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        codes = np.empty((len(X), m), dtype=np.int16)
        for j in range(m):
            sub = X[:, j * dsub : (j + 1) * dsub]
            cent = books[j]
            d2 = (
                (sub**2).sum(axis=1, keepdims=True)
                - 2.0 * (sub @ cent.T)
                + (cent**2).sum(axis=1)
            )
            codes[:, j] = np.argmin(d2, axis=1).astype(np.int16)
        it = iter(codes)
        for ok in mask:
            out.append(next(it) if ok else None)
        return pd.Series(out)

    return df.withColumn(code_col, encode(F.col(emb_col)))


def pq_decode(
    df: DataFrame,
    codebooks: np.ndarray,
    code_col: str = "pq_code",
    out_col: str = "pq_approx",
) -> DataFrame:
    """Reconstruct the quantized (normalized-space) vector from its
    codes — the centroid concatenation. For tests and for downstream
    consumers that want the compressed corpus back as (approximate)
    vectors; reconstruction error IS the quantization error."""
    books = codebooks

    @F.pandas_udf("array<float>")
    def decode(codes: pd.Series) -> pd.Series:
        out: list = []
        for c in codes:
            if c is None:
                out.append(None)
                continue
            c = np.asarray(c, dtype=np.int64)
            out.append(
                np.concatenate(
                    [books[j][c[j]] for j in range(len(c))]
                ).astype(np.float32)
            )
        return pd.Series(out)

    return df.withColumn(out_col, decode(F.col(code_col)))


def _adc_luts(Qn: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Per-query ADC lookup tables: L[q][j][c] = q_sub_j · codebook[j][c]
    — (n_queries, m, ksub) doubles, a few KB; built once per search on
    the driver and closure-broadcast."""
    m, ksub, dsub = codebooks.shape
    n = Qn.shape[0]
    L = np.empty((n, m, ksub))
    for j in range(m):
        L[:, j, :] = Qn[:, j * dsub : (j + 1) * dsub] @ codebooks[j].T
    return L


def _adc_score_udf(luts: np.ndarray, qid_index: dict[int, int], m: int):
    """(query_id, pq_code) → approximate cosine: one numpy gather+sum
    per Arrow batch — no float multiplies on the scan side."""
    jj = np.arange(m)

    @F.pandas_udf("double")
    def adc(qid: pd.Series, codes: pd.Series) -> pd.Series:
        n = len(qid)
        if n == 0:
            return pd.Series([], dtype="float64")
        C = np.stack(codes.to_numpy()).astype(np.int64)  # (n, m)
        qs = qid.map(qid_index).to_numpy(dtype=np.int64)
        out = np.empty(n)
        for q in np.unique(qs):
            sel = qs == q
            out[sel] = luts[q][jj[None, :], C[sel]].sum(axis=1)
        return pd.Series(out)

    return adc


#: the candidate-pool fraction ``refine="auto"`` holds constant —
#: the value the r8 organic-x10 measurement validated: recall tracks
#: pool FRACTION, not absolute pool size (2.5% gave 0.37 at 2k vectors
#: and 0.70 at 20k; the 2k-tuned absolute 50 decayed to 0.23 at 20k)
AUTO_REFINE_FRACTION = 0.025


#: auto IVF cell sizing: target rows per coarse cell. Keeps each
#: probed directory's ADC scan bounded as the corpus grows (K grows
#: linearly with n instead of cells silently fattening) — the FAISS
#: sizing guidance band (between √n and n/256) for this corpus range.
AUTO_CELL_ROWS = 2000

#: the cell fraction ``nprobe="auto"`` holds constant (r10, VERDICT r9
#: #7): 8/16 = the measured x1 operating point. A fixed absolute
#: nprobe decays recall exactly the way fixed refine did once the cell
#: count grows — probing 8 of 160 cells visits 5% of the corpus where
#: 8 of 16 visited 50%.
AUTO_NPROBE_FRACTION = 0.5


def resolve_cells(K, corpus_count) -> int:
    """Materialize the IVF cell-count dial: an int passes through;
    ``"auto"`` sizes K to hold :data:`AUTO_CELL_ROWS` rows per cell
    (floor 16) from the corpus count at train time — so cells stay
    scan-bounded as the corpus grows instead of fattening under a
    fixed K. ``corpus_count`` may be a zero-arg callable, evaluated
    only on the auto branch."""
    if K == "auto":
        import math

        n = corpus_count() if callable(corpus_count) else corpus_count
        return max(16, math.ceil(n / AUTO_CELL_ROWS))
    if not isinstance(K, int):
        raise ValueError(f"K={K!r}: pass an int cell count or 'auto'")
    return K


def resolve_nprobe(nprobe, n_cells: int) -> int:
    """Materialize the ``nprobe`` dial (r10, VERDICT r9 #7): an int
    passes through; ``"auto"`` derives the probe count from the CELL
    COUNT at search time — ``max(8, ceil(0.5 · K))``, clamped to K —
    holding the probed-cell FRACTION constant as the index grows (the
    same iso-fraction rule ``refine="auto"`` applies to the re-rank
    pool, and the same measured failure mode it fixed: an absolute
    dial tuned at one scale silently decays at the next)."""
    if nprobe == "auto":
        import math

        return min(
            int(n_cells),
            max(8, math.ceil(AUTO_NPROBE_FRACTION * n_cells)),
        )
    if not isinstance(nprobe, int):
        raise ValueError(
            f"nprobe={nprobe!r}: pass an int probe count or 'auto'"
        )
    return nprobe


def resolve_refine(refine, corpus_count, k: int) -> int:
    """Materialize the ``refine`` dial (r9, VERDICT r8 #3): an int
    passes through; ``"auto"`` derives the pool from the INDEXED
    corpus count at search time — ``max(50, 5k, 2.5% of corpus)`` —
    so recall no longer silently decays as the index grows (the
    measured failure mode of a fixed absolute pool). The floor keeps
    tiny corpora from starving the exact re-rank below the answer
    size. ``corpus_count`` may be a zero-arg callable — evaluated ONLY
    on the auto branch, so an explicit int ``refine`` never pays the
    count job."""
    if refine == "auto":
        import math

        n = corpus_count() if callable(corpus_count) else corpus_count
        return max(50, 5 * k, math.ceil(AUTO_REFINE_FRACTION * n))
    if not isinstance(refine, int):
        raise ValueError(
            f"refine={refine!r}: pass an int pool size or 'auto'"
        )
    return refine


def _rerank_exact(
    cands: DataFrame, q: DataFrame, k: int
) -> DataFrame:
    """Exact-cosine re-rank of an ADC candidate pool → the
    knn_bruteforce output shape (query_id, vec_id, cosine, rank)."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_raw"), F.asc("vec_id")
    )
    return (
        cands.join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("q_emb"), F.col("embedding")).alias(
                "cosine_raw"
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            (F.round("cosine_raw", 4) + F.lit(0.0))
            .cast("double")
            .alias("cosine"),
            "rank",
        )
    )


def _adc_rerank(
    e: DataFrame,
    cand_pairs: DataFrame,
    books: np.ndarray,
    k: int,
    refine: int,
    qids,
    Qn: np.ndarray,
) -> DataFrame:
    """The shared ADC search tail (every entry point funnels here, so
    scoring/tie-break/refine fixes land once): score (query_id,
    vec_id, pq_code) candidate pairs, keep the top ``refine`` per
    query by ADC, re-rank exactly. NULL codes (NULL embeddings) can
    never be neighbors and are dropped before the scorer (np.stack
    can't mix None rows)."""
    luts = _adc_luts(Qn, books)
    adc = _adc_score_udf(
        luts, {int(v): i for i, v in enumerate(qids)}, books.shape[0]
    )
    aw = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), F.asc("vec_id")
    )
    cands = (
        cand_pairs.filter(F.col("pq_code").isNotNull())
        .select(
            "query_id",
            "vec_id",
            adc(F.col("query_id"), F.col("pq_code")).alias("adc"),
        )
        .withColumn("arank", F.row_number().over(aw))
        .filter(F.col("arank") <= refine)
        .select("query_id", "vec_id")
        .join(e.select("vec_id", "embedding"), "vec_id")
    )
    q = e.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    return _rerank_exact(cands, q, k)


def _encoded_cells(
    e: DataFrame, cent: np.ndarray, books: np.ndarray
) -> DataFrame:
    """Non-query corpus rows with their coarse cell and PQ codes —
    shared by the in-session IVF-PQ search and the partitioned write."""
    return pq_encode(
        e.filter(~F.col("vec_id").isin(*_QUERY_IDS)).withColumn(
            "cell", _ivf_cell_udf(cent)("embedding")
        ),
        books,
    )


def pq_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    refine: int | str = "auto",
) -> DataFrame:
    """Top-k per fixed query via a full ADC scan of the PQ-encoded
    corpus, refined by exact cosine on the top ``refine`` ADC
    candidates. The 100 TB reading: the scan touches only the m-byte
    codes (~32× fewer bytes than the raw vectors), and the exact
    re-rank touches ``refine`` rows per query — recall is set by
    whether ADC surfaces the true neighbors into a pool 5× the answer
    size, a far weaker demand than ordering them."""
    e = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(e, m=m, ksub=ksub, corpus_id=sf_dir)
    corpus_rows = e.filter(~F.col("vec_id").isin(*_QUERY_IDS))
    refine = resolve_refine(refine, corpus_rows.count, k)
    corpus = pq_encode(corpus_rows, books)
    qids, Qn = _query_matrix(e)
    qframe = spark.createDataFrame(
        [(int(i),) for i in qids], "query_id long"
    )
    return _adc_rerank(
        e,
        corpus.crossJoin(F.broadcast(qframe)),
        books,
        k,
        refine,
        qids,
        Qn,
    )


def save_pq_codebooks(
    codebooks: np.ndarray,
    path: str,
    centroids: np.ndarray | None = None,
) -> None:
    """Persist trained codebooks — and, for an IVF-PQ layout, the
    coarse centroids — as JSON next to the encoded corpus: codes are
    meaningless without their books and cells without their
    quantizer, so all three version together and a FRESH process can
    probe the layout without retraining anything. (JSON, not pickle:
    tiny, portable, inspectable.)"""
    import json
    import os

    doc = {
        "m": int(codebooks.shape[0]),
        "ksub": int(codebooks.shape[1]),
        "dsub": int(codebooks.shape[2]),
        "books": codebooks.tolist(),
    }
    if centroids is not None:
        doc["centroids"] = centroids.tolist()
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, path)


def load_pq_codebooks(
    path: str, with_centroids: bool = False
) -> np.ndarray | tuple[np.ndarray, np.ndarray | None]:
    import json

    with open(path) as f:
        doc = json.load(f)
    books = np.asarray(doc["books"], dtype=np.float64)
    if books.shape != (doc["m"], doc["ksub"], doc["dsub"]):
        raise ValueError(
            f"codebook file {path} shape {books.shape} disagrees with "
            f"its own header ({doc['m']}, {doc['ksub']}, {doc['dsub']})"
        )
    if not with_centroids:
        return books
    cent = doc.get("centroids")
    return books, (None if cent is None else np.asarray(cent, dtype=np.float64))


def ivf_pq_write_partitioned(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    K: int | str = 16,
    m: int = 8,
    ksub: int = 16,
) -> tuple[np.ndarray, np.ndarray]:
    """The IVF-PQ production layout: the corpus written as
    ``cell=<k>/`` hive partitions whose rows are ONLY (vec_id,
    pq_code) — the compressed index table. At 100 TB this is the whole
    design: a probe lists nprobe/K directories (partition pruning) and
    scans m-byte codes (~32× fewer bytes than raw vectors); the raw
    embeddings stay in the primary table and are touched only by the
    final top-``refine`` exact re-rank, a key-join of a few hundred
    rows per query. Codebooks and centroids persist beside the data
    (``_pq_books.json``), versioned with the codes they decode.

    Returns ``(centroids, codebooks)``."""
    import os

    e = load_table(spark, sf_dir, "embeddings")
    K = resolve_cells(
        K, e.filter(~F.col("vec_id").isin(*_QUERY_IDS)).count
    )
    cent = _train_ivf_centroids(e, K=K, corpus_id=sf_dir)
    books = train_pq_codebooks(e, m=m, ksub=ksub, corpus_id=sf_dir)
    corpus = _encoded_cells(e, cent, books).select(
        "vec_id", "cell", "pq_code"
    )
    # one task per cell writes its whole directory (the
    # ivf_write_partitioned rationale: K× fewer files, parallel commits)
    corpus.repartition(K, "cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(out_path)
    save_pq_codebooks(
        books, os.path.join(out_path, "_pq_books.json"), centroids=cent
    )
    return cent, books


def ivf_pq_append(
    spark: SparkSession,
    new_vectors: DataFrame,
    table_path: str,
) -> int:
    """Incremental index maintenance: encode NEW vectors with the
    layout's PERSISTED quantizers (never retrained — retraining would
    re-route existing cells and invalidate every stored code) and
    append them into their cell partitions. Returns the appended row
    count. The append-vs-rebuild contract: a probe over (build(A) then
    append(B)) returns exactly what a probe over build(A ∪ B) with the
    SAME quantizers returns — pinned by test. Quantizer drift is the
    operator's compaction decision: when the corpus distribution has
    moved far from the training sample, rebuild the layout (a rewrite,
    like any clustering pass), don't retrain in place."""
    import os

    books, cent = load_pq_codebooks(
        os.path.join(table_path, "_pq_books.json"), with_centroids=True
    )
    if cent is None:
        raise ValueError(
            f"{table_path}/_pq_books.json carries no centroids — "
            "append requires the layout's own coarse quantizer"
        )
    # same exclusion the BUILD path applies (_encoded_cells): the fixed
    # query vectors must never enter the layout, or a re-ingested query
    # id would return itself at rank 1 and break append≡rebuild
    new_vectors = new_vectors.filter(
        ~F.col("vec_id").isin(*_QUERY_IDS)
    )
    coded = pq_encode(
        new_vectors.withColumn(
            "cell", _ivf_cell_udf(cent)("embedding")
        ),
        books,
    ).select("vec_id", "cell", "pq_code")
    # count the INPUT (no UDFs in its plan): encode preserves rows, and
    # counting `coded` would run the cell+encode pandas UDFs twice —
    # once for the count, once for the write
    n = new_vectors.count()
    K = cent.shape[0]
    coded.repartition(min(K, max(1, n)), "cell").write.mode(
        "append"
    ).partitionBy("cell").parquet(table_path)
    return n


def _cell_dir(table_path: str, cell: int) -> str:
    import os

    return os.path.join(table_path, f"cell={cell}")


def _dynamic_partition_overwrite(spark: SparkSession, df: DataFrame, path, parts):
    """Overwrite ONLY the ``cell=`` partitions present in ``df`` (Spark's
    dynamic partitionOverwriteMode), restoring the session's prior mode
    after — the surgical-rewrite primitive both maintenance ops share.

    Two-phase: ``df``'s lineage READS the layout being rewritten, and
    Spark (rightly) refuses to overwrite a path that feeds the plan —
    so the rows are staged to a sibling temp dir first, then the
    overwrite runs from the staged copy. The extra write is O(moved
    bytes) of m-byte codes, not corpus bytes."""
    import shutil

    staging = path.rstrip("/") + ".__rewrite_tmp"
    shutil.rmtree(staging, ignore_errors=True)
    key = "spark.sql.sources.partitionOverwriteMode"
    prior = spark.conf.get(key, "static")
    try:
        df.repartition(max(1, len(parts)), "cell").write.mode(
            "overwrite"
        ).parquet(staging)
        spark.conf.set(key, "dynamic")
        spark.read.parquet(staging).write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(path)
    finally:
        spark.conf.set(key, prior)
        shutil.rmtree(staging, ignore_errors=True)


def ivf_pq_delete(
    spark: SparkSession,
    vec_ids,
    table_path: str,
) -> int:
    """Index maintenance under deletes (r11, VERDICT r10 #2): remove
    vectors from the partitioned IVF-PQ layout so probes can never
    return them. This closes the loop with the engine's own curation —
    a dedup/decontamination pass that drops documents must drop their
    vectors too, or the index serves ghosts forever.

    Physical rewrite, not tombstones: only the ``cell=`` partitions
    that actually hold deleted ids are rewritten (dynamic partition
    overwrite — untouched cells' files are never opened), so the cost
    is O(touched cells' bytes), the same write-amplification bound the
    BucketedTable engine gives. A cell whose every vector is deleted
    is removed outright (an empty partition would otherwise survive a
    dynamic overwrite untouched). Codebooks/centroids are unchanged —
    deletion never re-routes survivors, so probe behavior on survivors
    is bit-identical (pinned by test).

    ``vec_ids``: a single-column DataFrame (``vec_id``) or an iterable
    of ids. Returns the number of index rows removed."""
    if not isinstance(vec_ids, DataFrame):
        ids_df = spark.createDataFrame(
            [(int(v),) for v in vec_ids], "vec_id long"
        )
    else:
        ids_df = vec_ids.select("vec_id")
    layout = spark.read.parquet(table_path)
    hits = layout.join(ids_df, "vec_id", "left_semi")
    # per-cell hit counts: bounded driver aggregate (≤ K rows), and it
    # also yields the deleted total — one job for both
    per_cell = {
        r["cell"]: r["n"]
        for r in hits.groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    if not per_cell:
        return 0
    touched = sorted(per_cell)
    survivors = layout.filter(F.col("cell").isin(touched)).join(
        ids_df, "vec_id", "left_anti"
    )
    surviving_cells = {
        r["cell"] for r in survivors.select("cell").distinct().collect()
    }
    if surviving_cells:
        _dynamic_partition_overwrite(
            spark,
            survivors.filter(F.col("cell").isin(sorted(surviving_cells))),
            table_path,
            surviving_cells,
        )
    import shutil

    for c in set(touched) - surviving_cells:
        shutil.rmtree(_cell_dir(table_path, c), ignore_errors=True)
    return int(sum(per_cell.values()))


def ivf_pq_recluster(
    spark: SparkSession,
    sf_dir: str,
    table_path: str,
    rows_per_cell: int | None = None,
    factor: float = 2.0,
) -> dict:
    """Bounded re-cluster service (r11, VERDICT r10 #2): split every
    cell whose row count exceeds ``factor ×`` the rows-per-cell target
    (default :data:`AUTO_CELL_ROWS` — the same target
    ``resolve_cells('auto')`` sizes to), restoring the per-probe scan
    bound after append-heavy growth without a full rebuild.

    Mechanics: PQ codes are computed from RAW vectors (not residuals),
    so a coarse re-route never touches them — splitting is purely a
    centroid-table and partition-layout edit. For each oversized cell,
    Lloyd's k-means on a bounded sample of the CELL'S OWN members
    (raw vectors joined back from the primary embeddings table by key)
    trains ``ceil(n/target)`` sub-centroids; the cell's centroid row
    is replaced by sub-centroid 0 and the rest append to the centroid
    table (ids stay dense, untouched cells keep their ids, so
    unsplit partitions are never rewritten); members re-assign among
    their cell's sub-centroids only. One dynamic-overwrite write
    rewrites the split cells and creates the new ones; the updated
    centroid table persists atomically beside the codes
    (``_pq_books.json``), so later appends and fresh-process probes
    route against the post-split geometry.

    Cost: O(oversized cells' bytes) rewrite + one bounded sample
    collect per split — never a corpus rescan. Returns
    ``{"split_cells": [...], "new_cells": int, "rows_moved": int}``."""
    import math
    import os

    target = AUTO_CELL_ROWS if rows_per_cell is None else int(rows_per_cell)
    books, cent = load_pq_codebooks(
        os.path.join(table_path, "_pq_books.json"), with_centroids=True
    )
    if cent is None:
        raise ValueError(
            f"{table_path}/_pq_books.json carries no centroids — "
            "recluster requires the layout's own coarse quantizer"
        )
    layout = spark.read.parquet(table_path)
    counts = {
        r["cell"]: r["n"]
        for r in layout.groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    oversized = sorted(
        c for c, n in counts.items() if n > factor * target
    )
    noop = {
        "split_cells": [],
        "new_cells": int(cent.shape[0]),
        "rows_moved": 0,
    }
    if not oversized:
        return noop
    e = load_table(spark, sf_dir, "embeddings")
    # orphan guard (r11 review): a vector deleted from the primary
    # embeddings table but never ivf_pq_delete'd would silently DROP
    # OUT of the inner member join below and vanish from its rewritten
    # cell — fail loudly instead, naming the repair
    n_orphans = (
        layout.filter(F.col("cell").isin(oversized))
        .join(e.select("vec_id"), "vec_id", "left_anti")
        .count()
    )
    if n_orphans:
        raise ValueError(
            f"ivf_pq_recluster: {n_orphans} indexed vector(s) in the "
            "oversized cells have no row in the primary embeddings "
            "table — run ivf_pq_delete for them first (rewriting a "
            "cell would silently drop them)"
        )
    cent = cent.copy()
    pieces, split_done, rows_moved = [], [], 0
    for c in oversized:
        t = math.ceil(counts[c] / target)
        members = layout.filter(F.col("cell") == c).join(
            e.select("vec_id", "embedding"), "vec_id"
        )
        sub = _lloyd_subcentroids(members, t)
        t = sub.shape[0]  # degenerate samples may clamp
        if t < 2:
            continue  # unsplittable: excluded from the report too
        # global ids for the sub-cells: slot 0 keeps the old id (its
        # partition is rewritten anyway), the rest extend the table
        gids = [c] + list(range(cent.shape[0], cent.shape[0] + t - 1))
        cent[c] = sub[0]
        cent = np.vstack([cent, sub[1:]])
        pieces.append(
            members.select(
                "vec_id",
                _sub_cell_udf(sub, np.asarray(gids, dtype="int64"))(
                    "embedding"
                ).alias("cell"),
                "pq_code",
            )
        )
        split_done.append(c)
        rows_moved += counts[c]
    if not pieces:
        return noop
    moved = pieces[0]
    for p in pieces[1:]:
        moved = moved.unionByName(p)
    _dynamic_partition_overwrite(spark, moved, table_path, split_done)
    # centroids persist AFTER the data rewrite: a crash between the
    # two leaves cells ≥ the persisted table size on disk, which the
    # probe path scans unconditionally (the orphan-cell guard in
    # ivf_pq_probe_partitioned) — so the window is recall-safe in
    # either order, and this order never routes queries to
    # not-yet-written cells
    save_pq_codebooks(
        books, os.path.join(table_path, "_pq_books.json"), centroids=cent
    )
    return {
        "split_cells": split_done,
        "new_cells": int(cent.shape[0]),
        "rows_moved": int(rows_moved),
    }


def _sub_cell_udf(sub: np.ndarray, gids: np.ndarray):
    """Vectorized sub-cell routing for one split cell: argmax against
    the cell's sub-centroids, mapped to their GLOBAL cell ids — the
    _ivf_cell_udf shape, scoped to a split."""

    @F.pandas_udf("int")
    def sub_cell_of(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int32")
        X = np.stack(emb.to_numpy()).astype(np.float64)
        return pd.Series(gids[np.argmax(X @ sub.T, axis=1)].astype("int32"))

    return sub_cell_of


def _lloyd_subcentroids(
    members: DataFrame, t: int, iters: int = 8
) -> np.ndarray:
    """Sub-centroids for one oversized cell: Lloyd's k-means on a
    bounded deterministic sample of the cell's members (the
    _train_ivf_centroids recipe, scoped to one cell — sample scales
    with t, never the member count)."""
    n_sample = max(256, 4 * t)
    sample = np.stack(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in members.orderBy(F.xxhash64("vec_id"))
            .limit(n_sample)
            .collect()
        ]
    )
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)
    t = min(t, len(sample))
    sub = sample[:t].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ sub.T, axis=1)
        for j in range(t):
            cluster = sample[assign == j]
            if len(cluster):
                sub[j] = cluster.mean(axis=0)
                sub[j] /= np.linalg.norm(sub[j])
    return sub


def ivf_pq_probe_partitioned(
    spark: SparkSession,
    sf_dir: str,
    table_path: str,
    cent: np.ndarray | None = None,
    books: np.ndarray | None = None,
    k: int = 10,
    nprobe: int | str = "auto",
    refine: int | str = "auto",
) -> DataFrame:
    """Probe the partitioned IVF-PQ layout: the ``cell IN (...)``
    predicate prunes at the file-listing level (PartitionFilters,
    plan-pinned in tests), ADC scores only the probed cells' codes,
    and the exact re-rank joins raw vectors back from the primary
    embeddings table by key. ``books=None`` / ``cent=None`` load the
    codebooks/centroids persisted beside the data — a fresh process
    probes the layout with zero retraining."""
    import os

    if books is None or cent is None:
        loaded_books, loaded_cent = load_pq_codebooks(
            os.path.join(table_path, "_pq_books.json"),
            with_centroids=True,
        )
        books = loaded_books if books is None else books
        if cent is None:
            if loaded_cent is None:
                raise ValueError(
                    f"{table_path}/_pq_books.json carries no centroids "
                    "(pre-centroid layout) — pass cent= explicitly"
                )
            cent = loaded_cent
    e = load_table(spark, sf_dir, "embeddings")
    qids, Qn = _query_matrix(e)
    probe_rows = _probe_cells(
        qids, Qn, cent, resolve_nprobe(nprobe, cent.shape[0])
    )
    # orphan-cell guard (r11 review): a crash between recluster's data
    # rewrite and its centroid persist leaves cell ids ≥ the persisted
    # centroid table on disk — no centroid can route a query there, so
    # every query probes them unconditionally (one local dir listing;
    # the next completed recluster re-homes them)
    orphan_cells = sorted(
        cid
        for n in os.listdir(table_path)
        if n.startswith("cell=")
        for cid in [int(n.split("=", 1)[1])]
        if cid >= cent.shape[0]
    )
    if orphan_cells:
        probe_rows = probe_rows + [
            (int(q), c) for q in qids for c in orphan_cells
        ]
    probes = spark.createDataFrame(
        probe_rows, "query_id long, cell int"
    )
    probed_cells = sorted({c for _, c in probe_rows})
    # the isin filter becomes PartitionFilters on the layout scan
    layout = spark.read.parquet(table_path)
    # auto refine derives from the INDEXED corpus count — a parquet
    # metadata count over the code table (appends included), so the
    # pool fraction holds as the layout grows without retuning; lazy,
    # so an explicit int refine never pays it
    refine = resolve_refine(refine, layout.count, k)
    corpus = layout.filter(F.col("cell").isin(probed_cells))
    return _adc_rerank(
        e,
        corpus.join(F.broadcast(probes), "cell"),
        books,
        k,
        refine,
        qids,
        Qn,
    )


def ivf_pq_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    K: int | str = 16,
    nprobe: int | str = "auto",
    refine: int | str = "auto",
) -> DataFrame:
    """IVF-PQ (the FAISS ``IVF{K},PQ{m}`` shape): coarse cells prune the
    candidate set to nprobe/K of the corpus, ADC over codes prunes the
    bytes per candidate, exact cosine re-ranks the survivors. At scale
    the corpus is written partitioned by cell with the CODE column
    (ivf_write_partitioned + pq_encode) so a probe reads nprobe/K
    directories of m-byte rows.

    Recall dial (measured at organic 10×, BASELINE.md r8): recall
    tracks the candidate-POOL FRACTION, so scale ``refine`` with
    corpus size (hold refine/corpus constant — e.g. 2.5% gave 0.37 at
    2k vectors and 0.70 at 20k), never as an absolute: a fixed
    ``refine`` silently decays as the index grows (0.23 at 20k with
    the 2k-tuned 50). The cost of the larger pool stays bounded by the
    m-byte ADC scan."""
    e = load_table(spark, sf_dir, "embeddings")
    K = resolve_cells(
        K, e.filter(~F.col("vec_id").isin(*_QUERY_IDS)).count
    )
    cent = _train_ivf_centroids(e, K=K, corpus_id=sf_dir)
    books = train_pq_codebooks(e, m=m, ksub=ksub, corpus_id=sf_dir)
    refine = resolve_refine(
        refine,
        e.filter(~F.col("vec_id").isin(*_QUERY_IDS)).count,
        k,
    )
    corpus = _encoded_cells(e, cent, books)
    qids, Qn = _query_matrix(e)
    probes = spark.createDataFrame(
        # nprobe derives from the TRUE trained cell count (the trainer
        # clamps K to the corpus when smaller — r10 review), never the
        # nominal dial
        _probe_cells(qids, Qn, cent, resolve_nprobe(nprobe, cent.shape[0])),
        "query_id long, cell int",
    )
    return _adc_rerank(
        e,
        corpus.join(F.broadcast(probes), "cell"),
        books,
        k,
        refine,
        qids,
        Qn,
    )
