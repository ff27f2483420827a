"""Training-data preparation operators beyond the SURVEY §2.7 gap list:
sequence packing (LLM training-batch construction) and one-pass
distributed PCA over the embedding column.

Library surface (pytest-covered): the driver corpus is capped at 50
entries, so these register no ``@query`` rows; COVERAGE.md documents
them alongside the X-family.

Scale design, per operator:
  * ``pack_sequences`` — greedy first-fit packing is PER-PARTITION
    (mapInPandas): embarrassingly parallel, zero shuffle beyond the
    optional balancing repartition. Pack ids are made globally unique
    from the physical partition id, so no coordination is needed —
    exactly how a 1000-executor job packs 100 TB of documents.
  * ``embedding_pca`` — the only driver-side object is the d×d scatter
    matrix (64×64 here): each Arrow batch reduces to one
    (count, sum, X'X) partial, partials are unioned and summed in one
    tiny aggregation, and the eigendecomposition of a d×d matrix is
    O(d³) driver work independent of corpus size. The projection is a
    broadcast matmul per batch — one pass, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    partitions: int | None = None,
    open_limit: int = 64,
) -> DataFrame:
    """Pack documents into training sequences of at most ``max_tokens``
    tokens (greedy first-fit inside each partition, docs taken in
    ``id_col`` order for determinism).

    Returns (pack_id long, doc_id, n_tokens, seq_offset): every input
    doc appears exactly once; ``seq_offset`` is the doc's token offset
    inside its pack. A single doc longer than ``max_tokens`` gets a
    pack of its own (the caller decides whether to truncate or split —
    this operator never drops data silently).

    Packing locality is per-partition by design: global bin packing is
    NP-hard and needs a shuffle to a single ordering, while first-fit
    within a partition wastes at most one doc's worth of slack per open
    pack and runs embarrassingly parallel. ``partitions`` optionally
    rebalances first (one shuffle) when the input partitioning is
    skewed.

    ``open_limit`` bounds the open-pack list (first-fit-with-window):
    unbounded first-fit is QUADRATIC in partition size, because a pack
    left at e.g. 2040/2048 tokens never closes and every later doc
    scans it. With the window, the oldest open pack retires when a new
    one opens past the limit, keeping packing O(n · open_limit) at a
    marginal slack cost (the retired pack was already the least likely
    to fit anything).
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if open_limit <= 0:
        raise ValueError(f"open_limit must be positive, got {open_limit}")
    src = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(token_col).cast("long").alias("n_tokens"),
    )
    if partitions is not None:
        src = src.repartition(partitions, "doc_id")

    # pack_id = partition_id * 2^40 + local pack index: globally unique
    # with no coordination; 2^40 local packs per partition is beyond any
    # realistic partition size, and 2^23 partitions fit alongside it in
    # the long
    def _pack(batches):
        from pyspark import TaskContext

        base = TaskContext.get().partitionId() << 40
        rows = [pdf for pdf in batches]
        if rows:
            yield _pack_partition(pd.concat(rows), max_tokens, open_limit, base)

    return src.mapInPandas(
        _pack, "pack_id long, doc_id long, n_tokens long, seq_offset long"
    )


def _pack_partition(
    all_docs: pd.DataFrame, max_tokens: int, open_limit: int, base: int
) -> pd.DataFrame:
    """Pure per-partition first-fit-with-window packing (module-level so
    the property tests can exercise it without a Spark round-trip).
    Input columns: doc_id, n_tokens. Docs are taken in doc_id order."""
    bad = all_docs["n_tokens"].isna()
    if bad.any():
        raise ValueError(
            "pack_sequences: NULL n_tokens for doc_ids "
            f"{sorted(all_docs.loc[bad, 'doc_id'].head(5))} — tokenize "
            "upstream or drop the rows explicitly"
        )
    neg = all_docs["n_tokens"] < 0
    if neg.any():
        raise ValueError(
            "pack_sequences: negative n_tokens for doc_ids "
            f"{sorted(all_docs.loc[neg, 'doc_id'].head(5))} — a negative "
            "count would corrupt pack budgets and offsets"
        )
    all_docs = all_docs.sort_values("doc_id")
    out_pack, out_doc, out_tok, out_off = [], [], [], []
    # open packs: list of [pack_id, used_tokens]; first-fit
    open_packs: list[list[int]] = []
    next_local = 0
    for doc_id, n_tok in zip(all_docs["doc_id"], all_docs["n_tokens"]):
        n_tok = int(n_tok)
        placed = False
        for p in open_packs:
            if p[1] + n_tok <= max_tokens:
                out_pack.append(p[0])
                out_off.append(p[1])
                p[1] += n_tok
                placed = True
                break
        if not placed:
            pack_id = base + next_local
            next_local += 1
            out_pack.append(pack_id)
            out_off.append(0)
            # packs with no remaining room (incl. oversized docs'
            # own packs) never join the open list
            if n_tok < max_tokens:
                open_packs.append([pack_id, n_tok])
                if len(open_packs) > open_limit:
                    open_packs.pop(0)  # retire the oldest (fullest-longest)
        out_doc.append(doc_id)
        out_tok.append(n_tok)
    return pd.DataFrame(
        {
            "pack_id": pd.Series(out_pack, dtype="int64"),
            "doc_id": pd.Series(out_doc, dtype="int64"),
            "n_tokens": pd.Series(out_tok, dtype="int64"),
            "seq_offset": pd.Series(out_off, dtype="int64"),
        }
    )


def embedding_pca(
    e: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[np.ndarray, np.ndarray, DataFrame]:
    """Two-pass distributed PCA over an array<float> column.

    Returns ``(mean, components, projected)``: the d-vector column
    mean, the (k, d) principal-component matrix (rows = components,
    descending eigenvalue order, sign-normalized so each row's
    largest-|x| entry is positive), and a DataFrame
    (``id_col``, proj array<double>) of the k-dim projections.

    Mechanics: pass 1 reduces each Arrow batch to a (n, sum(x)) partial
    and yields the column mean; pass 2 accumulates the CENTERED scatter
    (X−μ)'(X−μ) per batch — the corpus never leaves the executors, the
    driver only combines d-sized partials and eigendecomposes the d×d
    covariance (O(d³), corpus-size independent), and the projection is
    a broadcast matmul per batch. Two passes instead of the one-pass
    X'X − n·μμ' formula on purpose: the one-pass form catastrophically
    cancels when column means are large relative to the variances
    (un-centered features), while centered accumulation is stable for
    any offset at the cost of one extra corpus scan.
    """
    if k <= 0:
        raise ValueError(f"k must be in 1..d, got {k}")

    v = e.select(F.col(vec_col).alias("v"))

    def _mean_partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            yield pd.DataFrame({"n": [len(X)], "s": [X.sum(axis=0)]})

    mp = v.mapInPandas(_mean_partials, "n long, s array<double>").toPandas()
    # ^ one row per Arrow batch: thousands of rows for a 100 TB corpus,
    # trivially driver-collectable; the elementwise combine is numpy.
    # The dimension d comes from the partials themselves — no separate
    # probe job against the corpus (the tf_idf laziness rule)
    if not len(mp):
        raise ValueError("embedding_pca: empty input")
    n = int(mp["n"].sum())
    if n < 2:
        raise ValueError("embedding_pca: need at least 2 vectors")
    d = len(mp["s"].iloc[0])
    if k > d:
        raise ValueError(f"k must be in 1..{d}, got {k}")
    mean = np.sum(np.stack(mp["s"].to_numpy()), axis=0) / n

    mean_c = mean  # closure copy for the scatter pass

    def _scatter_partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["v"].to_numpy()).astype(np.float64) - mean_c
            yield pd.DataFrame({"ss": [(X.T @ X).ravel()]})

    sp = v.mapInPandas(_scatter_partials, "ss array<double>").toPandas()
    ss = np.sum(np.stack(sp["ss"].to_numpy()), axis=0).reshape(d, d)
    cov = ss / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    comps = evecs[:, ::-1][:, :k].T.copy()  # (k, d), descending eigenvalue
    # deterministic sign: largest-|x| entry of each component positive
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]

    mean_b, comps_b = mean, comps

    @F.pandas_udf("array<double>")
    def project(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(v.to_numpy()).astype(np.float64) - mean_b
        return pd.Series(list(X @ comps_b.T))

    projected = e.select(
        F.col(id_col), project(F.col(vec_col)).alias("proj")
    )
    return mean, comps, projected


def quantize_embeddings(
    e: DataFrame, vec_col: str = "embedding", scale_col: str = "q_scale"
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an ``array<float>``
    column: ``scale = max(|x|)/127`` per row, elements become
    ``round_half_up(x/scale)`` clamped to [−127, 127] — the standard
    storage/serving compression for embedding corpora (float32 → 1
    byte/dim + one float scale ≈ 4× smaller; at a 100 TB embedding
    store that is the difference between fitting the ANN working set
    in cluster memory or not).

    Returns the input frame with ``vec_col`` replaced by
    ``array<tinyint>`` plus the appended per-row ``scale_col`` (float).
    All-zero (and NULL-free) vectors get scale 0 and all-zero codes —
    ``dequantize_embeddings`` reconstructs them exactly. NULL elements
    stay NULL through the round trip (and are skipped by ``array_max``
    when computing the scale) — ``least``/``greatest`` skip NULLs, so
    without the explicit isNull guard a NULL element would silently
    quantize to code 127, fabricating the vector max. NaN and ±Inf
    elements are treated the same way (skipped for the scale, NULL
    after the round trip — int8 can represent neither): ``array_max``
    sorts NaN as the GREATEST value and Inf above every finite, so an
    unguarded max would make the scale NaN/Inf and collapse every
    code — including the finite elements' — to 0, the whole vector
    silently round-tripping to garbage. Pure JVM
    expressions, single-layer lambdas only (the r6 interpreted-HOF
    rule): one scan, no shuffle, no Python.

    Codes are computed against the float32-rounded scale that is
    actually stored, so reconstruction error per element is ≤
    stored_scale/2 exactly (quantizing against the double scale and
    then rounding it for storage would leak up to 127·ulp extra).
    cosine/kNN ranking survives (pytest pins recall on the fixture
    corpus). Deterministic round-half-up (floor(x+0.5)) so a NumPy
    twin reproduces every code byte.
    """
    others = [c for c in e.columns if c != vec_col]
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # NaN elements are treated exactly like NULL elements (skipped for
    # the scale, NULL through the round trip): array_max sorts NaN as
    # the GREATEST value, so an unguarded max would make the scale NaN,
    # every code NaN, and the int cast would silently collapse the
    # whole vector to zeros — corruption with no error
    inf = F.lit(float("inf"))
    finite_abs = F.transform(
        v,
        lambda x: F.when(
            F.isnan(x) | (F.abs(x) == inf), F.lit(None)
        ).otherwise(F.abs(x)),
    )
    scaled = e.select(
        *others,
        v.alias("__qv"),
        (F.coalesce(F.array_max(finite_abs), F.lit(0.0)) / F.lit(127.0))
        .cast("float")
        .alias(scale_col),
    )
    q = F.transform(
        "__qv",
        lambda x: F.when(
            x.isNull() | F.isnan(x) | (F.abs(x) == inf),
            F.lit(None).cast("tinyint"),
        ).otherwise(
            F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.when(F.col(scale_col) == 0.0, F.lit(0.0))
                    .otherwise(
                        F.floor(x / F.col(scale_col).cast("double") + F.lit(0.5))
                    )
                    .cast("int"),
                ),
            ).cast("tinyint")
        ),
    )
    return scaled.select(*others, q.alias(vec_col), F.col(scale_col)).select(
        *e.columns, scale_col
    )


def dequantize_embeddings(
    e: DataFrame, vec_col: str = "embedding", scale_col: str = "q_scale"
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: codes × scale back to
    ``array<float>``, dropping ``scale_col``. One scan, one
    single-layer lambda."""
    deq = F.transform(
        F.col(vec_col),
        lambda b: (b.cast("double") * F.col(scale_col)).cast("float"),
    )
    return e.withColumn(vec_col, deq).drop(scale_col)
