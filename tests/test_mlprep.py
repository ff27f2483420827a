"""Training-data preparation operators: sequence packing and
distributed PCA (operators/mlprep.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
    load_table,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.mlprep import (
    embedding_pca,
    pack_sequences,
)

SF = "/root/testdata/sf0.001"
MAX_TOK = 64


def _doc_tokens(spark):
    return load_table(spark, SF, "documents").select(
        "doc_id", F.size(F.split("text", r"\s+")).alias("n_tokens")
    )


def test_pack_sequences_invariants(spark):
    docs = _doc_tokens(spark)
    n_docs = docs.count()
    packed = pack_sequences(docs, MAX_TOK).cache()

    # every doc exactly once
    assert packed.count() == n_docs
    assert packed.select("doc_id").distinct().count() == n_docs

    per_pack = (
        packed.groupBy("pack_id")
        .agg(
            F.sum("n_tokens").alias("total"),
            F.count("*").alias("n"),
            F.min("seq_offset").alias("min_off"),
            F.count_distinct("seq_offset").alias("n_off"),
        )
        .collect()
    )
    for r in per_pack:
        # budget respected, except a pack holding ONE oversized doc
        assert r["total"] <= MAX_TOK or r["n"] == 1, r
        assert r["min_off"] == 0
        assert r["n_off"] == r["n"]  # offsets distinct within the pack

    # offsets are consistent: within a pack, sorting by offset gives
    # non-overlapping [offset, offset + n_tokens) spans
    pdf = packed.toPandas()
    for _, grp in pdf.groupby("pack_id"):
        g = grp.sort_values("seq_offset")
        end = 0
        for off, tok in zip(g["seq_offset"], g["n_tokens"]):
            assert off >= end or end == 0 and off == 0
            end = max(end, off + tok)
    packed.unpersist()


def test_pack_sequences_deterministic(spark):
    docs = _doc_tokens(spark)
    a = sorted(map(tuple, pack_sequences(docs, MAX_TOK).collect()))
    b = sorted(map(tuple, pack_sequences(docs, MAX_TOK).collect()))
    assert a == b


def test_pack_oversized_doc_is_isolated(spark):
    rows = [(1, 10), (2, 1000), (3, 20), (4, 30)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(docs, 128, partitions=1).toPandas()
    big_pack = packed.loc[packed.doc_id == 2, "pack_id"].iloc[0]
    mates = packed[packed.pack_id == big_pack]
    assert len(mates) == 1  # nothing else lands with the oversized doc
    assert mates["seq_offset"].iloc[0] == 0
    # the small docs pack together under budget
    others = packed[packed.doc_id != 2]
    assert others.groupby("pack_id")["n_tokens"].sum().le(128).all()


def test_pack_sequences_validation(spark):
    docs = _doc_tokens(spark)
    with pytest.raises(ValueError, match="max_tokens"):
        pack_sequences(docs, 0)


def test_embedding_pca_matches_numpy(spark):
    e = load_table(spark, SF, "embeddings")
    k = 8
    mean, comps, projected = embedding_pca(e, k)

    pdf = e.select("vec_id", "embedding").toPandas()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ref_mean = X.mean(axis=0)
    Xc = X - ref_mean
    cov = (Xc.T @ Xc) / (len(X) - 1)
    evals, evecs = np.linalg.eigh(cov)
    ref = evecs[:, ::-1][:, :k].T

    assert np.allclose(mean, ref_mean, atol=1e-9)
    # components match the reference up to sign
    for i in range(k):
        assert abs(float(np.dot(comps[i], ref[i]))) > 1 - 1e-8

    got = projected.toPandas().set_index("vec_id")
    P = np.stack(got.loc[pdf["vec_id"]]["proj"].to_numpy())
    ref_proj = Xc @ comps.T  # same (sign-normalized) components
    assert np.allclose(P, ref_proj, atol=1e-8)
    # projections decorrelate: off-diagonal covariance ~ 0
    pc = np.cov(P.T)
    off = pc - np.diag(np.diag(pc))
    assert np.max(np.abs(off)) < 1e-6 * np.max(np.abs(pc))


def test_embedding_pca_validation(spark):
    e = load_table(spark, SF, "embeddings")
    with pytest.raises(ValueError, match="k must be"):
        embedding_pca(e, 0)
    with pytest.raises(ValueError, match="k must be"):
        embedding_pca(e, 65)


def test_pack_open_limit_bounds_scan(spark):
    """first-fit-with-window: with open_limit=1, each new pack retires
    the previous one, so packing degenerates to sequential fill — still
    every doc exactly once, budget still respected."""
    rows = [(i, 30) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(docs, 100, partitions=1, open_limit=1).toPandas()
    assert len(packed) == 20
    sums = packed.groupby("pack_id")["n_tokens"].sum()
    assert sums.le(100).all()
    # 3 docs of 30 fit per 100-token pack -> ceil(20/3) = 7 packs
    assert len(sums) == 7
    with pytest.raises(ValueError, match="open_limit"):
        pack_sequences(docs, 100, open_limit=0)


def test_pack_partition_property_hypothesis():
    """Hypothesis sweep over the pure per-partition packer: for ANY doc
    size multiset, budget, and window, every doc appears exactly once,
    no multi-doc pack exceeds the budget, and offsets tile each pack
    contiguously from zero."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.mlprep import (
        _pack_partition,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        sizes=st.lists(st.integers(0, 300), max_size=80),
        max_tokens=st.integers(1, 256),
        open_limit=st.integers(1, 8),
        base=st.sampled_from([0, 1 << 40]),
    )
    def check(sizes, max_tokens, open_limit, base):
        docs = pd.DataFrame(
            {"doc_id": range(len(sizes)), "n_tokens": sizes}
        )
        out = _pack_partition(docs, max_tokens, open_limit, base)
        assert sorted(out["doc_id"]) == list(range(len(sizes)))
        assert (out["n_tokens"].to_numpy() == docs["n_tokens"].to_numpy()[out["doc_id"]]).all()
        for _, g in out.groupby("pack_id"):
            g = g.sort_values("seq_offset")
            if len(g) > 1:
                assert g["n_tokens"].sum() <= max_tokens
            # offsets tile contiguously: each offset equals the sum of
            # the tokens placed before it in the pack
            run = 0
            for off, tok in zip(g["seq_offset"], g["n_tokens"]):
                assert off == run
                run += tok
        assert (out["pack_id"] >= base).all()

    check()


def test_pack_rejects_null_and_negative_tokens(spark):
    import pandas as pd

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.mlprep import (
        _pack_partition,
    )

    with pytest.raises(ValueError, match="NULL n_tokens"):
        _pack_partition(
            pd.DataFrame({"doc_id": [1, 2], "n_tokens": [5.0, float("nan")]}),
            64, 8, 0,
        )
    with pytest.raises(ValueError, match="negative n_tokens"):
        _pack_partition(
            pd.DataFrame({"doc_id": [1, 2], "n_tokens": [5, -3]}),
            64, 8, 0,
        )


def test_embedding_pca_large_mean_stable(spark):
    """The two-pass centered scatter must survive a large common offset
    (the regime where the one-pass X'X - n*mu*mu' formula
    catastrophically cancels)."""
    rng = np.random.default_rng(7)
    X = rng.standard_normal((400, 16)) + 1e6  # unit variance around 1e6
    pdf = __import__("pandas").DataFrame(
        {
            "vec_id": range(len(X)),
            "embedding": [row.astype(np.float32) for row in X],
        }
    )
    mean, comps, projected = embedding_pca(
        spark.createDataFrame(pdf), 4
    )
    # reference on the SAME float32-rounded data the engine saw
    Xd = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ref_mean = Xd.mean(axis=0)
    Xc = Xd - ref_mean
    cov = (Xc.T @ Xc) / (len(Xd) - 1)
    evals, evecs = np.linalg.eigh(cov)
    ref = evecs[:, ::-1][:, :4].T
    assert np.allclose(mean, ref_mean, rtol=1e-12)
    for i in range(4):
        assert abs(float(np.dot(comps[i], ref[i]))) > 0.999


def test_quantize_embeddings_roundtrip_and_numpy_twin(spark):
    """int8 quantization: every code byte matches a NumPy twin
    (round-half-up), reconstruction error is bounded by scale/2 per
    element, schema/columns behave as documented, and zero vectors
    roundtrip exactly."""
    import numpy as np

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.mlprep import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    q = quantize_embeddings(e)
    assert q.columns == ["vec_id", "embedding", "q_scale"]
    assert dict(q.dtypes)["embedding"] == "array<tinyint>"

    src = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in e.collect()}
    stored_scale = {}
    for r in q.collect():
        x = src[r["vec_id"]]
        # codes are computed against the float32 scale that is stored
        scale = np.float32(np.max(np.abs(x)) / 127.0)
        stored_scale[r["vec_id"]] = scale
        assert r["q_scale"] == scale
        want = np.clip(
            np.floor(x / np.float64(scale) + 0.5), -127, 127
        ).astype(np.int8)
        assert list(r["embedding"]) == list(want), r["vec_id"]

    back = dequantize_embeddings(q)
    assert back.columns == ["vec_id", "embedding"]
    for r in back.collect():
        x = src[r["vec_id"]]
        err = np.abs(np.array(r["embedding"], dtype=np.float64) - x)
        # half the stored (float32) scale, plus the float32 cast of the
        # reconstructed product (≤ 127·scale·2⁻²⁴ ≈ scale·7.6e-6)
        s = np.float64(stored_scale[r["vec_id"]])
        assert err.max() <= (s / 2.0) * (1.0 + 1e-4), r["vec_id"]


def test_quantize_embeddings_zero_vector_and_knn_recall(spark):
    """A zero vector gets scale 0 / zero codes and reconstructs
    exactly; quantized cosine kNN keeps >=90% of the exact top-10 on
    the fixture corpus (the serving-path quality claim)."""
    import numpy as np

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.mlprep import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    z = spark.createDataFrame(
        [(0, [0.0] * 8), (1, [1.5, -2.0, 0.0, 3.25, -0.5, 0.1, 2.0, -1.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(z).collect()}
    assert rows[0]["q_scale"] == 0.0
    assert set(rows[0]["embedding"]) == {0}
    back = {r["vec_id"]: r["embedding"]
            for r in dequantize_embeddings(quantize_embeddings(z)).collect()}
    assert list(back[0]) == [0.0] * 8

    # NULL elements stay NULL (least()/greatest() skip NULLs — without
    # the guard a NULL element silently became code 127, the vector max)
    # and NULL vectors pass through; neither perturbs the scale.
    nl = spark.createDataFrame(
        [(0, [3.0, None, -1.5]), (1, None)],
        "vec_id long, embedding array<float>",
    )
    nq = {r["vec_id"]: r for r in quantize_embeddings(nl).collect()}
    assert list(nq[0]["embedding"]) == [127, None, -64]
    assert nq[0]["q_scale"] == pytest.approx(3.0 / 127.0, rel=1e-6)
    assert nq[1]["embedding"] is None
    nb = {r["vec_id"]: r["embedding"]
          for r in dequantize_embeddings(quantize_embeddings(nl)).collect()}
    assert nb[0][0] == pytest.approx(3.0, rel=1e-6) and nb[0][1] is None
    assert nb[1] is None

    # NaN elements behave like NULL (skipped for the scale, NULL after
    # the round trip): array_max sorts NaN GREATEST, so without the
    # guard the scale became NaN and every code collapsed to 0 — the
    # finite elements must still quantize correctly
    nan = spark.createDataFrame(
        [(0, [2.0, float("nan"), -1.0]), (1, [float("nan")] * 3)],
        "vec_id long, embedding array<float>",
    )
    qn = {r["vec_id"]: r for r in quantize_embeddings(nan).collect()}
    assert list(qn[0]["embedding"]) == [127, None, -64]
    assert qn[0]["q_scale"] == pytest.approx(2.0 / 127.0, rel=1e-6)
    # all-NaN vector: no finite element → scale 0, all-NULL codes
    assert qn[1]["q_scale"] == 0.0
    assert list(qn[1]["embedding"]) == [None, None, None]

    # ±Inf behaves like NaN: skipped for the scale, NULL codes —
    # without the guard the scale became Inf and every FINITE element's
    # code collapsed to 0 (the same silent-corruption class)
    iv = spark.createDataFrame(
        [(0, [2.0, float("inf"), float("-inf"), -1.0])],
        "vec_id long, embedding array<float>",
    )
    qi = quantize_embeddings(iv).first()
    assert list(qi["embedding"]) == [127, None, None, -64]
    assert qi["q_scale"] == pytest.approx(2.0 / 127.0, rel=1e-6)

    e = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    X = np.stack([np.array(r["embedding"], dtype=np.float64)
                  for r in e.orderBy("vec_id").collect()])
    D = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
         for r in dequantize_embeddings(quantize_embeddings(e))
         .orderBy("vec_id").collect()}
    Q = np.stack([D[i] for i in range(len(D))])

    def topk(M, q, k=10):
        n = M / np.linalg.norm(M, axis=1, keepdims=True)
        sims = n @ (q / np.linalg.norm(q))
        return set(np.argsort(-sims)[1:k + 1])  # skip self

    recalls = []
    for qid in range(3):
        exact = topk(X, X[qid])
        approx = topk(Q, Q[qid])
        recalls.append(len(exact & approx) / len(exact))
    assert sum(recalls) / len(recalls) >= 0.9
