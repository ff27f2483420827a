"""Model-based scoring (operators/scoring.py): unigram-LM perplexity —
hand-computed probabilities, a DuckDB twin of the whole train+score
pipeline on the fixture corpus, OOV pricing — and the MLlib quality
classifier on planted separable features."""

from __future__ import annotations

import math

import duckdb
import pytest

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.scoring import (
    QUALITY_FEATURES,
    doc_features,
    lm_score,
    score_quality,
    train_quality_classifier,
    train_unigram_lm,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unigram_lm_hand_computed(spark):
    # corpus tokens: a a b  →  N=3, types={a:2, b:1}, k=0.5, V=2
    # denom = 3 + 0.5·(2+1) = 4.5 ; p(a)=2.5/4.5, p(b)=1.5/4.5, p(oov)=0.5/4.5
    vocab, stats = train_unigram_lm(
        _docs(spark, [(1, "a a b")]), vocab_size=10, smoothing_k=0.5
    )
    probs = {r["token"]: math.exp(r["logp"]) for r in vocab.collect()}
    assert probs["a"] == pytest.approx(2.5 / 4.5)
    assert probs["b"] == pytest.approx(1.5 / 4.5)
    assert math.exp(stats["oov_logp"]) == pytest.approx(0.5 / 4.5)
    assert stats["n_tokens"] == 3 and stats["n_types"] == 2

    # score "a b c": c is OOV → avg_logp = (ln p(a)+ln p(b)+ln p(oov))/3
    out = lm_score(
        _docs(spark, [(7, "a b c")]), vocab, stats["oov_logp"]
    ).collect()
    assert len(out) == 1
    expect = (
        math.log(2.5 / 4.5) + math.log(1.5 / 4.5) + math.log(0.5 / 4.5)
    ) / 3
    assert out[0]["avg_logp"] == pytest.approx(expect)
    assert out[0]["perplexity"] == pytest.approx(math.exp(-expect))
    assert out[0]["n_tokens"] == 3


def test_unigram_lm_vocab_cap_and_oov_mass(spark):
    # cap V=1 keeps only the most frequent type; the chopped type's
    # mass must be priced into the OOV bucket, not discarded
    vocab, stats = train_unigram_lm(
        _docs(spark, [(1, "x x x y")]), vocab_size=1, smoothing_k=1.0
    )
    rows = vocab.collect()
    assert [r["token"] for r in rows] == ["x"]
    denom = 4 + 1.0 * 2  # N + k·(V+1)
    assert math.exp(rows[0]["logp"]) == pytest.approx((3 + 1) / denom)
    assert math.exp(stats["oov_logp"]) == pytest.approx((1 + 1) / denom)


def test_unigram_lm_duckdb_twin_on_fixture_corpus(spark):
    """The whole train+score pipeline replicated in DuckDB on the
    fixture documents (vocab cap 50 exercises the OOV path on real
    text): per-doc avg_logp must match to float tolerance."""
    V, K = 50, 0.5
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    vocab, stats = train_unigram_lm(docs, vocab_size=V, smoothing_k=K)
    got = {
        r["doc_id"]: r["avg_logp"]
        for r in lm_score(docs, vocab, stats["oov_logp"]).collect()
    }
    want = dict(
        duckdb.sql(
            rf"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS token
          FROM '{SF}/documents.parquet'
        ), counts AS (
          SELECT token, count(*) AS cnt FROM toks GROUP BY token
        ), tot AS (
          SELECT sum(cnt) AS n, count(*) AS types FROM counts
        ), vocab AS (
          SELECT token, cnt FROM counts ORDER BY cnt DESC, token ASC LIMIT {V}
        ), consts AS (
          SELECT n, least({V}, types) AS v_eff,
                 n + {K} * (least({V}, types) + 1) AS denom,
                 (SELECT n FROM tot) - (SELECT sum(cnt) FROM vocab) AS oov_cnt
          FROM tot
        )
        SELECT t.doc_id,
               avg(ln(coalesce(v.cnt + {K}, (SELECT oov_cnt FROM consts) + {K})
                      / (SELECT denom FROM consts))) AS avg_logp
        FROM toks t LEFT JOIN vocab v USING (token)
        GROUP BY t.doc_id
        """
        ).fetchall()
    )
    assert set(got) == set(want)
    for doc_id, spark_lp in got.items():
        assert spark_lp == pytest.approx(want[doc_id], rel=1e-9), doc_id


def test_unigram_lm_validation(spark):
    d = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError, match="vocab_size"):
        train_unigram_lm(d, vocab_size=0)
    with pytest.raises(ValueError, match="smoothing_k"):
        train_unigram_lm(d, smoothing_k=0.0)


def test_doc_features_ranges(spark):
    rows = doc_features(spark.read.parquet(f"{SF}/documents.parquet")).collect()
    assert rows
    for r in rows:
        for c in QUALITY_FEATURES:
            assert r[c] is not None and not math.isnan(r[c]), (r["doc_id"], c)
        assert 0.0 <= r["f_len_sat"] <= 1.0
        assert 0.0 <= r["f_alpha_ratio"] <= 1.0
        assert 0.0 <= r["f_digit_ratio"] <= 1.0
        assert 0.0 <= r["f_repetition"] <= 1.0
        assert 0.0 <= r["f_dup_lines"] <= 1.0


def test_quality_classifier_learns_planted_rule(spark):
    """Separable planted populations: 'good' docs are long prose,
    'bad' docs are short digit-heavy noise — the classifier must
    recover the split it was trained on."""
    good = [
        (i, "the quick brown fox jumps over the lazy dog near the river bank "
            * 3)
        for i in range(200)
    ]
    bad = [(1000 + i, f"{i} 404 !!! {i * 7} zzz {i}") for i in range(200)]
    from pyspark.sql import functions as F

    docs = _docs(spark, good + bad)
    feats = doc_features(docs).withColumn(
        "label", (F.col("doc_id") < 1000).cast("double")
    )
    model = train_quality_classifier(feats)
    scored = {r["doc_id"]: r["quality_prob"] for r in score_quality(model, feats).collect()}
    correct = sum(
        1
        for doc_id, p in scored.items()
        if (p >= 0.5) == (doc_id < 1000)
    )
    assert correct / len(scored) >= 0.95
    assert all(0.0 <= p <= 1.0 for p in scored.values())


def test_quality_classifier_missing_column_raises(spark):
    feats = doc_features(_docs(spark, [(1, "hello world")]))
    with pytest.raises(ValueError, match="missing columns"):
        train_quality_classifier(feats)  # no label column


def test_unigram_lm_is_proper_distribution(spark):
    """Law: vocab probabilities plus the pooled OOV probability sum to
    exactly 1 for ANY corpus and ANY cap — the smoothing conserves all
    observed mass. (Deterministic sweep instead of hypothesis: each
    example costs Spark jobs; the cap/corpus grid carries the weight.)"""
    corpora = [
        [(1, "a")],
        [(1, "a a b"), (2, "b c d e")],
        [(1, "x " * 50), (2, "y z " * 10), (3, "u v w x y z")],
    ]
    for rows_ in corpora:
        for cap in (1, 2, 1000):
            vocab, stats = train_unigram_lm(
                _docs(spark, rows_), vocab_size=cap, smoothing_k=0.7
            )
            total = sum(math.exp(r["logp"]) for r in vocab.collect())
            total += math.exp(stats["oov_logp"])
            assert total == pytest.approx(1.0, abs=1e-12), (rows_, cap)


def test_bigram_lm_hand_computed(spark):
    # corpus: "a b a b c" → unigrams {a:2,b:2,c:1} N=5 V=3 k=0.5
    #   denom = 5 + 0.5·4 = 7 ; p(a)=p(b)=2.5/7, p(c)=1.5/7, p(oov)=0.5/7
    # bigrams: "a b":2, "b a":1, "b c":1 ; c(a)=2, c(b)=2
    #   s(b|a)=2/2=1, s(a|b)=1/2, s(c|b)=1/2
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.scoring import (
        lm_score_bigram,
        train_bigram_lm,
    )

    vocab, bigrams, stats = train_bigram_lm(
        _docs(spark, [(1, "a b a b c")]), smoothing_k=0.5, backoff=0.4
    )
    bg = {r["bigram"]: math.exp(r["logscore"]) for r in bigrams.collect()}
    assert bg == pytest.approx({"a b": 1.0, "b a": 0.5, "b c": 0.5})
    assert stats["n_bigrams"] == 3

    # score "a b z": first token a → unigram 2.5/7; "a b" → 1.0;
    # "b z" unseen → backoff·p_uni(z=OOV) = 0.4·0.5/7
    out = lm_score_bigram(_docs(spark, [(9, "a b z")]), vocab, bigrams, stats).collect()
    assert len(out) == 1 and out[0]["n_tokens"] == 3
    expect = (
        math.log(2.5 / 7) + math.log(1.0) + math.log(0.4 * 0.5 / 7)
    ) / 3
    assert out[0]["avg_logp"] == pytest.approx(expect)


def test_bigram_lm_cap_and_validation(spark):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.scoring import (
        train_bigram_lm,
    )

    d = _docs(spark, [(1, "a b a b a c")])
    # cap 1 keeps only the most frequent bigram ("a b":2)
    _, bigrams, stats = train_bigram_lm(d, bigram_size=1)
    assert [r["bigram"] for r in bigrams.collect()] == ["a b"]
    assert stats["n_bigrams"] == 1
    with pytest.raises(ValueError, match="bigram_size"):
        train_bigram_lm(d, bigram_size=0)
    with pytest.raises(ValueError, match="backoff"):
        train_bigram_lm(d, backoff=0.0)


def test_bigram_lm_duckdb_twin_on_fixture_corpus(spark):
    """Train+score replicated in DuckDB on the fixture documents with
    BOTH caps binding (vocab 50, bigrams 200): unigram backoff, OOV
    and bigram-hit paths all exercised on real text."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.scoring import (
        lm_score_bigram,
        train_bigram_lm,
    )

    V, B, K, BO = 50, 200, 0.5, 0.4
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    vocab, bigrams, stats = train_bigram_lm(
        docs, vocab_size=V, bigram_size=B, smoothing_k=K, backoff=BO
    )
    got = {
        r["doc_id"]: r["avg_logp"]
        for r in lm_score_bigram(docs, vocab, bigrams, stats).collect()
    }
    want = dict(
        duckdb.sql(
            rf"""
        WITH toks AS (
          SELECT doc_id, t.tok, t.pos
          FROM '{SF}/documents.parquet',
               LATERAL (SELECT unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok,
                               generate_subscripts(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '), 1) AS pos) t
        ), counts AS (
          SELECT tok AS token, count(*) AS cnt FROM toks GROUP BY 1
        ), tot AS (
          SELECT sum(cnt) AS n, count(*) AS types FROM counts
        ), vocab AS (
          SELECT token, cnt FROM counts ORDER BY cnt DESC, token ASC LIMIT {V}
        ), consts AS (
          SELECT n + {K} * (least({V}, types) + 1) AS denom,
                 n - (SELECT sum(cnt) FROM vocab) AS oov_cnt
          FROM tot
        ), uni AS (
          SELECT token, ln((cnt + {K}) / (SELECT denom FROM consts)) AS logp
          FROM vocab
        ), bigs AS (
          SELECT t0.doc_id, t0.tok || ' ' || t1.tok AS bigram,
                 t0.tok AS prev, t1.tok AS cur
          FROM toks t0 JOIN toks t1
            ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
        ), bcounts AS (
          SELECT bigram, count(*) AS cnt FROM bigs GROUP BY 1
        ), btop AS (
          SELECT b.bigram, ln(b.cnt * 1.0 / c.cnt) AS logscore
          FROM bcounts b JOIN counts c ON c.token = string_split(b.bigram, ' ')[1]
          ORDER BY b.cnt DESC, b.bigram ASC LIMIT {B}
        ), first_tok AS (
          SELECT t.doc_id,
                 coalesce(u.logp, ln(((SELECT oov_cnt FROM consts) + {K}) / (SELECT denom FROM consts))) AS lp
          FROM toks t LEFT JOIN uni u ON u.token = t.tok
          WHERE t.pos = 1
        ), trans AS (
          SELECT g.doc_id,
                 coalesce(bt.logscore,
                          ln({BO}) + coalesce(u.logp,
                              ln(((SELECT oov_cnt FROM consts) + {K}) / (SELECT denom FROM consts)))) AS lp
          FROM bigs g
          LEFT JOIN btop bt USING (bigram)
          LEFT JOIN uni u ON u.token = g.cur
        )
        SELECT doc_id, avg(lp) AS avg_logp
        FROM (SELECT * FROM first_tok UNION ALL SELECT * FROM trans)
        GROUP BY doc_id
        """
        ).fetchall()
    )
    assert set(got) == set(want)
    for doc_id, lp in got.items():
        assert lp == pytest.approx(want[doc_id], rel=1e-9), doc_id


def test_lm_empty_null_and_whitespace_docs(spark):
    """Empty/NULL/whitespace docs: excluded from the vocabulary (''
    never becomes a token type) and scored EXPLICITLY as
    (n_tokens=0, avg_logp=NULL, perplexity=+inf) rather than vanishing
    or masquerading as fluent text."""
    vocab, stats = train_unigram_lm(
        spark.createDataFrame([(1, ""), (2, "a a")], "doc_id long, text string"),
        vocab_size=10,
    )
    assert [r["token"] for r in vocab.collect()] == ["a"]
    assert stats["n_tokens"] == 2 and stats["n_types"] == 1

    scored = {
        r["doc_id"]: r
        for r in lm_score(
            spark.createDataFrame(
                [(1, "a"), (2, ""), (3, None), (4, "   ")],
                "doc_id long, text string",
            ),
            vocab,
            stats["oov_logp"],
        ).collect()
    }
    assert set(scored) == {1, 2, 3, 4}
    assert scored[1]["n_tokens"] == 1
    for d in (2, 3, 4):
        assert scored[d]["n_tokens"] == 0
        assert scored[d]["avg_logp"] is None
        assert scored[d]["perplexity"] == float("inf")


def test_bigram_lm_empty_docs_explicit(spark):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.scoring import (
        lm_score_bigram,
        train_bigram_lm,
    )

    vocab, bigrams, stats = train_bigram_lm(
        spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    )
    out = {
        r["doc_id"]: r
        for r in lm_score_bigram(
            spark.createDataFrame(
                [(1, "a b"), (2, None), (3, "")], "doc_id long, text string"
            ),
            vocab,
            bigrams,
            stats,
        ).collect()
    }
    assert out[1]["n_tokens"] == 2
    for d in (2, 3):
        assert out[d]["n_tokens"] == 0
        assert out[d]["perplexity"] == float("inf")


def test_doc_features_null_text_and_fit(spark):
    """NULL text featurizes as an empty doc (no NULL features, no
    max-length artifact) and a fit over a frame containing such rows
    does not crash VectorAssembler."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, None), (2, "real prose text here"), (3, "more words appear here")]
        * 10,
        "doc_id long, text string",
    )
    feats = doc_features(docs)
    row = {r["doc_id"]: r for r in feats.collect()}[1]
    for c in QUALITY_FEATURES:
        assert row[c] is not None and not math.isnan(row[c])
    assert row["f_len_sat"] == 0.0
    labeled = feats.withColumn("label", (F.col("doc_id") > 1).cast("double"))
    model = train_quality_classifier(labeled, max_iter=5)
    assert score_quality(model, feats).count() == 30
