"""BPE tokenizer (operators/tokenizer.py): the histogram-trained model
must equal a naive corpus-level reference implementation merge for
merge, apply must reproduce training's segmentation, round-trips must
be lossless, the histogram cap must be reported exactly, and the whole
train+apply path must be deterministic under repartitioning."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.tokenizer import (
    EOW,
    BPEModel,
    learn_bpe,
    tokenize_bpe,
    train_bpe,
    word_histogram,
)

CORPUS = [
    "low low low low low",
    "lower lower widest widest widest",
    "newest newest newest newest newest newest",
    "the newest widget is the lowest",
]


def naive_bpe(texts: list[str], num_merges: int) -> list[tuple[str, str]]:
    """Corpus-level reference: every word OCCURRENCE kept as its own
    symbol sequence, pair counts recomputed from scratch each round —
    O(merges x corpus), obviously correct, deliberately unlike the
    incremental histogram implementation under test."""
    seqs = []
    for t in texts:
        for w in t.lower().split():
            syms = list(w)
            syms[-1] += EOW
            seqs.append(syms)
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for syms in seqs:
            for pair in zip(syms, syms[1:]):
                pc[pair] += 1
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < 2:
            break
        merges.append(best)
        for syms in seqs:
            j = 0
            while j < len(syms) - 1:
                if syms[j] == best[0] and syms[j + 1] == best[1]:
                    syms[j : j + 2] = [best[0] + best[1]]
                else:
                    j += 1
    return merges


def _docs(spark, texts=CORPUS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_histogram_training_equals_corpus_reference(spark):
    """The load-bearing claim: word-boundary BPE over the histogram is
    EXACT — merge table identical to the per-occurrence reference."""
    hist, report = word_histogram(_docs(spark), max_words=None)
    got = learn_bpe(hist, 40)
    want = naive_bpe(CORPUS, 40)
    assert got == want
    assert len(got) > 5  # non-degenerate: it actually learned merges
    assert report["dropped_occurrences"] == 0


def test_apply_reproduces_training_segmentation(spark):
    """Encoding an in-histogram word with the rank-ordered apply loop
    yields the same symbols training left for it — checked by the
    derived property tokens-of('newest') collapse to one symbol once
    vocab_size is large enough to learn the full word."""
    model = train_bpe(_docs(spark), vocab_size=60)
    assert model.encode_word("newest") == ["newest" + EOW]
    assert model.encode_word("low") == ["low" + EOW]
    # unseen word: segments into learned subwords + leftover chars,
    # concatenation still lossless
    toks = model.encode_word("lowestest")
    assert "".join(toks) == "lowestest" + EOW


def test_tokenize_bpe_lossless_and_counted(spark):
    docs = _docs(spark).unionByName(
        spark.createDataFrame([(99, None)], "doc_id long, text string")
    )
    model = train_bpe(_docs(spark), vocab_size=30)
    out = tokenize_bpe(docs, model).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2, 3, 99]
    for r in out[:-1]:
        words = r["text"].lower().split()
        rebuilt = "".join(r["tokens"]).split(EOW)[:-1]
        assert rebuilt == words
        assert r["n_tokens"] == len(r["tokens"]) >= len(words)
    assert out[-1]["tokens"] == [] and out[-1]["n_tokens"] == 0


def test_histogram_cap_reported_exactly(spark):
    """max_words=3 keeps the 3 most frequent words and reports the
    dropped distinct-word count and occurrence mass exactly."""
    hist, report = word_histogram(_docs(spark), max_words=3)
    full, _ = word_histogram(_docs(spark), max_words=None)
    assert hist == full[:3]
    assert report["n_words_kept"] == 3
    assert report["n_words_total"] == len(full)
    assert report["dropped_words"] == len(full) - 3
    assert report["dropped_occurrences"] == sum(c for _, c in full[3:])


def test_deterministic_under_repartitioning(spark):
    a = train_bpe(_docs(spark).repartition(7), vocab_size=25)
    b = train_bpe(_docs(spark).coalesce(1), vocab_size=25)
    assert a.to_json() == b.to_json()
    assert BPEModel.from_json(a.to_json()).merges == a.merges


def test_oov_characters_survive(spark):
    """Characters absent at train time stay singleton tokens — never
    dropped, round-trip intact."""
    model = train_bpe(_docs(spark), vocab_size=20)
    docs = spark.createDataFrame(
        [(0, "низкий newest")], "doc_id long, text string"
    )
    r = tokenize_bpe(docs, model).first()
    assert "".join(r["tokens"]).split(EOW)[:-1] == ["низкий", "newest"]


def test_validation(spark):
    with pytest.raises(ValueError, match="vocab_size"):
        train_bpe(_docs(spark), vocab_size=0)


def test_documents_table_end_to_end(spark, sf_dir):
    """sf0.001 documents: train once, tokenize the corpus; exact counts
    sit between the word count (>=1 token per word) and the character
    count, and the learned model compresses vs characters."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    model = train_bpe(docs, vocab_size=300, max_words=4096)
    out = tokenize_bpe(docs, model)
    agg = out.select(
        F.sum("n_tokens").alias("toks"),
        F.sum(F.size(F.split(F.lower(F.trim("text")), r"\s+"))).alias("words"),
        F.sum(F.length(F.regexp_replace("text", r"\s+", ""))).alias("chars"),
    ).first()
    assert agg["words"] <= agg["toks"] < agg["chars"]
    # the synthetic corpus has a tiny vocabulary: training stops when
    # no pair repeats (the early-stop rail), well under the budget
    assert 50 <= model.train_report["n_merges"] <= 300


def test_output_column_collision_raises(spark):
    model = BPEModel([], {})
    docs = spark.createDataFrame([(0, "x", 5)], "doc_id long, text string, n_tokens long")
    with pytest.raises(ValueError, match="already exist"):
        tokenize_bpe(docs, model)


def test_unicode_whitespace_matches_training_boundary(spark):
    """U+00A0 is NOT a word boundary in Java's \\s (the histogram side)
    — apply must keep it glued too, or learned merges go dead and
    n_tokens diverges from the trained segmentation."""
    texts = ["foo\u00a0bar foo\u00a0bar foo\u00a0bar baz baz"]
    docs = _docs(spark, texts)
    hist, _ = word_histogram(docs, max_words=None)
    assert ("foo\u00a0bar", 3) in hist  # training sees ONE word
    model = train_bpe(docs, vocab_size=50)
    r = tokenize_bpe(docs, model).first()
    assert "".join(r["tokens"]).split(EOW)[:-1] == [
        "foo\u00a0bar", "foo\u00a0bar", "foo\u00a0bar", "baz", "baz"
    ]


def test_missing_text_col_raises(spark):
    with pytest.raises(ValueError, match="text column"):
        tokenize_bpe(_docs(spark), BPEModel([], {}), text_col="body")


def test_count_only_mode_matches_array_mode(spark):
    """out_col=None (the funnel's accounting mode) produces the same
    counts as the array mode without adding a token column."""
    docs = _docs(spark).unionByName(
        spark.createDataFrame([(99, None)], "doc_id long, text string")
    )
    model = train_bpe(_docs(spark), vocab_size=30)
    full = {
        r["doc_id"]: r["n_tokens"]
        for r in tokenize_bpe(docs, model).collect()
    }
    lean = tokenize_bpe(docs, model, out_col=None)
    assert "tokens" not in lean.columns
    got = {r["doc_id"]: r["n_tokens"] for r in lean.collect()}
    assert got == full


def _sequential_fixpoint(word, merges):
    """The DuckDB oracle's schedule, replicated: each merge in rank
    order, applied as a left-to-right non-overlapping string rewrite
    over the '|'-separated symbol representation, REPEATED to fixpoint
    before the next rank."""
    s = "|" + "|".join(word) + EOW + "|"
    for a, b in merges:
        pat, rep = f"|{a}|{b}|", f"|{a}{b}|"
        while True:
            nxt = s.replace(pat, rep)
            if nxt == s:
                break
            s = nxt
    return s.strip("|").split("|")


def test_sequential_fixpoint_equals_canonical():
    """The tokenize_bpe driver oracle applies merges sequentially (rank
    order, fixpoint per rank); the engine applies lowest-rank-first.
    They coincide because a merge's constituents are producible only by
    EARLIER merges — pinned here over the frozen driver merge table on
    every corpus word plus adversarial shapes (overlap runs, the
    an</w>→can</w>→scan</w> chain, co+lu whose BOTH sides are merge
    products)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.tokenizer import (
        _FIXED_MERGES,
    )

    words = [
        "scan", "scans", "colu", "column", "columns", "parquet",
        "order", "window", "aaa", "aaaa", "ererer", "tototo",
        "ow", "owow", "w", "x", "inin", "partition", "scancan",
    ]
    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        "SELECT string_split(lower(text), ' ') FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet') "
        "LIMIT 100"
    ).fetchall()
    corpus_words = sorted({w for (ws,) in docs for w in ws if w})
    model = BPEModel(_FIXED_MERGES, {})
    for w in words + corpus_words:
        assert _sequential_fixpoint(w, _FIXED_MERGES) == model.encode_word(
            w
        ), w
