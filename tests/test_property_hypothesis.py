"""Hypothesis property tests (SURVEY.md §5.4): upsert-merge laws over
arbitrary keyed batches. Examples are kept small (Spark job per
example); the properties, not the volume, carry the weight.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
    _merge_latest,
)

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key (collisions likely)
        st.integers(min_value=0, max_value=100),  # precombine
        st.integers(min_value=0, max_value=9),  # payload
    ),
    min_size=1,
    max_size=12,
)


def _df(spark, data):
    return spark.createDataFrame(data, "key int, pre int, payload int")


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows)
def test_merge_latest_law(spark, data):
    """After the merge: exactly one row per key, holding the global max
    precombine value for that key."""
    out = _merge_latest(_df(spark, data), "key", "pre").collect()
    expect = {}
    for k, p, _ in data:
        expect[k] = max(expect.get(k, -1), p)
    assert len(out) == len(expect)
    assert {r["key"]: r["pre"] for r in out} == expect


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=rows, b=rows)
@pytest.mark.slow
def test_merge_is_associative_on_winners(spark, a, b):
    """merge(a ∪ b) ≡ merge(merge(a) ∪ merge(b)) on (key, pre) winners —
    the law that makes partial (map-side / per-batch) combining safe,
    i.e. why Hudi may precombine within batches before the global merge.
    """
    da, db = _df(spark, a), _df(spark, b)
    direct = _merge_latest(da.unionByName(db), "key", "pre")
    staged = _merge_latest(
        _merge_latest(da, "key", "pre").unionByName(_merge_latest(db, "key", "pre")),
        "key",
        "pre",
    )
    key_pre = lambda df: sorted(  # noqa: E731
        (r["key"], r["pre"]) for r in df.select("key", "pre").collect()
    )
    assert key_pre(direct) == key_pre(staged)


batches = st.lists(rows, min_size=1, max_size=3)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=batches)
@pytest.mark.slow
def test_mor_equals_cow_on_arbitrary_batches(spark, data, tmp_path_factory):
    """P3 law: for ANY sequence of keyed batches, the MOR table's
    log-merged snapshot equals the COW table's materialized snapshot —
    the read-time merge is exactly sequential COW application."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    base = tmp_path_factory.mktemp("morprop")
    cow = KeyedTable(spark, str(base / "cow"), record_key="key", precombine="pre")
    mor = KeyedTable(
        spark,
        str(base / "mor"),
        record_key="key",
        precombine="pre",
        table_type="MERGE_ON_READ",
    )
    for batch in data:
        df = _df(spark, batch)
        cow.upsert(df)
        mor.upsert(df)
    rows_of = lambda t: sorted(  # noqa: E731
        (r["key"], r["pre"], r["payload"])
        for r in t.snapshot().select("key", "pre", "payload").collect()
    )
    assert rows_of(mor) == rows_of(cow)


# --------------------------------------------------------------------
# round-5 curation properties
# --------------------------------------------------------------------

_mix_corpora = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=1, max_value=40),
    ),
    min_size=3,
    max_size=8,
).filter(lambda rows: len({s for s, _ in rows}) == 3)

_mix_weights = st.tuples(
    st.floats(min_value=0.05, max_value=1.0),
    st.floats(min_value=0.05, max_value=1.0),
    st.floats(min_value=0.05, max_value=1.0),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(groups=_mix_corpora, w=_mix_weights)
def test_mixture_sample_plan_invariants(spark, groups, w):
    """For any corpus and positive weights: no source oversampled
    (keep_prob ≤ 1), the binding source is kept in full, expected
    masses realize the normalized mixture, and membership is a subset
    of the corpus, deterministic under the same seed."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.curation import (
        mixture_sample,
    )

    rows = []
    next_id = 0
    for s, cnt in groups:
        for _ in range(cnt):
            rows.append((next_id, s))
            next_id += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    weights = dict(zip("abc", w))
    sampled, plan = mixture_sample(docs, weights)

    total_w = sum(weights.values())
    norm = {s: x / total_w for s, x in weights.items()}
    avail = {s: sum(c for src, c in groups if src == s) for s in "abc"}
    M = min(avail[s] / norm[s] for s in "abc")

    for p in plan:
        assert 0.0 < p["keep_prob"] <= 1.0
        assert p["expected"] == pytest.approx(norm[p["source"]] * M)
    binding = min("abc", key=lambda s: avail[s] / norm[s])
    assert {p["source"]: p for p in plan}[binding]["keep_prob"] == pytest.approx(
        1.0
    )

    got = sampled.collect()
    assert {r["doc_id"] for r in got} <= {r[0] for r in rows}
    again, _ = mixture_sample(docs, weights)
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in got
    )


_dedup_texts = st.lists(
    st.integers(min_value=0, max_value=5),
    min_size=2,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus_keys=_dedup_texts, new_keys=_dedup_texts)
@pytest.mark.slow
def test_dedup_incremental_exact_membership_property(spark, corpus_keys, new_keys):
    """Any new doc whose text key appears in the corpus is dropped as
    an exact dup; any new doc with an unseen key survives — for random
    multisets of text keys."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        build_corpus_index,
        dedup_incremental,
    )

    def txt(k):
        return " ".join(f"k{k}w{j}" for j in range(12))

    corpus = spark.createDataFrame(
        [(i, txt(k)) for i, k in enumerate(corpus_keys)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1000 + i, txt(k)) for i, k in enumerate(new_keys)],
        "doc_id long, text string",
    )
    clean, report = dedup_incremental(new, build_corpus_index(corpus))
    seen = set(corpus_keys)
    expect_survivors = sorted(
        1000 + i for i, k in enumerate(new_keys) if k not in seen
    )
    assert sorted(r["doc_id"] for r in clean.collect()) == expect_survivors
    # every dropped row is attributed to a corpus doc with the SAME key
    key_of = {1000 + i: k for i, k in enumerate(new_keys)}
    corpus_key_of = {i: k for i, k in enumerate(corpus_keys)}
    for r in report.collect():
        assert corpus_key_of[r["matched_doc_id"]] == key_of[r["doc_id"]]
        assert r["reason"] == "exact"


# --------------------------------------------------------------------
# remove_shared_substrings vs a pure-Python reference
# --------------------------------------------------------------------

_K_RSS = 4

corpora = st.lists(
    st.lists(
        st.integers(min_value=0, max_value=5),  # tiny vocab → real dups
        min_size=0,
        max_size=14,
    ),
    min_size=1,
    max_size=7,
)


def _rss_reference(texts: list[list[str]], k: int) -> list[tuple[str, int]]:
    """Direct reimplementation of the documented semantics: windows of
    k tokens keyed by content; occurrences sorted by (doc, pos); every
    non-canonical occurrence's positions are cut."""
    from collections import defaultdict

    occ = defaultdict(list)
    for d, toks in enumerate(texts):
        for p in range(len(toks) - k + 1):
            occ[tuple(toks[p:p + k])].append((d, p))
    cut = defaultdict(set)
    for positions in occ.values():
        if len(positions) < 2:
            continue
        canon = min(positions)
        for d, p in positions:
            if (d, p) != canon:
                cut[d].update(range(p, p + k))
    out = []
    for d, toks in enumerate(texts):
        kept = [t for i, t in enumerate(toks) if i not in cut[d]]
        removed = len(toks) - len(kept)
        out.append((" ".join(kept) if removed else " ".join(toks), removed))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(data=corpora)
def test_remove_shared_substrings_matches_reference(spark, data):
    """Cleaned text and removed-token counts agree with the pure-Python
    reference on arbitrary tiny-vocabulary corpora (where duplicated
    and overlapping windows are common by construction)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        remove_shared_substrings,
    )

    texts = [[f"w{t}" for t in toks] for toks in data]
    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text"], r["n_tokens_removed"])
        for r in remove_shared_substrings(docs, k=_K_RSS).collect()
    }
    want = dict(enumerate(_rss_reference(texts, _K_RSS)))
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=corpora, split=st.integers(min_value=1, max_value=6))
@pytest.mark.slow
def test_incremental_substring_pairs_match_union_property(spark, data, split):
    """The standing-index contract on ARBITRARY tiny-vocab corpora:
    for any corpus/batch split, exact_substring_pairs_incremental over
    the corpus's window index returns exactly the batch detector's
    union-run rows that touch a batch doc — and is unchanged when the
    batch's own rows were already appended (crash replay)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        build_window_index,
        exact_substring_pairs,
        exact_substring_pairs_incremental,
    )

    texts = [" ".join(f"w{t}" for t in toks) for toks in data]
    cut = min(split, len(texts))
    corpus_rows = [(i, t) for i, t in enumerate(texts[:cut])]
    batch_rows = [(100 + i, t) for i, t in enumerate(texts[cut:])]
    if not batch_rows:
        return
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")

    idx = build_window_index(corpus, k=_K_RSS)
    inc = sorted(
        map(
            tuple,
            exact_substring_pairs_incremental(batch, idx, k=_K_RSS).collect(),
        )
    )
    union_run = sorted(
        map(
            tuple,
            exact_substring_pairs(
                corpus.unionByName(batch), k=_K_RSS
            ).collect(),
        )
    )
    want = [t for t in union_run if t[0] >= 100 or t[1] >= 100]
    assert inc == want

    # crash-replay: batch rows already in the index → same answer
    replay = sorted(
        map(
            tuple,
            exact_substring_pairs_incremental(
                batch,
                idx.unionByName(build_window_index(batch, k=_K_RSS)),
                k=_K_RSS,
            ).collect(),
        )
    )
    assert replay == inc


# --------------------------------------------------------------------
# round-7 time-travel property
# --------------------------------------------------------------------

def _unique_key_batch(rows):
    """One row per key (within-batch equal-precombine ties have no
    defined winner — the law under test is the cross-commit one)."""
    seen = {}
    for k, p, pl in rows:
        seen[k] = (k, p, pl)
    return list(seen.values())


_tt_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("up"),
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=5),
                    st.integers(min_value=0, max_value=9),
                    st.integers(min_value=0, max_value=9),
                ),
                min_size=1,
                max_size=6,
            ).map(_unique_key_batch),
        ),
        st.tuples(
            st.just("del"),
            st.lists(
                st.integers(min_value=0, max_value=5),
                min_size=1,
                max_size=4,
                unique=True,
            ),
        ),
        st.tuples(
            st.just("ow"),
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=5),
                    st.integers(min_value=0, max_value=9),
                    st.integers(min_value=0, max_value=9),
                ),
                min_size=1,
                max_size=6,
            ).map(_unique_key_batch),
        ),
    ),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=_tt_ops,
    table_type=st.sampled_from(["COPY_ON_WRITE", "MERGE_ON_READ"]),
)
@pytest.mark.slow
def test_time_travel_replays_any_history(
    spark, ops, table_type, tmp_path_factory
):
    """Time-travel law: for ANY sequence of upserts, deletes, and
    overwrites (no cleaning — keep_versions large, so every instant is
    reconstructable), snapshot(as_of=c_i) equals the pure-Python model
    of the state right after commit i: upsert keeps the larger
    precombine, equal precombine in a LATER commit wins, delete drops
    keys, and overwrite REPLACES the whole state with its batch even
    against larger stored precombines (insert_overwrite_table
    semantics). The latest read must equal the final model too."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    t = KeyedTable(
        spark,
        str(tmp_path_factory.mktemp("ttprop") / "t"),
        record_key="key",
        precombine="pre",
        table_type=table_type,
        keep_versions=50,
    )
    state: dict[int, tuple[int, int]] = {}
    history: list[tuple[str, list]] = []
    for op, payload in ops:
        if op == "up":
            c = t.upsert(_df(spark, payload))
            for k, p, pl in payload:
                if k not in state or p >= state[k][0]:
                    state[k] = (p, pl)
        elif op == "ow":
            c = t.overwrite(_df(spark, payload))
            state = {k: (p, pl) for k, p, pl in payload}
        else:
            if not state:
                continue  # delete on an empty table is a no-op path
            keys = [k for k in payload if k in state] or payload[:1]
            c = t.delete(_df(spark, [(k, 0, 0) for k in keys]))
            for k in keys:
                state.pop(k, None)
        history.append(
            (c, sorted((k, v[0], v[1]) for k, v in state.items()))
        )
    if not history:
        # every op was a delete against the never-written table: no
        # commit exists and the uninitialized-table contract is None
        assert t.snapshot() is None
        return
    for c, want in history:
        got = sorted(
            (r["key"], r["pre"], r["payload"])
            for r in t.snapshot(as_of=c)
            .select("key", "pre", "payload")
            .collect()
        )
        assert got == want, f"{table_type} as_of={c}"
    final = sorted(
        (r["key"], r["pre"], r["payload"])
        for r in t.snapshot().select("key", "pre", "payload").collect()
    )
    assert final == history[-1][1]
