"""Star-schema (multi-dimension) delta-join maintenance
(operators/ivm.py, MaintainedStarAggregate): a grouped aggregate over
fact ⋈ D1 ⋈ D2 maintained from all three CDC streams must equal a
direct recompute of the star join after every coordinated window set —
including simultaneous changes on several sides (the telescoped
old/new pinning the k-ary decomposition depends on)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.ivm import (
    MaintainedStarAggregate,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
    KeyedTable,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.incremental import (
    CDCReader,
)

FACT_S = "fk int, fpre int, ck int, pk int, amount long"
CUST_S = "ck int, cpre int, seg string"
PART_S = "pk int, ppre int, cat string"


def _make(spark, tmp_path, tag, how="inner"):
    fact = KeyedTable(
        spark, str(tmp_path / f"f{tag}"), record_key="fk",
        precombine="fpre", keep_versions=30,
    )
    cust = KeyedTable(
        spark, str(tmp_path / f"c{tag}"), record_key="ck",
        precombine="cpre", keep_versions=30,
    )
    part = KeyedTable(
        spark, str(tmp_path / f"p{tag}"), record_key="pk",
        precombine="ppre", keep_versions=30,
    )
    readers = {
        "fact": CDCReader(spark, f"f{tag}", fact.root,
                          checkpoint_root=str(tmp_path / f"ckf{tag}")),
        "cust": CDCReader(spark, f"c{tag}", cust.root,
                          checkpoint_root=str(tmp_path / f"ckc{tag}")),
        "part": CDCReader(spark, f"p{tag}", part.root,
                          checkpoint_root=str(tmp_path / f"ckp{tag}")),
    }
    view = MaintainedStarAggregate(
        spark,
        str(tmp_path / f"v{tag}"),
        dims=[("cust", "ck", "ck"), ("part", "pk", "pk")],
        group_cols=["seg", "cat"],
        sum_cols=["amount"],
        minmax_cols=["amount"],
        how=how,
    )
    return fact, cust, part, readers, view


def _star(fact, cust, part, f=None, c=None, p=None, how="inner"):
    fs = fact.snapshot(as_of=f)
    cs = cust.snapshot(as_of=c)
    ps = part.snapshot(as_of=p)
    if fs is None or cs is None or ps is None:
        return None
    return (
        fs.join(cs, fs["ck"] == cs["ck"], how)
        .join(ps, fs["pk"] == ps["pk"], how)
        .select(cs["seg"], ps["cat"], fs["amount"])
    )


def _nulls_first(t):
    """Sort key tolerating None group values (the outer star's NULL
    attribute groups)."""
    return tuple((v is not None, v) for v in t)


def _recompute(fact, cust, part, how="inner"):
    j = _star(fact, cust, part, how=how)
    if j is None:
        return []
    return sorted(
        (
            (r["seg"], r["cat"], r["n_rows"], r["sum_amount"],
             r["min_amount"], r["max_amount"])
            for r in j.groupBy("seg", "cat")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("amount").alias("sum_amount"),
                F.min("amount").alias("min_amount"),
                F.max("amount").alias("max_amount"),
            )
            .collect()
        ),
        key=_nulls_first,
    )


def _maintained(df):
    if df is None:
        return []
    return sorted(
        (
            (r["seg"], r["cat"], r["n_rows"], r["sum_amount"],
             r["min_amount"], r["max_amount"])
            for r in df.collect()
        ),
        key=_nulls_first,
    )


def _run(view, fact, cust, part, readers, how="inner"):
    """One coordinated maintenance run across all three streams — the
    pipeline-loop protocol: covered instant = staged window end, else
    the view token, else the reader checkpoint (a window consumed by a
    run that folded nothing — e.g. dim seeding at fact genesis —
    leaves only the checkpoint)."""
    seen = view.through() or {}
    wins, ends = {}, {}
    for side, reader in readers.items():
        wins[side] = reader.read(after=seen.get(side))
        ends[side] = (
            reader.staged_end() or seen.get(side) or reader.checkpoint()
        )
    if all(w is None for w in wins.values()):
        for r in readers.values():
            r.commit()
        return False
    f_prev = seen.get("fact")
    tables = {"cust": cust, "part": part}
    view.apply(
        wins["fact"],
        {k: wins[k] for k in ("cust", "part")},
        dim_states={
            k: (lambda t, tab=tables[k]: tab.snapshot(as_of=t))
            for k in ("cust", "part")
        },
        fact_base=(
            (lambda: fact.snapshot(as_of=f_prev)) if f_prev else None
        ),
        through=dict(ends),
        base=lambda: _star(
            fact, cust, part,
            f=ends["fact"], c=ends["cust"], p=ends["part"], how=how,
        ),
    )
    for r in readers.values():
        r.commit()
    return True


@pytest.mark.slow
def test_star_ivm_tracks_recompute_over_random_history(spark, tmp_path):
    """Property: after every coordinated window set, the maintained
    star aggregate equals a direct fact⋈cust⋈part recompute — random
    interleaved churn on all three tables, including runs where
    SEVERAL sides change at once (the old/new pinning cases), NULL
    measures, deletes everywhere, group migration through either
    dimension."""
    rng = random.Random(17)
    fact, cust, part, readers, view = _make(spark, tmp_path, "r")
    cust.upsert(spark.createDataFrame(
        [(j, 0, rng.choice("xy")) for j in range(5)], CUST_S))
    part.upsert(spark.createDataFrame(
        [(j, 0, rng.choice("mn")) for j in range(4)], PART_S))
    _run(view, fact, cust, part, readers)

    for step in range(8):
        # each step mutates a RANDOM SUBSET of the three tables, so
        # multi-side windows (incl. all three at once) occur
        if rng.random() < 0.7:
            fact.upsert(spark.createDataFrame(
                [
                    (
                        rng.randrange(15),
                        step * 100 + i,
                        rng.randrange(6),  # ck 5 unmatched
                        rng.randrange(5),  # pk 4 unmatched
                        None if rng.random() < 0.2
                        else rng.randrange(-40, 400),
                    )
                    for i in range(rng.randrange(2, 6))
                ],
                FACT_S,
            ))
        if rng.random() < 0.45:
            cust.upsert(spark.createDataFrame(
                [(rng.randrange(5), step * 100 + i, rng.choice("xyz"))
                 for i in range(rng.randrange(1, 3))], CUST_S))
        if rng.random() < 0.45:
            part.upsert(spark.createDataFrame(
                [(rng.randrange(4), step * 100 + i, rng.choice("mnq"))
                 for i in range(rng.randrange(1, 3))], PART_S))
        if step == 3:
            keys = [r["fk"] for r in fact.snapshot().select("fk").collect()]
            fact.delete(spark.createDataFrame(
                [(k,) for k in rng.sample(keys, max(1, len(keys) // 3))],
                "fk int"))
        if step == 5:
            cust.delete(spark.createDataFrame([(1,)], "ck int"))
        if step == 6:
            part.delete(spark.createDataFrame([(2,)], "pk int"))
        _run(view, fact, cust, part, readers)
        assert _maintained(view.current()) == _recompute(
            fact, cust, part
        ), f"diverged at step {step}"


def test_star_ivm_simultaneous_dim_changes(spark, tmp_path):
    """Both dimensions change in ONE window set: the cust term must see
    part at its NEW state and the part term must see cust at its OLD
    state (the telescoping order) — getting either pin wrong double- or
    under-counts the doubly-migrated fact rows."""
    fact, cust, part, readers, view = _make(spark, tmp_path, "s")
    cust.upsert(spark.createDataFrame([(1, 0, "x")], CUST_S))
    part.upsert(spark.createDataFrame([(1, 0, "m")], PART_S))
    fact.upsert(spark.createDataFrame([(10, 0, 1, 1, 7)], FACT_S))
    _run(view, fact, cust, part, readers)
    assert _maintained(view.current()) == [("x", "m", 1, 7, 7, 7)]
    # one run, both dims migrate the same fact row
    cust.upsert(spark.createDataFrame([(1, 1, "y")], CUST_S))
    part.upsert(spark.createDataFrame([(1, 1, "n")], PART_S))
    _run(view, fact, cust, part, readers)
    assert (
        _maintained(view.current())
        == _recompute(fact, cust, part)
        == [("y", "n", 1, 7, 7, 7)]
    )


def test_star_ivm_requires_token(spark, tmp_path):
    fact, cust, part, readers, view = _make(spark, tmp_path, "t")
    cust.upsert(spark.createDataFrame([(1, 0, "x")], CUST_S))
    with pytest.raises(ValueError, match="through token"):
        view.apply(
            None,
            {"cust": readers["cust"].read(), "part": None},
            dim_states={},
        )


def test_star_ivm_dim_only_migration_with_other_dim_quiescent(
    spark, tmp_path
):
    """A cust-only window at steady state: the term joins part at its
    (unchanged) pinned instant and migrates exactly the matched fact
    rows."""
    fact, cust, part, readers, view = _make(spark, tmp_path, "q")
    cust.upsert(spark.createDataFrame([(1, 0, "x"), (2, 0, "x")], CUST_S))
    part.upsert(spark.createDataFrame([(1, 0, "m"), (2, 0, "n")], PART_S))
    fact.upsert(spark.createDataFrame(
        [(10, 0, 1, 1, 5), (11, 0, 1, 2, 9), (12, 0, 2, 1, 100)], FACT_S))
    _run(view, fact, cust, part, readers)
    cust.upsert(spark.createDataFrame([(1, 1, "z")], CUST_S))
    _run(view, fact, cust, part, readers)
    assert (
        _maintained(view.current())
        == _recompute(fact, cust, part)
        == [("x", "m", 1, 100, 100, 100),
            ("z", "m", 1, 5, 5, 5),
            ("z", "n", 1, 9, 9, 9)]
    )


def test_star_join_key_third_side_collision_still_raises(spark, tmp_path):
    """r9 review fix: the same-named-equi-join-key allowance must NOT
    mask a THIRD side carrying the name as an ordinary column — join
    equality covers only the owning dim, so that shape stays
    ambiguous."""
    import pytest

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.ivm import (
        MaintainedStarAggregate,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    fact = KeyedTable(
        spark, str(tmp_path / "xf"), record_key="fk", precombine="fp"
    )
    cust = KeyedTable(
        spark, str(tmp_path / "xc"), record_key="ck", precombine="cp"
    )
    part = KeyedTable(
        spark, str(tmp_path / "xp"), record_key="pk", precombine="pp"
    )
    fact.upsert(
        spark.createDataFrame(
            [(1, 0, 1, 1, 10)], "fk int, fp int, ck int, pk int, amt long"
        )
    )
    cust.upsert(
        spark.createDataFrame([(1, 0, "s")], "ck int, cp int, seg string")
    )
    # the PART table also carries a non-key column named 'ck'!
    part.upsert(
        spark.createDataFrame(
            [(1, 0, "c", 99)], "pk int, pp int, cat string, ck int"
        )
    )
    view = MaintainedStarAggregate(
        spark,
        str(tmp_path / "xview"),
        dims=[("cust", "ck", "ck"), ("part", "pk", "pk")],
        group_cols=["ck"],  # the shared name, present on THREE sides
        sum_cols=["amt"],
    )
    with pytest.raises(ValueError, match="exists on sides|found on sides"):
        view.joined(
            fact.snapshot(),
            {"cust": cust.snapshot(), "part": part.snapshot()},
        )
    # grouping by a clean column still works on the same tables (the
    # 2-side key case stays legal)
    ok = MaintainedStarAggregate(
        spark,
        str(tmp_path / "xview2"),
        dims=[("cust", "ck", "ck"), ("part", "pk", "pk")],
        group_cols=["seg"],
        sum_cols=["amt"],
    )
    assert ok.joined(
        fact.snapshot(),
        {"cust": cust.snapshot(), "part": part.snapshot()},
    ).count() == 1


@pytest.mark.slow
def test_left_outer_star_ivm_tracks_recompute_over_random_history(
    spark, tmp_path
):
    """how='left' (r10, VERDICT r9 #3) property: after every coordinated
    window set the maintained LEFT-OUTER star aggregate equals a direct
    fact ⟕ cust ⟕ part recompute — fact keys deliberately overflow both
    dim domains so NULL attribute groups are always populated, dim
    upserts migrate rows OUT of them (existence counterweight), dim
    deletes migrate rows back IN, and fact deletes dirty the NULL
    groups' MIN/MAX (healed via the NULL-safe recompute)."""
    rng = random.Random(23)
    fact, cust, part, readers, view = _make(spark, tmp_path, "L", how="left")
    cust.upsert(spark.createDataFrame(
        [(j, 0, rng.choice("xy")) for j in range(4)], CUST_S))
    part.upsert(spark.createDataFrame(
        [(j, 0, rng.choice("mn")) for j in range(3)], PART_S))
    _run(view, fact, cust, part, readers, how="left")

    for step in range(8):
        if rng.random() < 0.75:
            fact.upsert(spark.createDataFrame(
                [
                    (
                        rng.randrange(18),
                        step * 100 + i,
                        rng.randrange(7),   # ck 4-6 never matched
                        rng.randrange(6),   # pk 3-5 never matched
                        None if rng.random() < 0.2
                        else rng.randrange(-40, 400),
                    )
                    for i in range(rng.randrange(2, 6))
                ],
                FACT_S,
            ))
        if rng.random() < 0.45:
            # upserts can CREATE keys 0-5: rows migrate out of the
            # NULL group when a previously-unmatched ck appears
            cust.upsert(spark.createDataFrame(
                [(rng.randrange(6), step * 100 + i, rng.choice("xyz"))
                 for i in range(rng.randrange(1, 3))], CUST_S))
        if rng.random() < 0.45:
            part.upsert(spark.createDataFrame(
                [(rng.randrange(5), step * 100 + i, rng.choice("mnq"))
                 for i in range(rng.randrange(1, 3))], PART_S))
        if step == 3:
            keys = [r["fk"] for r in fact.snapshot().select("fk").collect()]
            fact.delete(spark.createDataFrame(
                [(k,) for k in rng.sample(keys, max(1, len(keys) // 3))],
                "fk int"))
        if step == 5:
            # dim delete: matched rows migrate INTO the NULL group
            cust.delete(spark.createDataFrame([(1,)], "ck int"))
        if step == 6:
            part.delete(spark.createDataFrame([(2,)], "pk int"))
        _run(view, fact, cust, part, readers, how="left")
        assert _maintained(view.current()) == _recompute(
            fact, cust, part, how="left"
        ), f"diverged at step {step}"


def test_left_outer_star_null_group_migration_both_dims(spark, tmp_path):
    """Deterministic outer check: a fact row unmatched on BOTH dims
    sits in the (NULL, NULL) group; each dim key appearing migrates it
    one axis at a time; deleting a dim key migrates it back."""
    fact, cust, part, readers, view = _make(
        spark, tmp_path, "M", how="left"
    )
    cust.upsert(spark.createDataFrame([(9, 0, "x")], CUST_S))  # unmatched
    part.upsert(spark.createDataFrame([(9, 0, "m")], PART_S))  # unmatched
    fact.upsert(spark.createDataFrame([(10, 0, 1, 1, 7)], FACT_S))
    _run(view, fact, cust, part, readers, how="left")
    assert _maintained(view.current()) == [(None, None, 1, 7, 7, 7)]
    cust.upsert(spark.createDataFrame([(1, 1, "y")], CUST_S))
    _run(view, fact, cust, part, readers, how="left")
    assert _maintained(view.current()) == [("y", None, 1, 7, 7, 7)]
    part.upsert(spark.createDataFrame([(1, 1, "n")], PART_S))
    _run(view, fact, cust, part, readers, how="left")
    assert _maintained(view.current()) == [("y", "n", 1, 7, 7, 7)]
    cust.delete(spark.createDataFrame([(1,)], "ck int"))
    _run(view, fact, cust, part, readers, how="left")
    assert (
        _maintained(view.current())
        == _recompute(fact, cust, part, how="left")
        == [(None, "n", 1, 7, 7, 7)]
    )


def test_star_ivm_rejects_unknown_how(spark, tmp_path):
    with pytest.raises(ValueError, match="how="):
        MaintainedStarAggregate(
            spark, str(tmp_path / "badhow"),
            dims=[("cust", "ck", "ck")],
            group_cols=["seg"], sum_cols=["amount"], how="full",
        )
