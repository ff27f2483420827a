"""Oracle parity for RETIRED registry entries.

Entries retired from the 50-slot driver registry (operators/__init__.py
``RETIRED_QUERIES``) keep their full (query, DuckDB oracle) contract —
this module runs the driver's exact comparison on them every CI pass,
so "retired" never decays into "unchecked".
"""

from __future__ import annotations

import pytest

from oracle_harness import compare, duck_connection

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators import (
    RETIRED_ORACLES,
    RETIRED_QUERIES,
)

SF = "/root/testdata/sf0.001"


def test_every_retired_entry_keeps_its_oracle():
    # a retired entry without an oracle would silently drop to nothing
    assert set(RETIRED_QUERIES) == set(RETIRED_ORACLES)
    assert RETIRED_QUERIES  # the registry exists because slots were cut


@pytest.mark.parametrize("name", sorted(RETIRED_QUERIES))
def test_retired_entry_matches_oracle(spark, name):
    con = duck_connection(SF)
    df = RETIRED_QUERIES[name](spark, SF)
    problems = compare(df, con, RETIRED_ORACLES[name])
    assert not problems, f"{name}: {problems}"
