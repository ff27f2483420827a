"""Fast iteration driver: run every registered query at the given SF,
compare against its DuckDB oracle, print a one-line verdict per query.

Usage: python tests/run_parity.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oracle_harness import compare, duck_connection  # noqa: E402

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (  # noqa: E402
    get_spark,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators import (  # noqa: E402
    ORACLES,
    QUERIES,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="parity", shuffle_partitions=8)
    con = duck_connection(sf_dir)
    n_fail = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in ORACLES:
                problems = compare(df, con, ORACLES[name])
                status = "OK " if not problems else "FAIL"
            else:
                n = df.count()
                problems = [] if n >= 0 else ["negative count?"]
                status = f"OK (rows-only n={n})" if not problems else "FAIL"
        except Exception as e:  # noqa: BLE001
            problems = [f"{type(e).__name__}: {e}"]
            traceback.print_exc(limit=3)
            status = "ERR "
        dt_s = time.time() - t0
        if problems:
            n_fail += 1
        print(f"{status:22s} {name:28s} {dt_s:6.2f}s {'; '.join(problems)[:500]}")
    print(f"\n{n_fail} failures / {len(only) if only else len(QUERIES)} run")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
