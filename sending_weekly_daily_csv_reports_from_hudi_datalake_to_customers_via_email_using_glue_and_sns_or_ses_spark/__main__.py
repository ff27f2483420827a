"""CLI entry point: run the report pipeline from a config file, the way
the reference's Glue job runs ``main()`` over its ``loaders`` dict
(template.py:470-519) — so a reference user can point their existing
config at this engine:

    python -m sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark \
        --config loaders.json [--report-base ./reports] [--master local[8]]

The config file is the reference's JSON shape: ``source`` (list of
{table_name, hudi_path|path, type: FULL|INC}), ``transform.query``,
``email`` ({recipient_email, subject, report_bucket, file_expires_in}).
Delivery uses the local doubles (presigned file:// URL + recorded
email); production swaps in real adapters via run_pipeline's
``presigner``/``sender`` params.
"""

from __future__ import annotations

import argparse
import json
import sys

from .pipeline import config_from_loaders, run_pipeline
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="report-engine", description=__doc__.split("\n\n")[0]
    )
    ap.add_argument("--config", required=True, help="loaders JSON file")
    ap.add_argument(
        "--report-base", default=None, help="override email.report_bucket"
    )
    ap.add_argument("--master", default=None, help="Spark master (default local[n])")
    ap.add_argument(
        "--shuffle-partitions", type=int, default=None, help="spark.sql.shuffle.partitions"
    )
    args = ap.parse_args(argv)

    with open(args.config) as f:
        loaders = json.load(f)
    config = config_from_loaders(loaders, report_base=args.report_base)

    spark = get_spark(
        app_name="report_pipeline",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    result = run_pipeline(spark, config)
    # count the DELIVERED artifact, not result.df — re-executing the
    # transform would re-scan the sources (and an INC source could have
    # advanced, making the recount disagree with the shipped CSV)
    rows = spark.read.option("header", "true").csv(result.report_path).count()
    print(
        json.dumps(
            {
                "report_path": result.report_path,
                "rows": rows,
                "recipients": result.email.to,
                "subject": result.email.subject,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
