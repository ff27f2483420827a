"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference report pipeline
(soumilshah1995/Sending-Weekly-Daily-CSV-Reports-FROM-Hudi-Datalake-to-
Customers-via-Email-using-Glue-and-SNS-OR-SES), re-expressed Spark-first.

Layout (SURVEY.md §7):
  session     SparkSession factory (AQE, Arrow, UTC, Kryo)
  catalog     typed SourceSpec / table registration (replaces the
              reference's ``loaders["source"]`` dicts, template.py:471-483)
  sources/    snapshot + incremental readers w/ checkpoint store
              (template.py:197-322 semantics)
  sinks/      CSV report sink, keyed upsert writer (Hudi emulation)
  operators/  the query corpus — every operator from SURVEY.md §2 plus
              LLM-data-pipeline extensions (dedup incl. incremental +
              semantic, similarity, text, multimodal, timeseries,
              curation, mlprep, scoring)
  functions/  reusable column-expression builders (vector math, text)
  streaming/  Structured Streaming variants (watermark windows, stateful)
  plans/      plan-inspection helpers
  delivery    presigned-URL / email adapters (stubbed, no AWS)
"""

from .session import get_spark  # noqa: F401
from .catalog import TABLES, Catalog, load_table  # noqa: F401
