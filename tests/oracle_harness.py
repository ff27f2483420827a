"""Local replica of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL on the same parquet, compare row count, column
names, and order-insensitive values (exact equality after canonical
string rendering — stricter than a tolerance check, matching a value-
hash gate).
"""

from __future__ import annotations

import datetime as dt
import math
from pathlib import Path

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        # the driver's testdata is one file per table; Spark-written
        # copies (tools/gen_organic_sf.py) are DIRECTORIES of parts
        pattern = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')")
    return con


#: canonical type classes — the driver's value-hash is type-sensitive
#: (e.g. DuckDB widens integer sums to HUGEINT, which hashes differently
#: from Spark's BIGINT even when the values are equal), so the local
#: replica must flag class drift that plain str() rendering would mask.
_DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"}


def _canon_duck_type(t: str) -> str:
    t = t.upper().strip()
    if t in _DUCK_INT:
        return "int"
    if t in {"HUGEINT", "UHUGEINT", "UBIGINT"}:
        return "int128"
    if t in {"DOUBLE", "FLOAT", "REAL"}:
        return "float"
    if t.startswith("DECIMAL"):
        return t.replace(" ", "").lower()
    if "TIMESTAMP" in t:
        return "timestamp"
    if t == "DATE":
        return "date"
    if t in {"VARCHAR", "STRING", "TEXT"}:
        return "string"
    if t in {"BOOLEAN", "BOOL"}:
        return "bool"
    if t in {"BLOB", "BINARY", "VARBINARY"}:
        return "binary"
    if t.endswith("[]") or t.startswith(("LIST", "ARRAY")):
        return "array"
    return t.lower()


def _canon_spark_type(t: str) -> str:
    t = t.lower().strip()
    if t in {"tinyint", "smallint", "int", "bigint", "long", "integer"}:
        return "int"
    if t in {"double", "float"}:
        return "float"
    if t.startswith("decimal"):
        return t.replace(" ", "")
    if t.startswith("timestamp"):
        return "timestamp"
    if t == "date":
        return "date"
    if t == "string":
        return "string"
    if t == "boolean":
        return "bool"
    if t == "binary":
        return "binary"
    if t.startswith("array"):
        return "array"
    return t


def _cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(rows, cols) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_cell(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    d = con.execute(sql)
    d_cols = [c[0] for c in d.description]
    d_rows = d.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    # type-class drift check (reproduces the driver's type-sensitive hash)
    s_types = {c: _canon_spark_type(t) for c, t in spark_df.dtypes}
    d_desc = con.execute(f"DESCRIBE {sql}").fetchall()
    d_types = {r[0]: _canon_duck_type(r[1]) for r in d_desc}
    for c in s_cols:
        st, dtp = s_types.get(c), d_types.get(c)
        if st != dtp:
            problems.append(f"type drift: {c}: spark={st} duck={dtp}")
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount: spark={len(s_rows)} duck={len(d_rows)}")
    sc, dc = canon(s_rows, s_cols), canon(d_rows, d_cols)
    if sc != dc:
        diff_s = [r for r in sc if r not in set(dc)][:3]
        diff_d = [r for r in dc if r not in set(sc)][:3]
        problems.append(f"values: spark-only={diff_s} duck-only={diff_d}")
    return problems
