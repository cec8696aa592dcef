"""Local replica of the driver's Spark-vs-DuckDB correctness compare:
row-count, schema (column names), and order-insensitive value equality.

Stricter than the driver where possible: values must match EXACTLY
after canonicalization (floats by bit pattern via repr, timestamps as
naive-UTC isoformat). A query that only passes with tolerance is
flagged so it can be redesigned (see the determinism rules in
cli_spark/queries.py).
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb

from cli_spark.queries import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"f:{float(v)!r}"
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return "t:" + v.isoformat()
    if isinstance(v, dt.date):
        return "d:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "x:" + v.hex()
    return f"{type(v).__name__[0]}:{v}"


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str) -> dict:
    """Returns {'ok': bool, 'reason': str} comparing a Spark DataFrame
    against a DuckDB SQL result, order-insensitively."""
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = [c.lower() for c in rel.columns]
    d_rows = rel.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return {"ok": False, "reason": f"schema mismatch: spark={s_cols} duckdb={d_cols}"}
    if len(s_rows) != len(d_rows):
        return {"ok": False, "reason": f"row count: spark={len(s_rows)} duckdb={len(d_rows)}"}
    a = _rowset(s_cols, s_rows)
    b = _rowset(d_cols, d_rows)
    if a != b:
        diff_a = [x for x in a if x not in set(b)][:3]
        diff_b = [x for x in b if x not in set(a)][:3]
        return {
            "ok": False,
            "reason": f"values differ; spark-only={diff_a} duckdb-only={diff_b}",
        }
    return {"ok": True, "reason": f"{len(s_rows)} rows exact"}
