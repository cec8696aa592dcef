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


# Type-width classes. The driver's value hash is width-strict where
# pandas rendering differs: DuckDB integer SUM returns HUGEINT (int128 →
# Decimal in pandas) which hash-mismatches a Spark BIGINT even when the
# values are equal (all 7 round-1 driver failures). int32 vs int64 is
# fine (both render identically); HUGEINT and un-cast DECIMAL are not.
_DUCK_CLASS = {
    "TINYINT": "i", "SMALLINT": "i", "INTEGER": "i", "BIGINT": "i",
    "UTINYINT": "i", "USMALLINT": "i", "UINTEGER": "i", "UBIGINT": "i",
    "HUGEINT": "i128", "UHUGEINT": "i128",
    "FLOAT": "f32", "DOUBLE": "f64",
    "VARCHAR": "str", "BLOB": "bytes", "BOOLEAN": "bool",
    "DATE": "date",
}


def _duck_class(t: str) -> str:
    t = str(t).upper()
    if t.startswith("DECIMAL"):
        return "dec"
    if t.startswith("TIMESTAMP") or t == "DATETIME":
        return "ts"
    if t.endswith("[]") or t.startswith("LIST") or t.startswith("STRUCT"):
        return "nested"
    return _DUCK_CLASS.get(t, t)


def _spark_class(dt) -> str:
    name = type(dt).__name__
    return {
        "ByteType": "i", "ShortType": "i", "IntegerType": "i", "LongType": "i",
        "FloatType": "f32", "DoubleType": "f64", "DecimalType": "dec",
        "StringType": "str", "BinaryType": "bytes", "BooleanType": "bool",
        "TimestampType": "ts", "TimestampNTZType": "ts", "DateType": "date",
        "ArrayType": "nested", "StructType": "nested", "MapType": "nested",
    }.get(name, name)


def _type_mismatches(spark_df, rel) -> list[str]:
    spark_types = {f.name.lower(): _spark_class(f.dataType) for f in spark_df.schema.fields}
    problems = []
    for col, dt in zip(rel.columns, rel.types):
        cls = _duck_class(dt)
        scls = spark_types.get(col.lower())
        if cls == "i128":
            problems.append(
                f"{col}: DuckDB {dt} (int128) — width-strict driver hash "
                f"will mismatch; CAST(... AS BIGINT) in the oracle"
            )
        elif cls == "dec" and scls != "dec":
            problems.append(
                f"{col}: DuckDB {dt} vs Spark {scls} — cast the oracle "
                f"decimal to DOUBLE/BIGINT to match"
            )
        elif scls is not None and cls != scls:
            problems.append(f"{col}: DuckDB {dt} ({cls}) vs Spark {scls}")
    return problems


def compare(spark_df, con, sql: str) -> dict:
    """Returns {'ok': bool, 'reason': str} comparing a Spark DataFrame
    against a DuckDB SQL result, order-insensitively — and type-width
    strictly, so the local gate predicts the driver's hash compare."""
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = [c.lower() for c in rel.columns]
    d_rows = rel.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return {"ok": False, "reason": f"schema mismatch: spark={s_cols} duckdb={d_cols}"}
    width_problems = _type_mismatches(spark_df, rel)
    if width_problems:
        return {"ok": False, "reason": "type-width mismatch: " + "; ".join(width_problems)}
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
