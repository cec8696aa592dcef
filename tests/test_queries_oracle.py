"""Every registered query must match its DuckDB oracle exactly at
sf0.01 — the same gate the driver runs (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from cli_spark import queries as Q
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare, duckdb_conn

# import side-effect registries
import cli_spark.queries  # noqa: F401


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_ORACLE)
    yield c
    c.close()


def all_query_names():
    return sorted(Q.REGISTRY)


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(spark, con, name):
    spec = Q.REGISTRY[name]
    df = spec.fn(spark, SF_ORACLE)
    assert df is not None
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors driver fallback
        return
    res = compare(df, con, spec.oracle)
    assert res["ok"], f"{name}: {res['reason']}"
