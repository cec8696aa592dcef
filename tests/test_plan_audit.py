"""Automated plan audit over the whole query battery: no operator may
put a Window over an Exchange SinglePartition — the single-task global
window that serializes an entire dataset through one core (the round-1
offender pattern; every frame/rank/prefix-sum op now uses the
partition-offset primitives in cli_spark.order). A global agg's final
SinglePartition exchange is fine (partial aggregation has already
reduced the data); a WINDOW over one is never fine at scale."""

from __future__ import annotations

import pytest

from cli_spark import queries as Q
from tests.conftest import SF_ORACLE

# import side-effect registries
import cli_spark.queries  # noqa: F401


def _single_task_windows(plan: str) -> list[str]:
    """Window nodes whose immediate child is Exchange SinglePartition."""
    lines = plan.splitlines()
    hits = []
    for i, line in enumerate(lines):
        if "Window" in line and i + 1 < len(lines):
            if "SinglePartition" in lines[i + 1]:
                hits.append(line.strip()[:100])
    return hits


@pytest.mark.parametrize("name", sorted(Q.REGISTRY))
def test_no_single_task_windows(spark, name):
    df = Q.REGISTRY[name].fn(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    offenders = _single_task_windows(plan)
    assert not offenders, f"{name}: single-task window(s): {offenders}"
