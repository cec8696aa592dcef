"""Hash-min connected components + IRI rewrite (SURVEY.md §4 custom
machinery #1): chain, cycle, disjoint components; literal protection."""

from __future__ import annotations

from pyspark.sql import functions as F

from cli_spark.canonicalize import canonical_map, connected_components, rewrite_triples


def test_components_chain_and_cycle(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c"),  # chain a-b-c-d
         ("x", "y"), ("y", "z"), ("z", "x"),  # cycle x-y-z
         ("solo1", "solo2")],
        "src string, dst string",
    )
    comps = {r.node: r.component for r in connected_components(edges).collect()}
    assert comps == {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "x": "x", "y": "x", "z": "x",
        "solo1": "solo1", "solo2": "solo1",
    }


def test_rewrite_preserves_literals(spark):
    same_as = spark.createDataFrame(
        [("kg:sym/b", "kg:sameAs", "kg:sym/a", 0)],
        "subj string, pred string, obj string, obj_kind int",
    )
    triples = spark.createDataFrame(
        [
            ("kg:sym/b", "kg:defines", "kg:sym/b", 0),
            ("kg:file/f", "kg:atCommit", "kg:sym/b", 2),  # literal: untouched
        ],
        "subj string, pred string, obj string, obj_kind int",
    )
    mapping = canonical_map(same_as)
    out = {(r.subj, r.obj, r.obj_kind) for r in rewrite_triples(triples, mapping).collect()}
    assert out == {
        ("kg:sym/a", "kg:sym/a", 0),
        ("kg:file/f", "kg:sym/b", 2),
    }


def test_convergence_on_long_chain(spark):
    # 64-node chain: converges in O(log n)-ish rounds of min propagation,
    # well under MAX_ITERATIONS; all collapse to node 00.
    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i+1:02d}") for i in range(63)], "src string, dst string"
    )
    comps = connected_components(edges)
    assert comps.select("component").distinct().count() == 1
    assert comps.count() == 64
