"""RDF compare battery: ordered positional compare with bnode bijection
(J1), unordered per-graph isomorphism via hash refinement (J2),
containment (J3), P/R scoring — mirrors the reference's validate specs
(OrderedRdfCompare / UnorderedRdfCompare)."""

from __future__ import annotations

import pytest

from cli_spark.compare import (
    canonicalize_bnodes,
    containment,
    ordered_compare,
    precision_recall,
    unordered_compare,
)

SCHEMA = "idx long, subj string, pred string, obj string"
GSCHEMA = "graph string, subj string, pred string, obj string"


def df(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema)


def test_ordered_equal_plain(spark):
    a = df(spark, [(1, "kg:a", "kg:p", "kg:b"), (2, "kg:b", "kg:p", "kg:c")])
    assert ordered_compare(a, a).equal


def test_ordered_bnode_bijection_ok(spark):
    e = df(spark, [(1, "_:x", "kg:p", "_:y"), (2, "_:x", "kg:p", "_:z")])
    a = df(spark, [(1, "_:1", "kg:p", "_:2"), (2, "_:1", "kg:p", "_:3")])
    assert ordered_compare(e, a).equal


def test_ordered_bnode_bijection_violation(spark):
    # _:x maps to both _:1 and _:2 → not a function
    e = df(spark, [(1, "_:x", "kg:p", "kg:o"), (2, "_:x", "kg:p", "kg:o2")])
    a = df(spark, [(1, "_:1", "kg:p", "kg:o"), (2, "_:2", "kg:p", "kg:o2")])
    res = ordered_compare(e, a)
    assert not res.equal and "bnode" in res.detail


def test_ordered_size_and_value_mismatch(spark):
    e = df(spark, [(1, "kg:a", "kg:p", "kg:b")])
    a = df(spark, [(1, "kg:a", "kg:p", "kg:b"), (2, "kg:a", "kg:p", "kg:c")])
    assert not ordered_compare(e, a).equal
    b = df(spark, [(1, "kg:a", "kg:p", "kg:DIFFERENT")])
    assert not ordered_compare(e, b).equal
    # bnode vs IRI at same position is a kind mismatch
    c = df(spark, [(1, "_:b", "kg:p", "kg:b")])
    assert not ordered_compare(e, c).equal


def test_unordered_isomorphic_relabeling(spark):
    e = df(
        spark,
        [(None, "_:x", "kg:p", "_:y"), (None, "_:y", "kg:q", "kg:iri")],
        GSCHEMA,
    )
    a = df(
        spark,
        [(None, "_:n2", "kg:q", "kg:iri"), (None, "_:n1", "kg:p", "_:n2")],
        GSCHEMA,
    )
    assert unordered_compare(e, a).equal


def test_unordered_not_isomorphic(spark):
    e = df(spark, [(None, "_:x", "kg:p", "_:y")], GSCHEMA)
    a = df(spark, [(None, "_:x", "kg:p", "kg:iri")], GSCHEMA)
    res = unordered_compare(e, a)
    assert not res.equal


def test_unordered_graph_set_mismatch(spark):
    e = df(spark, [("kg:g1", "kg:a", "kg:p", "kg:b")], GSCHEMA)
    a = df(spark, [("kg:g2", "kg:a", "kg:p", "kg:b")], GSCHEMA)
    res = unordered_compare(e, a)
    assert not res.equal and "graph" in res.detail


def test_canonicalization_distinguishes_structure(spark):
    # chain vs star with 3 bnodes — same degree sums, different structure
    chain = df(
        spark,
        [(None, "_:a", "kg:p", "_:b"), (None, "_:b", "kg:p", "_:c")],
        GSCHEMA,
    )
    star = df(
        spark,
        [(None, "_:a", "kg:p", "_:b"), (None, "_:a", "kg:p", "_:c")],
        GSCHEMA,
    )
    assert not unordered_compare(chain, star).equal


def test_containment_and_pr(spark):
    e = df(spark, [(1, "kg:a", "kg:p", "kg:b"), (2, "kg:a", "kg:p", "kg:c")])
    a = df(spark, [(1, "kg:a", "kg:p", "kg:b")])
    assert containment(e, a) == 1
    assert containment(a, e) == 0
    pr = precision_recall(e, a)
    assert pr["precision"] == 1.0 and pr["recall"] == 0.5


def test_canonical_labels_deterministic(spark):
    t = df(
        spark,
        [(None, "_:x", "kg:p", "_:y"), (None, "_:y", "kg:p", "kg:o")],
        GSCHEMA,
    )
    a = canonicalize_bnodes(t)
    b = canonicalize_bnodes(t)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
