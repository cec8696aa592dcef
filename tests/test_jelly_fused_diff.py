"""Differential gate: fused per-segment encoder vs join-based encoder.

The fused path (one applyInPandas task per segment, dictionaries built
in-task — `cli_spark.jelly._encode_segments_fused`) must produce
byte-identical frames to the join-based path it replaced
(`_encode_statements_joins`), across prefix-table on/off and
large/small name tables (small tables exercise multi-segment streams
and RDF-star atoms overflowing the declared bound).
"""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import cli_spark.jelly as J
from cli_spark.jelly import (
    PHYSICAL_TRIPLES,
    StreamOptions,
    _canonical_terms,
    _encode_statements_joins,
    _TERM_COLS,
)
from cli_spark.order import global_row_number


@pytest.fixture(scope="module")
def triples(spark):
    rows = []
    for i in range(300):
        rows.append((f"http://ex.org/s/{i % 97}", f"http://ex.org/p/{i % 13}",
                     f"http://ex.org/o/{i}", 0, None, None))
        rows.append((
            f"http://ex.org/s/{i % 97}", "http://ex.org/p/label",
            f"value {i}", 2,
            "http://www.w3.org/2001/XMLSchema#string" if i % 3 == 0 else None,
            "en" if i % 5 == 0 else None,
        ))
        if i % 50 == 0:
            rows.append((
                f"_:b{i}", "http://ex.org/p/star",
                f'<< <http://ex.org/s/{i}> <http://ex.org/p/1> "lit{i}" >>',
                3, None, None,
            ))
    return spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_kind int, "
        "obj_datatype string, obj_lang string",
    ).persist()


def _frames_bytes(df):
    return {(r.seg, r.frame_index): (r.n_rows, bytes(r.frame_bytes))
            for r in df.collect()}


@pytest.mark.parametrize("prefix_table", [False, True])
@pytest.mark.parametrize("max_name_table", [4096, 64])
def test_fused_matches_joins_bytes(spark, triples, prefix_table, max_name_table):
    opts = StreamOptions(max_name_table=max_name_table,
                         max_dt_table=max_name_table)
    fused = J.encode_triples(spark, triples, rows_per_frame=16,
                             options=opts, prefix_table=prefix_table)
    # replicate _encode_statements' prologue, then force the joins path
    seg_rows_raw = max(1, max_name_table // 3)
    rpf = min(16, seg_rows_raw)
    seg_rows = (seg_rows_raw // rpf) * rpf
    canon = _canonical_terms(triples, False).dropDuplicates()
    keys = [c for p in ("s", "p", "o") for c in _TERM_COLS(p)]
    ordered = global_row_number(canon, keys).withColumn(
        "seg", F.floor((F.col("rn") - 1) / seg_rows).cast("long"))
    joins = _encode_statements_joins(ordered, PHYSICAL_TRIPLES, rpf,
                                     seg_rows, opts, prefix_table, None)
    a, b = _frames_bytes(fused), _frames_bytes(joins)
    assert set(a) == set(b)
    mismatches = [k for k in a if a[k] != b[k]]
    assert not mismatches


def test_fused_quads_roundtrip(spark, triples):
    quads = triples.withColumn(
        "graph",
        F.when(F.col("obj_kind") == 0, F.lit("http://ex.org/g/1"))
        .otherwise(F.lit(None)),
    )
    out = J.roundtrip_quads(spark, quads, rows_per_frame=16, prefix_table=True)
    got = {(r.subj, r.pred, r.obj, r.obj_kind, r.graph) for r in out.collect()}
    want = {(r.subj, r.pred, r.obj, r.obj_kind, r.graph)
            for r in quads.dropDuplicates(
                ["subj", "pred", "obj", "obj_kind", "graph"]).collect()}
    assert got == want


def test_fused_graphs_roundtrip(spark, triples):
    quads = triples.withColumn(
        "graph",
        F.when(F.col("obj_kind") == 0, F.lit("http://ex.org/g/1"))
        .otherwise(F.lit(None)),
    )
    frames = J.encode_quads_graphs(spark, quads, rows_per_frame=16)
    out = J.decode_quads_graphs(J.decode_frames(frames))
    got = {(r.subj, r.pred, r.obj, r.obj_kind, r.graph) for r in out.collect()}
    want = {(r.subj, r.pred, r.obj, r.obj_kind, r.graph)
            for r in quads.dropDuplicates(
                ["subj", "pred", "obj", "obj_kind", "graph"]).collect()}
    assert got == want
