"""RDF Protobuf codec (S4, RdfFormat.scala:69-78): hand-rolled
protobuf wire round-trip (terms, literals, quads, nested quoted
triples, prefix decls), file sink ∘ source identity, typed errors."""

from __future__ import annotations

import glob
import io

import pytest

from cli_spark import rdfproto as RP
from cli_spark.nquads import KIND_BNODE, KIND_IRI, KIND_LITERAL, KIND_QUOTED

XSD = "http://www.w3.org/2001/XMLSchema#"

ROWS = [
    ("http://e/s", KIND_IRI, "http://e/p", KIND_IRI,
     "plain lit", KIND_LITERAL, None, None, None, None),
    ("http://e/s", KIND_IRI, "http://e/p2", KIND_IRI,
     "30", KIND_LITERAL, XSD + "integer", None, None, None),
    ("b1", KIND_BNODE, "http://e/p3", KIND_IRI,
     "hi", KIND_LITERAL, None, "en", None, None),
    ("http://e/s", KIND_IRI, "http://e/p4", KIND_IRI,
     "http://e/o", KIND_IRI, None, None, "http://e/g", KIND_IRI),
    ("http://e/s", KIND_IRI, "http://e/says", KIND_IRI,
     '<< <http://e/a> <http://e/b> "x\\"y" >>', KIND_QUOTED,
     None, None, None, None),
]


def test_statement_roundtrip():
    blob = b"".join(RP.encode_statement(r) for r in ROWS)
    assert RP.parse_stream(blob) == ROWS


def test_nested_quoted_triple_roundtrip():
    deep = '<< << <http://e/x> <http://e/y> "z" >> <http://e/b> _:n >>'
    r = ("http://e/s", KIND_IRI, "http://e/p", KIND_IRI,
         deep, KIND_QUOTED, None, None, None, None)
    assert RP.parse_stream(RP.encode_statement(r)) == [r]


def test_prefix_decl_scopes_forward():
    decl = RP._len_field(1, RP._str_field(1, "ex") + RP._str_field(2, "http://e/"))
    buf = io.BytesIO()
    RP._write_varint(buf, len(decl))
    buf.write(decl)
    pn = RP._len_field(4, RP._str_field(1, "ex") + RP._str_field(2, "local"))
    body = (
        RP._len_field(1, RP.encode_term("http://e/s", KIND_IRI, None, None))
        + RP._len_field(2, RP.encode_term("http://e/p", KIND_IRI, None, None))
        + RP._len_field(3, pn)
    )
    sr = RP._len_field(2, body)
    RP._write_varint(buf, len(sr))
    buf.write(sr)
    out = RP.parse_stream(buf.getvalue())
    assert out[0][4] == "http://e/local" and out[0][5] == KIND_IRI


def test_undeclared_prefix_raises():
    pn = RP._len_field(4, RP._str_field(1, "nope") + RP._str_field(2, "x"))
    body = (
        RP._len_field(1, RP.encode_term("http://e/s", KIND_IRI, None, None))
        + RP._len_field(2, RP.encode_term("http://e/p", KIND_IRI, None, None))
        + RP._len_field(3, pn)
    )
    sr = RP._len_field(2, body)
    buf = io.BytesIO()
    RP._write_varint(buf, len(sr))
    buf.write(sr)
    with pytest.raises(RP.RdfProtoError, match="undeclared prefix"):
        RP.parse_stream(buf.getvalue())


def test_truncated_stream_raises():
    blob = RP.encode_statement(ROWS[0])
    with pytest.raises(RP.RdfProtoError):
        RP.parse_stream(blob[:-3])


def test_sink_source_identity(spark, tmp_path):
    schema = (
        "subj string, subj_kind int, pred string, pred_kind int, "
        "obj string, obj_kind int, obj_datatype string, obj_lang string, "
        "graph string, graph_kind int"
    )
    df = spark.createDataFrame(ROWS, schema)
    out = str(tmp_path / "out.rpb")
    RP.write_rdfproto(df, out, single_file=True)
    assert glob.glob(out + "/part-*.rpb")
    back = RP.read_rdfproto(spark, out)
    assert {tuple(r) for r in back.collect()} == set(ROWS)


def test_format_registry_resolution():
    from cli_spark.formats import resolve

    spec = resolve("data.rpb")
    assert spec.key == "jenaproto" and spec.read is not None
    assert resolve("x", explicit="jena-proto").key == "jenaproto"


def test_encode_batch_byte_identical():
    # the memoized batch fast path must produce exactly the per-row bytes
    rows = ROWS * 3  # repetition exercises the term cache
    assert RP.encode_batch(rows) == b"".join(RP.encode_statement(r) for r in rows)
