"""RDF Thrift codec (S4, RdfFormat.scala:79-88): compact-protocol
round-trip (terms, literals, quads, nested quoted triples, prefix
decls, long-form field ids), sink ∘ source identity, typed errors."""

from __future__ import annotations

import glob
import io

import pytest

from cli_spark import rdfthrift as RT
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
    blob = b"".join(RT.encode_statement(r) for r in ROWS)
    assert RT.parse_stream(blob) == ROWS


def test_nested_quoted_triple_roundtrip():
    deep = '<< << <http://e/x> <http://e/y> "z" >> <http://e/b> _:n >>'
    r = ("http://e/s", KIND_IRI, "http://e/p", KIND_IRI,
         deep, KIND_QUOTED, None, None, None, None)
    assert RT.parse_stream(RT.encode_statement(r)) == [r]


def _row_struct(field_id: int, body: bytes) -> bytes:
    out = io.BytesIO()
    RT._struct_field(out, field_id, body, 0)
    RT._stop(out)
    return out.getvalue()


def test_prefix_decl_scopes_forward():
    decl = io.BytesIO()
    last = RT._str_field(decl, 1, "ex", 0)
    RT._str_field(decl, 2, "http://e/", last)
    RT._stop(decl)
    stream = _row_struct(1, decl.getvalue())

    pn = io.BytesIO()
    last = RT._str_field(pn, 1, "ex", 0)
    RT._str_field(pn, 2, "local", last)
    RT._stop(pn)
    term = io.BytesIO()
    RT._struct_field(term, 4, pn.getvalue(), 0)  # RDF_Term.prefixName
    RT._stop(term)
    triple = io.BytesIO()
    last = RT._struct_field(
        triple, 1, RT.encode_term("http://e/s", KIND_IRI, None, None), 0)
    last = RT._struct_field(
        triple, 2, RT.encode_term("http://e/p", KIND_IRI, None, None), last)
    RT._struct_field(triple, 3, term.getvalue(), last)
    RT._stop(triple)
    stream += _row_struct(2, triple.getvalue())

    out = RT.parse_stream(stream)
    assert out[0][4] == "http://e/local" and out[0][5] == KIND_IRI


def test_undeclared_prefix_raises():
    pn = io.BytesIO()
    last = RT._str_field(pn, 1, "nope", 0)
    RT._str_field(pn, 2, "x", last)
    RT._stop(pn)
    term = io.BytesIO()
    RT._struct_field(term, 4, pn.getvalue(), 0)
    RT._stop(term)
    triple = io.BytesIO()
    last = RT._struct_field(
        triple, 1, RT.encode_term("http://e/s", KIND_IRI, None, None), 0)
    last = RT._struct_field(
        triple, 2, RT.encode_term("http://e/p", KIND_IRI, None, None), last)
    RT._struct_field(triple, 3, term.getvalue(), last)
    RT._stop(triple)
    with pytest.raises(RT.RdfThriftError, match="undeclared prefix"):
        RT.parse_stream(_row_struct(2, triple.getvalue()))


def test_long_form_field_header_roundtrip():
    # delta 0 forces the long (zigzag id) header path in both directions
    buf = io.BytesIO()
    RT._field_header(buf, 20, RT._T_STRUCT, 0)  # delta 20 > 15 → long form
    raw = buf.getvalue()
    assert raw[0] == RT._T_STRUCT  # no packed delta nibble
    fields, _ = RT._read_struct(
        raw + RT.encode_term("http://e/x", KIND_IRI, None, None) + b"\x00", 0)
    assert fields[0][0] == 20 and fields[0][1] == RT._T_STRUCT


def test_truncated_stream_raises():
    blob = RT.encode_statement(ROWS[0])
    with pytest.raises(RT.RdfThriftError):
        RT.parse_stream(blob[:-3])


def test_sink_source_identity(spark, tmp_path):
    schema = (
        "subj string, subj_kind int, pred string, pred_kind int, "
        "obj string, obj_kind int, obj_datatype string, obj_lang string, "
        "graph string, graph_kind int"
    )
    df = spark.createDataFrame(ROWS, schema)
    out = str(tmp_path / "out.trdf")
    RT.write_rdfthrift(df, out, single_file=True)
    assert glob.glob(out + "/part-*.trdf")
    back = RT.read_rdfthrift(spark, out)
    assert {tuple(r) for r in back.collect()} == set(ROWS)


def test_format_registry_resolution():
    from cli_spark.formats import resolve

    spec = resolve("data.trdf")
    assert spec.key == "jenathrift" and spec.read is not None
    assert resolve("x", explicit="jena-thrift").key == "jenathrift"


def test_encode_batch_byte_identical():
    # constant-framing batch fast path == per-row encoder, byte for byte
    rows = ROWS * 3
    assert RT.encode_batch(rows) == b"".join(RT.encode_statement(r) for r in rows)
