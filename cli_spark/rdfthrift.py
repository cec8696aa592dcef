"""RDF Thrift (Jena "RDF Binary", Thrift encoding) reader + writer
(SURVEY.md §2.1 S4; reference format registry RdfFormat.scala:79-88 —
Jena's RDFTHRIFT, `supportsQuads`, generalized statements inferred
true, RdfJellySerializationOptions.scala:60-67).

The wire format is hand-rolled from the PUBLIC Apache Thrift compact-
protocol spec (zigzag varints, delta field ids, self-delimiting structs
via the STOP marker) against the struct shapes of Jena's published
``RDF.thrift`` (RDF_StreamRow / RDF_Triple / RDF_Quad / RDF_Term /
RDF_Literal / RDF_PrefixDecl). Stream framing follows Jena's
StreamRDF2Thrift: RDF_StreamRow structs back-to-back, no length
prefix (structs self-delimit). No thrift library is needed or used;
interop with Jena itself is untested in this sandbox (no jars).

Field ids used (documented for a later interop diff against RDF.thrift):

    RDF_StreamRow (union): prefixDecl=1 triple=2 quad=3
    RDF_Triple/RDF_Quad: S=1 P=2 O=3 (G=4)
    RDF_Term (union): iri=1 bnode=2 literal=3 prefixName=4 tripleTerm=9
    RDF_IRI: iri=1    RDF_BNode: label=1
    RDF_Literal: lex=1 langtag=2 datatype=3
    RDF_PrefixDecl: prefix=1 uri=2

Spark surfaces are the same shape as the protobuf sibling
(cli_spark/rdfproto.py): file-parallel ``binaryFile`` + ``mapInPandas``
reader (a thrift stream is sequential — prefix decls scope forward),
per-batch encoding writer with zero cross-row state (no prefix
compaction emitted), binary-concat sink.
"""

from __future__ import annotations

import io
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .nquads import KIND_BNODE, KIND_IRI, KIND_LITERAL, KIND_QUOTED, TRIPLE_COLS
from .rdfproto import (
    parse_quoted_triple_text,
    render_quoted_triple_text,
)

if TYPE_CHECKING:
    import pandas as pd

# thrift compact-protocol type ids (public spec)
_T_STOP = 0
_T_TRUE = 1
_T_FALSE = 2
_T_BINARY = 8
_T_STRUCT = 12


class RdfThriftError(ValueError):
    """Typed error for malformed RDF Thrift streams."""


def _write_uvarint(buf: io.BytesIO, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    out, shift = 0, 0
    while True:
        if pos >= len(data):
            raise RdfThriftError("truncated varint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _field_header(buf: io.BytesIO, field_id: int, type_id: int, last_id: int) -> int:
    """Compact-protocol field header: short form packs the id delta
    (1..15) into the high nibble; long form writes the zigzag id."""
    delta = field_id - last_id
    if 0 < delta <= 15:
        buf.write(bytes(((delta << 4) | type_id,)))
    else:
        buf.write(bytes((type_id,)))
        _write_uvarint(buf, (field_id << 1) ^ (field_id >> 63))  # zigzag
    return field_id


def _str_field(buf: io.BytesIO, field_id: int, s: str, last_id: int) -> int:
    last_id = _field_header(buf, field_id, _T_BINARY, last_id)
    raw = s.encode("utf-8")
    _write_uvarint(buf, len(raw))
    buf.write(raw)
    return last_id


def _struct_field(buf: io.BytesIO, field_id: int, payload: bytes, last_id: int) -> int:
    last_id = _field_header(buf, field_id, _T_STRUCT, last_id)
    buf.write(payload)  # struct bodies self-delimit with STOP
    return last_id


def _stop(buf: io.BytesIO) -> None:
    buf.write(b"\x00")


def _read_struct(data: bytes, pos: int) -> tuple[list[tuple], int]:
    """Parse one struct body starting at pos → ([(field_id, type_id,
    value)], pos_after_STOP). Value is bytes for BINARY, a (start, end)
    span for STRUCT (the nested body, STOP excluded), bool for BOOL."""
    fields: list[tuple] = []
    last_id = 0
    while True:
        if pos >= len(data):
            raise RdfThriftError("truncated struct")
        head = data[pos]
        pos += 1
        if head == _T_STOP:
            return fields, pos
        type_id = head & 0x0F
        delta = head >> 4
        if delta:
            field_id = last_id + delta
        else:
            z, pos = _read_uvarint(data, pos)
            field_id = (z >> 1) ^ -(z & 1)
        last_id = field_id
        if type_id == _T_BINARY:
            ln, pos = _read_uvarint(data, pos)
            val = data[pos : pos + ln]
            if len(val) != ln:
                raise RdfThriftError("truncated binary field")
            pos += ln
        elif type_id == _T_STRUCT:
            start = pos
            _inner, pos = _read_struct(data, pos)
            val = (start, pos - 1)  # nested body span, STOP excluded
        elif type_id in (_T_TRUE, _T_FALSE):
            val = type_id == _T_TRUE
        else:
            raise RdfThriftError(f"unsupported compact type {type_id}")
        fields.append((field_id, type_id, val))


# ---------------------------------------------------------------------------
# term / statement codec (shapes of Jena RDF.thrift)
# ---------------------------------------------------------------------------


def encode_term(value: str, kind: int, dt: str | None, lang: str | None) -> bytes:
    """Term-model term → RDF_Term union bytes (STOP-terminated)."""
    buf = io.BytesIO()
    if kind == KIND_IRI:
        inner = io.BytesIO()
        _str_field(inner, 1, value, 0)
        _stop(inner)
        _struct_field(buf, 1, inner.getvalue(), 0)
    elif kind == KIND_BNODE:
        label = value[2:] if value.startswith("_:") else value
        inner = io.BytesIO()
        _str_field(inner, 1, label, 0)
        _stop(inner)
        _struct_field(buf, 2, inner.getvalue(), 0)
    elif kind == KIND_LITERAL:
        inner = io.BytesIO()
        last = _str_field(inner, 1, value or "", 0)
        if lang:
            last = _str_field(inner, 2, lang, last)
        elif dt:
            last = _str_field(inner, 3, dt, last)
        _stop(inner)
        _struct_field(buf, 3, inner.getvalue(), 0)
    elif kind == KIND_QUOTED:
        s, sk, p, pk, o, ok, odt, olang = parse_quoted_triple_text(value)
        inner = io.BytesIO()
        last = _struct_field(inner, 1, encode_term(s, sk, None, None), 0)
        last = _struct_field(inner, 2, encode_term(p, pk, None, None), last)
        last = _struct_field(inner, 3, encode_term(o, ok, odt, olang), last)
        _stop(inner)
        _struct_field(buf, 9, inner.getvalue(), 0)
    else:
        raise RdfThriftError(f"unencodable term kind {kind}")
    _stop(buf)
    return buf.getvalue()


def _strs(data: bytes, span: tuple[int, int]) -> dict[int, str]:
    fields, _ = _read_struct(data[: span[1] + 1], span[0])
    return {
        f: v.decode("utf-8") for f, t, v in fields if t == _T_BINARY
    }


def decode_term(
    data: bytes, span: tuple[int, int], prefixes: dict[str, str]
) -> tuple[str, int, str | None, str | None]:
    """RDF_Term union span → (value, kind, datatype, lang)."""
    fields, _ = _read_struct(data[: span[1] + 1], span[0])
    for field_id, type_id, val in fields:
        if type_id != _T_STRUCT:
            continue
        if field_id == 1:  # iri
            return _strs(data, val).get(1, ""), KIND_IRI, None, None
        if field_id == 2:  # bnode
            return _strs(data, val).get(1, ""), KIND_BNODE, None, None
        if field_id == 3:  # literal
            d = _strs(data, val)
            return d.get(1, ""), KIND_LITERAL, d.get(3), d.get(2)
        if field_id == 4:  # prefixName
            d = _strs(data, val)
            pfx = d.get(1, "")
            if pfx not in prefixes:
                raise RdfThriftError(f"undeclared prefix {pfx!r}")
            return prefixes[pfx] + d.get(2, ""), KIND_IRI, None, None
        if field_id == 9:  # nested triple term
            inner, _ = _read_struct(data[: val[1] + 1], val[0])
            parts = {
                f: decode_term(data, v, prefixes)
                for f, t, v in inner
                if t == _T_STRUCT
            }
            s, sk, _, _ = parts[1]
            p, pk, _, _ = parts[2]
            o, ok, odt, olang = parts[3]
            return (
                render_quoted_triple_text(s, sk, p, pk, o, ok, odt, olang),
                KIND_QUOTED, None, None,
            )
    raise RdfThriftError("empty RDF_Term")


def encode_statement(row: tuple) -> bytes:
    """TRIPLE_COLS-ordered row → one RDF_StreamRow struct."""
    (s, sk, p, pk, o, ok, dt, lang, g, gk) = row
    inner = io.BytesIO()
    last = _struct_field(
        inner, 1, encode_term(s, sk if sk is not None else KIND_IRI, None, None), 0
    )
    last = _struct_field(
        inner, 2, encode_term(p, pk if pk is not None else KIND_IRI, None, None), last
    )
    last = _struct_field(inner, 3, encode_term(o, ok, dt, lang), last)
    if g is not None:
        last = _struct_field(
            inner, 4,
            encode_term(g, gk if gk is not None else KIND_IRI, None, None), last,
        )
    _stop(inner)
    out = io.BytesIO()
    _struct_field(out, 3 if g is not None else 2, inner.getvalue(), 0)
    _stop(out)
    return out.getvalue()


# field-id deltas in a statement struct are always 1 (s,p,o,g in order)
# and the outer RDF_StreamRow field is 2 (triple) or 3 (quad) from last
# 0, so every compact-protocol header byte is a constant:
_HDR_INNER = bytes(((1 << 4) | _T_STRUCT,))
_HDR_TRIPLE = bytes(((2 << 4) | _T_STRUCT,))
_HDR_QUAD = bytes(((3 << 4) | _T_STRUCT,))


def encode_batch(rows) -> bytes:
    """Batch fast path for the sink: one bytearray, constant framing
    bytes, memoized per-term struct encodings (terms repeat Zipf-style
    within a batch). Byte-identical to ``encode_statement`` row by row
    (asserted in test_rdfthrift)."""
    out = bytearray()
    cache: dict[tuple, bytes] = {}

    def tb(term, kind, dt, lang) -> bytes:
        key = (term, kind, dt, lang)
        v = cache.get(key)
        if v is None:
            v = encode_term(term, kind, dt, lang)
            cache[key] = v
        return v

    for s, sk, p, pk, o, ok, dt, lang, g, gk in rows:
        out += _HDR_QUAD if g is not None else _HDR_TRIPLE
        out += _HDR_INNER
        out += tb(s, sk if sk is not None else KIND_IRI, None, None)
        out += _HDR_INNER
        out += tb(p, pk if pk is not None else KIND_IRI, None, None)
        out += _HDR_INNER
        out += tb(o, ok, dt, lang)
        if g is not None:
            out += _HDR_INNER
            out += tb(g, gk if gk is not None else KIND_IRI, None, None)
        out += b"\x00\x00"  # inner STOP + outer STOP
    return bytes(out)


def parse_stream(data: bytes) -> list[tuple]:
    """Back-to-back RDF_StreamRow structs → TRIPLE_COLS rows; prefix
    decls update the running map and emit no rows."""
    rows: list[tuple] = []
    prefixes: dict[str, str] = {}
    pos = 0
    while pos < len(data):
        fields, pos = _read_struct(data, pos)
        for field_id, type_id, val in fields:
            if type_id != _T_STRUCT:
                raise RdfThriftError(
                    f"non-struct RDF_StreamRow field {field_id}"
                )
            if field_id == 1:  # prefixDecl
                d = _strs(data, val)
                prefixes[d.get(1, "")] = d.get(2, "")
            elif field_id in (2, 3):  # triple / quad
                inner, _ = _read_struct(data[: val[1] + 1], val[0])
                parts = {
                    f: decode_term(data, v, prefixes)
                    for f, t, v in inner
                    if t == _T_STRUCT
                }
                s, sk, _, _ = parts[1]
                p, pk, _, _ = parts[2]
                o, ok, dt, lang = parts[3]
                if field_id == 3 and 4 in parts:
                    g, gk, _, _ = parts[4]
                else:
                    g, gk = None, None
                rows.append((s, sk, p, pk, o, ok, dt, lang, g, gk))
            else:
                raise RdfThriftError(f"unknown RDF_StreamRow field {field_id}")
    return rows


# ---------------------------------------------------------------------------
# Spark surfaces
# ---------------------------------------------------------------------------

_SCHEMA = (
    "subj string, subj_kind int, pred string, pred_kind int, "
    "obj string, obj_kind int, obj_datatype string, obj_lang string, "
    "graph string, graph_kind int"
)


def read_rdfthrift(spark: SparkSession, path: str) -> DataFrame:
    """RDF Thrift files → term-model statements, one task per FILE."""
    raw = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows: list[tuple] = []
            for content in pdf["content"]:
                rows.extend(parse_stream(bytes(content)))
            yield pd.DataFrame(rows, columns=TRIPLE_COLS)

    return raw.mapInPandas(parse, _SCHEMA)


def write_rdfthrift(
    statements: DataFrame, path: str, single_file: bool = False
) -> None:
    """RDF Thrift sink (same shape as rdfproto.write_rdfproto: per-batch
    encode with zero cross-row state, binary-concat layout)."""
    cols = set(statements.columns)
    sel = [
        (F.col(c) if c in cols else F.lit(None).cast(t)).alias(c)
        for c, t in (
            ("subj", "string"), ("subj_kind", "int"),
            ("pred", "string"), ("pred_kind", "int"),
            ("obj", "string"), ("obj_kind", "int"),
            ("obj_datatype", "string"), ("obj_lang", "string"),
            ("graph", "string"), ("graph_kind", "int"),
        )
    ]
    df = statements.select(*sel)

    def encode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            blob = encode_batch(
                tuple(None if pd.isna(v) else v for v in row)
                for row in pdf.itertuples(index=False, name=None)
            )
            yield pd.DataFrame({"blob": [blob]})

    blobs = df.mapInPandas(encode, "blob binary")
    if single_file:
        blobs = blobs.coalesce(1)
    blobs.write.mode("overwrite").format("parquet").save(path + "._parts")
    parts = statements.sparkSession.read.parquet(path + "._parts").collect()
    import os
    import shutil

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-00000.trdf"), "wb") as f:
        for r in parts:
            if r.blob:
                f.write(bytes(r.blob))
    shutil.rmtree(path + "._parts", ignore_errors=True)
