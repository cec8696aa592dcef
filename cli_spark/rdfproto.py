"""RDF Protobuf (Jena "RDF Binary") reader + writer (SURVEY.md §2.1 S4;
reference format registry RdfFormat.scala:69-78 — Jena's RDFPROTO,
`supportsQuads`, generalized statements inferred true,
RdfJellySerializationOptions.scala:60-67).

The wire format is hand-rolled from the PUBLIC protocol-buffers
encoding spec (varint tags, zigzag sint, length-delimited submessages)
against the message shapes of Apache Jena's published
``BinaryRDF.proto`` (RDF_StreamRow / RDF_Triple / RDF_Quad / RDF_Term /
RDF_Literal / RDF_PrefixDecl), stream framing = length-delimited rows
(``writeDelimitedTo``). No protobuf library is needed or used.
Interop with Jena itself is untested in this sandbox (no Jena jars);
the within-engine contract is the round-trip plus the format sweep.

Field numbers used (documented so a later interop pass can diff them
against Jena's .proto):

    RDF_StreamRow: prefixDecl=1 triple=2 quad=3
    RDF_Triple/RDF_Quad: S=1 P=2 O=3 (G=4)
    RDF_Term: iri=1 bnode=2 literal=3 prefixName=4 tripleTerm=6
    RDF_IRI: iri=1    RDF_BNode: label=1
    RDF_Literal: lex=1 langtag=2 datatype=3 simple=9
    RDF_PrefixName: prefix=1 localName=2
    RDF_PrefixDecl: prefix=1 uri=2

Design for Spark's execution model:

- **Reader** is file-parallel (``binaryFile`` + ``mapInPandas``): a
  delimited protobuf stream is inherently sequential (prefix decls
  scope forward), so the file is the parse unit and the corpus of
  files is the 100 TB parallelism axis — the same shape as the Jelly
  frame source (jelly.py) and the reference's one-model-per-file reads.
- **Writer** encodes per Arrow batch in ``mapInPandas`` (binary
  framing is the one place Python-side bytes work is unavoidable —
  same boundary as the Jelly frame encoder), then lays the parts down
  with a binary-concat sink. Prefix compaction is NOT emitted (every
  term is written absolute) so encoding stays embarrassingly parallel
  with zero cross-row state; the reader still honors prefix decls from
  other producers.
"""

from __future__ import annotations

import io
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .nquads import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    KIND_QUOTED,
    TERM_RX,
    TRIPLE_COLS,
    _unescape_py,
)

if TYPE_CHECKING:
    import pandas as pd

_TERM_RE = None  # compiled lazily on executors


def _nt_unescape(s: str) -> str:
    # single left-to-right pass (nquads._unescape_py): ordered .replace
    # chains mis-decode an escaped backslash followed by t/r/n/"
    # ('\\t' must yield backslash + 't', not backslash + TAB)
    return _unescape_py(s)


def _nt_escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\").replace('"', r"\"")
        .replace("\n", r"\n").replace("\r", r"\r").replace("\t", r"\t")
    )


def _classify_term(tok: str) -> tuple[str, int, str | None, str | None]:
    """One N-Triples-syntax term token → (value, kind, datatype, lang),
    the same taxonomy the columnar tokenizer emits (nquads.py:75-100)."""
    if tok.startswith("<<"):
        return tok, KIND_QUOTED, None, None
    if tok.startswith("<"):
        return tok[1:-1], KIND_IRI, None, None
    if tok.startswith("_:"):
        return tok[2:], KIND_BNODE, None, None
    # literal: "..."^^<dt> | "..."@lang | "..."
    dt, lang = None, None
    body = tok
    if '"^^<' in tok:
        body, dt = tok.rsplit("^^<", 1)
        dt = dt[:-1]
    elif tok.rfind('"@') > 0 and not tok.endswith('"'):
        body, lang = tok.rsplit("@", 1)
    return _nt_unescape(body[1:-1]), KIND_LITERAL, dt, lang


def _render_term_text(value: str, kind: int, dt: str | None, lang: str | None) -> str:
    if kind == KIND_QUOTED:
        return value
    if kind == KIND_IRI:
        return f"<{value}>"
    if kind == KIND_BNODE:
        return f"_:{value[2:]}" if value.startswith("_:") else f"_:{value}"
    out = f'"{_nt_escape(value or "")}"'
    if lang:
        return out + f"@{lang}"
    if dt:
        return out + f"^^<{dt}>"
    return out


def parse_quoted_triple_text(qt: str):
    """'<< s p o >>' source text → (s, sk, p, pk, o, ok, odt, olang);
    whitespace-canonicalizing (render ∘ parse normalizes spacing)."""
    global _TERM_RE
    if _TERM_RE is None:
        import re as _re

        _TERM_RE = _re.compile(TERM_RX)
    inner = qt.strip()[2:-2]
    toks = [m.group(1) for m in _TERM_RE.finditer(inner)]
    if len(toks) != 3:
        raise RdfProtoError(f"malformed quoted triple: {qt!r}")
    s, sk, _, _ = _classify_term(toks[0])
    p, pk, _, _ = _classify_term(toks[1])
    o, ok, odt, olang = _classify_term(toks[2])
    return s, sk, p, pk, o, ok, odt, olang


def render_quoted_triple_text(s, sk, p, pk, o, ok, odt, olang) -> str:
    return (
        "<< " + _render_term_text(s, sk, None, None)
        + " " + _render_term_text(p, pk, None, None)
        + " " + _render_term_text(o, ok, odt, olang) + " >>"
    )

_LEN = 2  # protobuf wire type: length-delimited
_VARINT = 0


class RdfProtoError(ValueError):
    """Typed error for malformed RDF Protobuf streams."""


# ---------------------------------------------------------------------------
# protobuf wire primitives (public protocol-buffers encoding spec)
# ---------------------------------------------------------------------------


def _write_varint(buf: io.BytesIO, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        if pos >= len(data):
            raise RdfProtoError("truncated varint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _tag(field: int, wire: int) -> bytes:
    buf = io.BytesIO()
    _write_varint(buf, (field << 3) | wire)
    return buf.getvalue()


def _len_field(field: int, payload: bytes) -> bytes:
    buf = io.BytesIO()
    buf.write(_tag(field, _LEN))
    _write_varint(buf, len(payload))
    buf.write(payload)
    return buf.getvalue()


def _str_field(field: int, s: str) -> bytes:
    return _len_field(field, s.encode("utf-8"))


def _fields(data: bytes) -> Iterator[tuple[int, int, bytes | int]]:
    """Iterate (field_number, wire_type, value) over a message body."""
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        field, wire = key >> 3, key & 7
        if wire == _VARINT:
            val, pos = _read_varint(data, pos)
        elif wire == _LEN:
            ln, pos = _read_varint(data, pos)
            val = data[pos : pos + ln]
            if len(val) != ln:
                raise RdfProtoError("truncated length-delimited field")
            pos += ln
        elif wire == 1:  # 64-bit
            val = data[pos : pos + 8]
            pos += 8
        elif wire == 5:  # 32-bit
            val = data[pos : pos + 4]
            pos += 4
        else:
            raise RdfProtoError(f"unsupported wire type {wire}")
        yield field, wire, val


# ---------------------------------------------------------------------------
# term / statement codec (shapes of Jena BinaryRDF.proto)
# ---------------------------------------------------------------------------


def encode_term(value: str, kind: int, dt: str | None, lang: str | None) -> bytes:
    """Term-model term → RDF_Term message bytes."""
    if kind == KIND_IRI:
        return _len_field(1, _str_field(1, value))
    if kind == KIND_BNODE:
        label = value[2:] if value.startswith("_:") else value
        return _len_field(2, _str_field(1, label))
    if kind == KIND_LITERAL:
        body = _str_field(1, value or "")
        if lang:
            body += _str_field(2, lang)
        elif dt:
            body += _str_field(3, dt)
        else:
            body += _tag(9, _VARINT) + b"\x01"  # simple = true
        return _len_field(3, body)
    if kind == KIND_QUOTED:
        # RDF-star: the term VALUE is "<< ... >>" source text; parse it
        # back to (s, p, o) and nest an RDF_Triple (tripleTerm = 6)
        s, sk, p, pk, o, ok, odt, olang = parse_quoted_triple_text(value)
        inner = (
            _len_field(1, encode_term(s, sk, None, None))
            + _len_field(2, encode_term(p, pk, None, None))
            + _len_field(3, encode_term(o, ok, odt, olang))
        )
        return _len_field(6, inner)
    raise RdfProtoError(f"unencodable term kind {kind}")


def decode_term(data: bytes, prefixes: dict[str, str]) -> tuple[str, int, str | None, str | None]:
    """RDF_Term message bytes → (value, kind, datatype, lang)."""
    for field, _wire, val in _fields(data):
        if field == 1:  # iri
            for f2, _w, v2 in _fields(val):
                if f2 == 1:
                    return v2.decode("utf-8"), KIND_IRI, None, None
            return "", KIND_IRI, None, None
        if field == 2:  # bnode
            for f2, _w, v2 in _fields(val):
                if f2 == 1:
                    return v2.decode("utf-8"), KIND_BNODE, None, None
            return "", KIND_BNODE, None, None
        if field == 3:  # literal
            lex, lang, dt = "", None, None
            for f2, _w, v2 in _fields(val):
                if f2 == 1:
                    lex = v2.decode("utf-8")
                elif f2 == 2:
                    lang = v2.decode("utf-8")
                elif f2 == 3:
                    dt = v2.decode("utf-8")
            return lex, KIND_LITERAL, dt, lang
        if field == 4:  # prefixName: decoded against the running decl map
            pfx, local = "", ""
            for f2, _w, v2 in _fields(val):
                if f2 == 1:
                    pfx = v2.decode("utf-8")
                elif f2 == 2:
                    local = v2.decode("utf-8")
            if pfx not in prefixes:
                raise RdfProtoError(f"undeclared prefix {pfx!r}")
            return prefixes[pfx] + local, KIND_IRI, None, None
        if field == 6:  # nested triple term → "<< ... >>" source text
            parts = {}
            for f2, _w, v2 in _fields(val):
                parts[f2] = decode_term(v2, prefixes)
            s, sk, _, _ = parts[1]
            p, pk, _, _ = parts[2]
            o, ok, odt, olang = parts[3]
            return (
                render_quoted_triple_text(s, sk, p, pk, o, ok, odt, olang),
                KIND_QUOTED, None, None,
            )
    raise RdfProtoError("empty RDF_Term")


def encode_statement(row: tuple) -> bytes:
    """TRIPLE_COLS-ordered row → delimited RDF_StreamRow bytes."""
    (s, sk, p, pk, o, ok, dt, lang, g, gk) = row
    body = (
        _len_field(1, encode_term(s, sk if sk is not None else KIND_IRI, None, None))
        + _len_field(2, encode_term(p, pk if pk is not None else KIND_IRI, None, None))
        + _len_field(3, encode_term(o, ok, dt, lang))
    )
    if g is not None:
        body += _len_field(4, encode_term(g, gk if gk is not None else KIND_IRI, None, None))
        stream_row = _len_field(3, body)  # quad = 3
    else:
        stream_row = _len_field(2, body)  # triple = 2
    out = io.BytesIO()
    _write_varint(out, len(stream_row))
    out.write(stream_row)
    return out.getvalue()


def _varint_bytes(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_batch(rows) -> bytes:
    """Batch fast path for the sink: one bytearray and memoized per-term
    field encodings (terms repeat Zipf-style within a batch), instead of
    per-row BytesIO + re-encoding every string. Byte-identical to
    ``encode_statement`` row by row (asserted in test_rdfproto)."""
    out = bytearray()
    cache: dict[tuple, bytes] = {}

    def fb(field: int, term, kind, dt, lang) -> bytes:
        key = (field, term, kind, dt, lang)
        v = cache.get(key)
        if v is None:
            v = _len_field(field, encode_term(term, kind, dt, lang))
            cache[key] = v
        return v

    for s, sk, p, pk, o, ok, dt, lang, g, gk in rows:
        body = (
            fb(1, s, sk if sk is not None else KIND_IRI, None, None)
            + fb(2, p, pk if pk is not None else KIND_IRI, None, None)
            + fb(3, o, ok, dt, lang)
        )
        if g is not None:
            body += fb(4, g, gk if gk is not None else KIND_IRI, None, None)
            stream_row = _len_field(3, body)  # quad = 3
        else:
            stream_row = _len_field(2, body)  # triple = 2
        out += _varint_bytes(len(stream_row))
        out += stream_row
    return bytes(out)


def parse_stream(data: bytes) -> list[tuple]:
    """Delimited RDF_StreamRow sequence → TRIPLE_COLS rows. Prefix
    decls update the running map and emit no rows (Jena stream-row
    semantics: decls scope forward)."""
    rows: list[tuple] = []
    prefixes: dict[str, str] = {}
    pos = 0
    while pos < len(data):
        ln, pos = _read_varint(data, pos)
        msg = data[pos : pos + ln]
        if len(msg) != ln:
            raise RdfProtoError("truncated stream row")
        pos += ln
        for field, _wire, val in _fields(msg):
            if field == 1:  # prefixDecl
                pfx, uri = "", ""
                for f2, _w, v2 in _fields(val):
                    if f2 == 1:
                        pfx = v2.decode("utf-8")
                    elif f2 == 2:
                        uri = v2.decode("utf-8")
                prefixes[pfx] = uri
            elif field in (2, 3):  # triple / quad
                parts = {}
                for f2, _w, v2 in _fields(val):
                    parts[f2] = decode_term(v2, prefixes)
                s, sk, _, _ = parts[1]
                p, pk, _, _ = parts[2]
                o, ok, dt, lang = parts[3]
                if field == 3 and 4 in parts:
                    g, gk, _, _ = parts[4]
                else:
                    g, gk = None, None
                rows.append((s, sk, p, pk, o, ok, dt, lang, g, gk))
            else:
                raise RdfProtoError(f"unknown RDF_StreamRow field {field}")
    return rows


# ---------------------------------------------------------------------------
# Spark surfaces
# ---------------------------------------------------------------------------

_SCHEMA = (
    "subj string, subj_kind int, pred string, pred_kind int, "
    "obj string, obj_kind int, obj_datatype string, obj_lang string, "
    "graph string, graph_kind int"
)


def read_rdfproto(spark: SparkSession, path: str) -> DataFrame:
    """RDF Protobuf files → term-model statements, one task per FILE
    (a delimited stream is sequential: prefix decls scope forward)."""
    raw = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows: list[tuple] = []
            for content in pdf["content"]:
                rows.extend(parse_stream(bytes(content)))
            yield pd.DataFrame(rows, columns=TRIPLE_COLS)

    return raw.mapInPandas(parse, _SCHEMA)


def write_rdfproto(
    statements: DataFrame, path: str, single_file: bool = False
) -> None:
    """RDF Protobuf sink: per-batch encode (zero cross-row state — no
    prefix compaction emitted, so partitions concatenate into one valid
    delimited stream), parts laid down as binary blobs."""
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
    # binary formats need raw concatenated bytes, not parquet: collapse
    # the (small: one row per partition) blob table to the final file
    spark = statements.sparkSession
    parts = spark.read.parquet(path + "._parts").collect()
    import os
    import shutil

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-00000.rpb"), "wb") as f:
        for r in parts:
            if r.blob:
                f.write(bytes(r.blob))
    shutil.rmtree(path + "._parts", ignore_errors=True)
