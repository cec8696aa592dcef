"""Property-based round-trip tests (hypothesis) for the pure-Python
codec layers — the parts of the engine where a single mis-encoded byte
silently corrupts data at scale:

- RDF Protobuf / RDF Thrift statement codecs (encode ∘ parse identity
  over randomized term tuples, incl. unicode literals, datatypes,
  langtags, named graphs, quoted triples)
- the N-Triples escape/unescape pair
- the pure-numpy media codecs (PNG/BMP/PPM/WAV) over randomized arrays

Example-based tests cover the known shapes; these sweep the input space
the examples can't."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cli_spark.nquads import KIND_BNODE, KIND_IRI, KIND_LITERAL, KIND_QUOTED
from cli_spark.turtle import _escape_nt_py, _nt_term_text, _unescape_py

# --------------------------------------------------------------- strategies

_iri = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=":/#._-"
    ),
    min_size=1,
    max_size=40,
).map(lambda s: "kg:" + s)

_bnode_label = st.from_regex(r"[A-Za-z0-9_][A-Za-z0-9_\-.]{0,20}[A-Za-z0-9_\-]", fullmatch=True)

# any unicode except surrogates (not encodable to UTF-8)
_lex = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
)

_lang = st.from_regex(r"[a-z]{2}(-[a-z0-9]{1,8})?", fullmatch=True)


@st.composite
def _literal(draw):
    value = draw(_lex)
    kind = draw(st.sampled_from(["plain", "dt", "lang"]))
    if kind == "dt":
        return (value, KIND_LITERAL, draw(_iri), None)
    if kind == "lang":
        return (value, KIND_LITERAL, None, draw(_lang))
    return (value, KIND_LITERAL, None, None)


@st.composite
def _node(draw):
    if draw(st.booleans()):
        return (draw(_iri), KIND_IRI, None, None)
    return (draw(_bnode_label), KIND_BNODE, None, None)


@st.composite
def _quoted(draw):
    s = draw(_node)
    p = (draw(_iri), KIND_IRI, None, None)
    o = draw(st.one_of(_node, _literal()))
    text = "<< {} {} {} >>".format(
        _nt_term_text(s[1], s[0], s[2], s[3]),
        _nt_term_text(p[1], p[0], p[2], p[3]),
        _nt_term_text(o[1], o[0], o[2], o[3]),
    )
    return (text, KIND_QUOTED, None, None)


_node = _node()  # materialize composite for reuse above


@st.composite
def statement_rows(draw):
    """A TRIPLE_COLS-ordered row tuple."""
    s = draw(st.one_of(_node, _quoted()))
    p = (draw(_iri), KIND_IRI, None, None)
    o = draw(st.one_of(_node, _literal(), _quoted()))
    if draw(st.booleans()):
        g_val, g_kind = draw(_node)[:2]
    else:
        g_val, g_kind = None, None
    return (s[0], s[1], p[0], p[1], o[0], o[1], o[2], o[3], g_val, g_kind)


# --------------------------------------------------------------- RDF binary


@settings(max_examples=200, deadline=None)
@given(st.lists(statement_rows(), min_size=1, max_size=8))
def test_rdfproto_roundtrip(rows):
    from cli_spark import rdfproto

    data = b"".join(rdfproto.encode_statement(r) for r in rows)
    assert rdfproto.parse_stream(data) == rows


@settings(max_examples=200, deadline=None)
@given(st.lists(statement_rows(), min_size=1, max_size=8))
def test_rdfthrift_roundtrip(rows):
    from cli_spark import rdfthrift

    data = b"".join(rdfthrift.encode_statement(r) for r in rows)
    assert rdfthrift.parse_stream(data) == rows


# --------------------------------------------------------------- escaping


@settings(max_examples=300, deadline=None)
@given(_lex)
def test_nt_escape_unescape_inverse(s):
    assert _unescape_py(_escape_nt_py(s)) == s


# --------------------------------------------------------------- media


_img = st.tuples(
    st.integers(1, 8), st.integers(1, 8), st.integers(0, 2**32 - 1)
).map(
    lambda t: np.random.default_rng(t[2]).integers(
        0, 256, size=(t[0], t[1], 3), dtype=np.uint8
    )
)


@settings(max_examples=60, deadline=None)
@given(_img)
def test_media_image_codecs_roundtrip(img):
    from cli_spark.ops import media_codecs as mc

    assert np.array_equal(mc.decode_png(mc.encode_png(img)), img)
    assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)
    assert np.array_equal(mc.decode_ppm(mc.encode_ppm(img)), img)
    rs = mc.resize_nearest(img, 3, 2)
    assert rs.shape == (2, 3, 3)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 64), st.integers(0, 2**32 - 1))
def test_media_wav_roundtrip(n, seed):
    from cli_spark.ops import media_codecs as mc

    pcm = (
        np.random.default_rng(seed)
        .integers(-32768, 32768, size=n)
        .astype(np.int16)
    )
    sr, back = mc.decode_wav(mc.encode_wav(pcm, sample_rate=8000))
    assert sr == 8000 and np.array_equal(back, pcm)


# ------------------------------------------------- parser cross-validation


@settings(max_examples=200, deadline=None)
@given(statement_rows())
def test_turtle_and_nquads_parsers_agree(row):
    """Canonical N-Triples is valid Turtle: the recursive-descent Turtle
    parser and the N-Quads Python tokenizer must produce the identical
    term-model row from the same line — two independent implementations
    cross-checking each other over randomized terms."""
    from cli_spark.nquads import _classify_py, _tokenize_terms_py
    from cli_spark.turtle import parse_turtle_document

    s, sk, p, pk, o, ok, odt, olang, g, gk = row
    line = "{} {} {} .".format(
        _nt_term_text(sk, s, None, None),
        _nt_term_text(pk, p, None, None),
        _nt_term_text(ok, o, odt, olang),
    )
    toks = _tokenize_terms_py(line)
    assert len(toks) == 3
    nq = []
    for t in toks:
        v, k, dt, lang = _classify_py(t)
        nq.append((v, k, dt, lang))
    ttl_rows = parse_turtle_document(line)
    assert len(ttl_rows) == 1
    r = ttl_rows[0]
    ttl = [(r[0], r[1], None, None), (r[2], r[3], None, None), (r[4], r[5], r[6], r[7])]
    assert ttl == nq


# --------------------------------------------------------- jelly frame rows


_jw_name = st.text(min_size=0, max_size=12).filter(lambda s: "\x00" not in s)
_jw_id = st.integers(0, 2**20)


@st.composite
def _jw_term(draw, depth=0, graph=False):
    """Normalized jellywire term dicts (the exact decode form), so the
    wire codec must be an identity on them."""
    choices = ["iri", "bnode", "literal"]
    if depth < 2 and not graph:
        choices.append("quoted")
    if graph:
        choices.append("default")
    kind = draw(st.sampled_from(choices))
    if kind == "iri":
        return {"k": 0, "pid": draw(_jw_id), "nid": draw(_jw_id)}
    if kind == "bnode":
        return {"k": 1, "v": draw(_jw_name)}
    if kind == "literal":
        style = draw(st.sampled_from(["plain", "lang", "dt"]))
        return {
            "k": 2,
            "v": draw(_jw_name),
            "lang": draw(_lang) if style == "lang" else None,
            "dt": draw(st.integers(1, 2**10)) if style == "dt" else 0,
        }
    if kind == "default":
        return {"k": 4}
    return {
        "k": 3,
        "s": draw(_jw_term(depth=depth + 1)),
        "p": draw(_jw_term(depth=depth + 1)),
        "o": draw(_jw_term(depth=depth + 1)),
    }


@st.composite
def _jelly_rows(draw):
    """Normalized jellywire row dicts across every wire row kind,
    including RDF-star nesting, elided statement terms, and the options
    row — encode_frame ∘ decode_frame must be the identity."""
    from cli_spark import jellywire as JW

    kind = draw(
        st.sampled_from(
            [JW.K_OPTIONS, JW.K_TRIPLE, JW.K_QUAD, JW.K_NAME, JW.K_DATATYPE,
             JW.K_PREFIX, JW.K_GRAPH_START, JW.K_GRAPH_END, JW.K_NAMESPACE]
        )
    )
    if kind == JW.K_OPTIONS:
        return {
            "kind": kind,
            "stream_name": draw(_jw_name),
            "physical": draw(st.integers(0, 3)),
            "generalized": draw(st.booleans()),
            "rdf_star": draw(st.booleans()),
            "logical": draw(st.integers(0, 4)),
            "version": draw(st.integers(0, 2)),
            "max_name": draw(st.integers(0, 2**20)),
            "max_prefix": draw(st.integers(0, 2**16)),
            "max_dt": draw(st.integers(0, 2**16)),
        }
    if kind in (JW.K_TRIPLE, JW.K_QUAD):
        row = {
            "kind": kind,
            "s": draw(st.one_of(st.none(), _jw_term())),
            "p": draw(st.one_of(st.none(), _jw_term())),
            "o": draw(st.one_of(st.none(), _jw_term())),
        }
        if kind == JW.K_QUAD:
            row["g"] = draw(st.one_of(st.none(), _jw_term(graph=True)))
        return row
    if kind in (JW.K_NAME, JW.K_DATATYPE, JW.K_PREFIX):
        return {"kind": kind, "id": draw(_jw_id), "value": draw(_jw_name)}
    if kind == JW.K_GRAPH_START:
        return {"kind": kind, "g": draw(_jw_term(graph=True))}
    if kind == JW.K_GRAPH_END:
        return {"kind": kind}
    return {
        "kind": kind,
        "name": draw(_jw_name),
        "iri": {"k": 0, "pid": draw(_jw_id), "nid": draw(_jw_id)},
    }


@settings(max_examples=200, deadline=None)
@given(st.lists(_jelly_rows(), min_size=1, max_size=12))
def test_jelly_frame_row_codec_roundtrip(rows):
    from cli_spark import jellywire as JW

    decoded = JW.decode_frame(JW.encode_frame(rows))
    assert decoded == rows

