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


@st.composite
def _jelly_rows(draw):
    """(encode-form row, expected decode-form row) pairs for every
    non-options wire row kind (options has its own validation matrix)."""
    from cli_spark import jelly as J

    vid = st.integers(0, 2**20)
    name = draw(_lex.filter(lambda s: "\x00" not in s))
    kind = draw(
        st.sampled_from(
            [J.KIND_TRIPLE, J.KIND_QUAD, J.KIND_NAME, J.KIND_DATATYPE,
             J.KIND_PREFIX, J.KIND_GRAPH_START, J.KIND_GRAPH_END,
             J.KIND_NAMESPACE]
        )
    )
    if kind in (J.KIND_TRIPLE, J.KIND_QUAD):
        enc = {
            "kind": kind,
            "s_id": draw(vid), "p_id": draw(vid), "o_id": draw(vid),
            "o_kind": draw(st.integers(0, 3)),
            "spg": draw(st.one_of(st.none(), st.integers(0, 7))),
            "dt_id": draw(st.one_of(st.none(), vid)),
            "lang": draw(st.one_of(st.none(), _lang)),
        }
        if kind == J.KIND_QUAD:
            enc["g_id"] = draw(st.one_of(st.none(), vid))
        exp = dict(enc)
        exp["spg"] = enc["spg"] or 0
        exp["dt_id"] = enc["dt_id"] or None
        if kind == J.KIND_QUAD:
            exp["g_id"] = enc["g_id"] or None
        return enc, exp
    if kind == J.KIND_NAME:
        enc = {
            "kind": kind, "name_id": draw(vid),
            "prefix_id": draw(st.one_of(st.none(), vid)), "name": name,
        }
        return enc, {**enc, "prefix_id": enc["prefix_id"] or None}
    if kind in (J.KIND_DATATYPE, J.KIND_PREFIX):
        enc = {"kind": kind, "name_id": draw(vid), "name": name}
        return enc, dict(enc)
    if kind == J.KIND_GRAPH_START:
        enc = {"kind": kind, "name_id": draw(vid)}
        return enc, dict(enc)
    if kind == J.KIND_GRAPH_END:
        return {"kind": kind}, {"kind": kind}
    enc = {"kind": kind, "name": name,
           "aux": draw(st.one_of(st.none(), _lex.filter(lambda s: "\x00" not in s)))}
    return enc, {**enc, "aux": enc["aux"] or ""}


@settings(max_examples=200, deadline=None)
@given(st.lists(_jelly_rows(), min_size=1, max_size=12))
def test_jelly_frame_row_codec_roundtrip(pairs):
    from cli_spark.jelly import decode_frame, encode_rows_to_frame

    enc_rows = [p[0] for p in pairs]
    expected = [p[1] for p in pairs]
    decoded = decode_frame(encode_rows_to_frame(enc_rows))
    assert decoded == expected
