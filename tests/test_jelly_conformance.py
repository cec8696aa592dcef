"""Byte-level Jelly protobuf conformance against the reference's own
golden fixtures (/root/reference/src/test/resources/*.jelly) — the
files the reference's specs decode with the real jelly-jvm library
(RdfInspectSpec.scala:205-254, RdfToJellySpec.scala:461-536,
RdfValidateSpec.scala:32-46). Pure-Python codec tests: no Spark.
"""

import os

import pytest

from cli_spark import jellywire as JW

FIX = "/root/reference/src/test/resources"

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(FIX), reason="reference fixtures not available"
)


def load(name):
    with open(os.path.join(FIX, name), "rb") as fh:
        return fh.read()


def resolved(name, strict=False):
    data = load(name)
    _, frames = JW.split_delimited(data)
    return list(JW.resolve_frames(frames, strict=strict))


def statements(rows):
    return [r for _, _, r in rows if r["kind"] in (JW.K_TRIPLE, JW.K_QUAD)]


@needs_fixtures
def test_options_jelly_decodes():
    """options.jelly: QUADS stream, declared table sizes 4000/150/32,
    logical FLAT_QUADS, version 1, one quad in the default graph built
    from three prefix+name table entries."""
    rows = resolved("options.jelly", strict=True)
    opts = [r for _, _, r in rows if r["kind"] == JW.K_OPTIONS]
    assert len(opts) == 1
    o = opts[0]
    assert o["physical"] == 2 and o["version"] == 1 and o["logical"] == 2
    assert (o["max_name"], o["max_prefix"], o["max_dt"]) == (4000, 150, 32)
    stmts = statements(rows)
    assert len(stmts) == 1
    q = stmts[0]
    assert q["s"] == ("http://example.org/resource/r1", JW.T_IRI, None, None)
    assert q["p"] == ("http://example.org/property/announcedAt", JW.T_IRI, None, None)
    assert q["o"] == ("http://example.org/location/l1", JW.T_IRI, None, None)
    assert q["g"][1] == JW.T_DEFAULT_GRAPH


@needs_fixtures
def test_options_nondelimited_autodetect():
    """optionsNonDelimited.jelly starts with the frame's own 0x0A row
    tag — the delimiting probe must classify it non-delimited and decode
    exactly one frame (JellyUtil.scala:24-40)."""
    data = load("optionsNonDelimited.jelly")
    delimited, frames = JW.split_delimited(data)
    assert not delimited and len(frames) == 1
    rows = list(JW.resolve_frames(frames, strict=True))
    o = [r for _, _, r in rows if r["kind"] == JW.K_OPTIONS][0]
    assert o["physical"] == 1 and o["generalized"] and o["rdf_star"]
    stmts = statements(rows)
    assert len(stmts) == 1
    assert stmts[0]["o"] == ("http://example.org/location/l1", JW.T_IRI, None, None)


@needs_fixtures
def test_first_empty_frame_and_id_reuse():
    """firstEmptyFrame.jelly: an empty frame precedes the options row
    (legal — RdfValidateSpec.scala:32-38); the stream then exercises
    implicit prev+1 name ids, explicit-id lookups, datatype entries,
    langtags, bnode subjects, AND name-id REUSE (entry id 4 is first
    '.../property/p2', later overwritten with '.../property/p4' — the
    bounded-table eviction contract)."""
    data = load("firstEmptyFrame.jelly")
    delimited, frames = JW.split_delimited(data)
    assert delimited and len(frames) == 4 and len(frames[0]) == 0
    rows = list(JW.resolve_frames(frames, strict=True))
    stmts = statements(rows)
    assert len(stmts) == 6
    R = "http://example.org/resource/"
    P = "http://example.org/property/"
    # first triple: all three terms via implicit prev+1 name ids
    assert stmts[0]["s"] == (R + "r1", JW.T_IRI, None, None)
    assert stmts[0]["p"] == (P + "p1", JW.T_IRI, None, None)
    assert stmts[0]["o"] == (R + "r2", JW.T_IRI, None, None)
    # typed literal through the datatype table
    typed = [s for s in stmts if s["o"][1] == JW.T_LITERAL and s["o"][2]]
    assert typed and typed[0]["o"] == (
        "2000", JW.T_LITERAL, "http://www.w3.org/2001/XMLSchema#integer", None
    )
    # bnode subject appears
    assert any(s["s"][1] == JW.T_BNODE for s in stmts)
    # the LAST triple uses the REUSED name id 4 -> p4 (not the old p2)
    last = stmts[-1]
    assert last["p"] == (P + "p4", JW.T_IRI, None, None)
    assert last["o"] == ("String", JW.T_LITERAL, None, "en")


@needs_fixtures
def test_three_first_empty_frames():
    """Despite the name, the on-disk fixture is a single delimited frame
    (the reference's spec only asserts `rdf validate` accepts the file —
    RdfValidateSpec.scala:40-46); it must decode cleanly end-to-end."""
    data = load("threeFirstEmptyFrames.jelly")
    delimited, frames = JW.split_delimited(data)
    assert delimited
    rows = list(JW.resolve_frames(frames, strict=True))
    stmts = statements(rows)
    assert len(stmts) == 6
    assert all(s["kind"] == JW.K_TRIPLE for s in stmts)


@needs_fixtures
def test_everything_triple_all_term_kinds():
    """everythingTriple.jelly: the reference's kitchen-sink TRIPLES
    fixture — every node kind in every position (the RdfInspectSpec
    'complex jelly file (triples)' expectation: iri/bnode/literal/
    triple_term counts > 0 for each of subject/predicate/object, and no
    graph terms at all)."""
    rows = resolved("everythingTriple.jelly", strict=True)
    o = [r for _, _, r in rows if r["kind"] == JW.K_OPTIONS][0]
    assert o["physical"] == 1 and o["generalized"] and o["rdf_star"]
    assert (o["max_name"], o["max_prefix"], o["max_dt"]) == (16, 6, 3)
    stmts = statements(rows)
    assert all(s["kind"] == JW.K_TRIPLE for s in stmts)
    for pos in ("s", "p", "o"):
        kinds = {s[pos][1] for s in stmts}
        assert {JW.T_IRI, JW.T_BNODE, JW.T_LITERAL, JW.T_QUOTED} <= kinds, (
            pos, kinds
        )
    assert all("g" not in s for s in stmts)
    # quoted triples render as N-Triples-star source and can nest
    quoted = [s[pos][0] for s in stmts for pos in ("s", "p", "o") if s[pos][1] == JW.T_QUOTED]
    assert all(q.startswith("<< ") and q.endswith(" >>") for q in quoted)
    assert any(q.count("<<") >= 2 for q in quoted)  # nested quoting present


@needs_fixtures
def test_everything_quad_graph_kinds():
    """everythingQuad.jelly: every node kind in every position AND every
    graph-node kind (iri/bnode/literal/default_graph) — the
    RdfInspectSpec 'complex jelly file (quads)' expectation."""
    rows = resolved("everythingQuad.jelly", strict=True)
    o = [r for _, _, r in rows if r["kind"] == JW.K_OPTIONS][0]
    assert o["physical"] == 2
    stmts = statements(rows)
    assert all(s["kind"] == JW.K_QUAD for s in stmts)
    for pos in ("s", "p", "o"):
        kinds = {s[pos][1] for s in stmts}
        assert {JW.T_IRI, JW.T_BNODE, JW.T_LITERAL, JW.T_QUOTED} <= kinds
    gkinds = {s["g"][1] for s in stmts}
    assert {JW.T_IRI, JW.T_BNODE, JW.T_LITERAL, JW.T_DEFAULT_GRAPH} <= gkinds
    # langtag + datatype literals survive in the graph position's stream
    assert any(s["g"][1] == JW.T_LITERAL and s["g"][3] for s in stmts)
    # triple-depth nesting (<< << << ... >> >> >>) resolves
    quoted = [
        s[pos][0] for s in stmts for pos in ("s", "p", "o") if s[pos][1] == JW.T_QUOTED
    ]
    assert any(q.count("<<") >= 3 for q in quoted)


@needs_fixtures
@pytest.mark.parametrize(
    "name",
    [
        "options.jelly",
        "optionsNonDelimited.jelly",
        "firstEmptyFrame.jelly",
        "threeFirstEmptyFrames.jelly",
        "everythingTriple.jelly",
        "everythingQuad.jelly",
    ],
)
def test_reencode_semantic_identity(name):
    """codec closure on REAL foreign bytes: decode each fixture's raw
    rows, re-encode them with our writer, decode again — the raw row
    streams and the fully-resolved statements must be identical. This
    proves the writer emits the same schema the reference's library
    wrote, not merely something our own reader accepts."""
    data = load(name)
    _, frames = JW.split_delimited(data)
    raw1 = [JW.decode_frame(f) for f in frames]
    reenc = [JW.encode_frame(rows) for rows in raw1]
    raw2 = [JW.decode_frame(f) for f in reenc]
    assert raw1 == raw2
    res1 = list(JW.resolve_frames(frames))
    res2 = list(JW.resolve_frames(reenc))
    assert res1 == res2
    # and the delimited file container round-trips
    delim, again = JW.split_delimited(JW.write_delimited(reenc))
    assert delim and [JW.decode_frame(f) for f in again] == raw1


def test_strict_mode_table_bounds():
    """StreamState(strict=True) enforces the declared table sizes (the
    P8 bound contract): an entry id past max_name_table_size raises."""
    rows = [
        {"kind": JW.K_OPTIONS, "physical": 1, "version": 1, "max_name": 4},
        {"kind": JW.K_NAME, "id": 5, "value": "http://e/x"},
    ]
    frames = [JW.encode_frame(rows)]
    with pytest.raises(JW.StreamError, match="exceeds declared table size"):
        list(JW.resolve_frames(frames, strict=True))
    # non-strict decodes fine (lenient reader, like jelly-jvm's default)
    out = list(JW.resolve_frames(frames, strict=False))
    assert out[-1][2]["id"] == 5


def test_unsupported_version_rejected_pure():
    frames = [
        JW.encode_frame(
            [{"kind": JW.K_OPTIONS, "physical": 1, "version": 3, "max_name": 8}]
        )
    ]
    with pytest.raises(JW.StreamError, match="unsupported stream version"):
        list(JW.resolve_frames(frames))


@needs_fixtures
@pytest.mark.parametrize("name", [
    "everythingTriple.jelly", "everythingQuad.jelly",
    "options.jelly", "firstEmptyFrame.jelly",
])
def test_peek_options_matches_full_decode(name):
    """The tag-peek scanner returns exactly the options rows a full
    frame decode yields — on every upstream golden fixture."""
    _, frames = JW.split_delimited(load(name))
    for blob in frames:
        full = [r for r in JW.decode_frame(blob) if r["kind"] == JW.K_OPTIONS]
        assert JW.peek_options(blob) == full


def test_peek_options_skips_statements_without_parsing():
    """A frame whose statement bodies are not even valid messages still
    peeks (only tags are read outside options rows)."""
    opts = JW.encode_row({
        "kind": JW.K_OPTIONS, "stream_name": "", "physical": 2,
        "generalized": False, "rdf_star": False, "logical": 2,
        "version": 1, "max_name": 16, "max_prefix": 8, "max_dt": 8,
    })
    # a syntactically framed row whose BODY is garbage: kind tag for
    # K_TRIPLE, length 3, then bytes that are not a valid RdfTriple
    bogus_body = b"\xff\xff\xff"
    bogus = bytes([JW.K_TRIPLE << 3 | 2, len(bogus_body)]) + bogus_body
    import io

    frame = io.BytesIO()
    for rowmsg in (opts, bogus):
        frame.write(bytes([1 << 3 | 2]))
        JW.write_varint(frame, len(rowmsg))
        frame.write(rowmsg)
    got = JW.peek_options(frame.getvalue())
    assert len(got) == 1 and got[0]["physical"] == 2
    # the full decoder would choke on the same frame
    with pytest.raises(Exception):
        JW.decode_frame(frame.getvalue())
