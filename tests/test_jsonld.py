"""Flat expanded JSON-LD reader + writer (S4, RdfFormat.scala:90-96):
document parsing (value objects, node refs, lists, named graphs, typed
@context error), columnar render ∘ parse identity, single-file sink."""

from __future__ import annotations

import json

import pytest

from cli_spark import jsonld as JL
from cli_spark.nquads import KIND_BNODE, KIND_IRI, KIND_LITERAL
from cli_spark.turtle import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, XSD

DOC = [
    {
        "@id": "http://e.org/alice",
        "@type": ["http://e.org/Person"],
        "http://e.org/name": [{"@value": "Alice"}],
        "http://e.org/age": [{"@value": 30}],
        "http://e.org/score": [{"@value": 4.5}],
        "http://e.org/active": [{"@value": True}],
        "http://e.org/knows": [{"@id": "_:b1"}, {"@id": "http://e.org/bob"}],
        "http://e.org/motto": [{"@value": "hi", "@language": "en"}],
    },
    {"@id": "_:b1", "http://e.org/name": [{"@value": "Bob"}]},
    {
        "@id": "http://e.org/g1",
        "@graph": [
            {
                "@id": "http://e.org/s",
                "http://e.org/p": [
                    {"@value": "1.5", "@type": XSD + "decimal"}
                ],
            }
        ],
    },
    {"http://e.org/anon": [{"http://e.org/inner": [{"@value": "deep"}]}]},
    {
        "@id": "http://e.org/l",
        "http://e.org/list": [{"@list": [{"@value": 1}, {"@id": "http://e.org/x"}]}],
    },
]


def test_parse_expanded_document():
    rows = JL.parse_jsonld_document(json.dumps(DOC))
    by_pred = {}
    for r in rows:
        by_pred.setdefault(r[2], []).append(r)
    assert by_pred[RDF_TYPE][0][4] == "http://e.org/Person"
    age = by_pred["http://e.org/age"][0]
    assert age[4] == "30" and age[6] == XSD + "integer"
    score = by_pred["http://e.org/score"][0]
    assert score[6] == XSD + "double"
    active = by_pred["http://e.org/active"][0]
    assert active[4] == "true" and active[6] == XSD + "boolean"
    knows = {(r[4], r[5]) for r in by_pred["http://e.org/knows"]}
    assert knows == {("b1", KIND_BNODE), ("http://e.org/bob", KIND_IRI)}
    motto = by_pred["http://e.org/motto"][0]
    assert motto[7] == "en" and motto[5] == KIND_LITERAL
    # named graph scoping
    p = by_pred["http://e.org/p"][0]
    assert p[8] == "http://e.org/g1" and p[9] == KIND_IRI
    # nested anonymous node
    inner = by_pred["http://e.org/inner"][0]
    anon = by_pred["http://e.org/anon"][0]
    assert anon[5] == KIND_BNODE and anon[4] == inner[0]
    # @list chain
    head = by_pred["http://e.org/list"][0]
    firsts = {r[0]: r for r in by_pred.get(RDF_FIRST, [])}
    rests = {r[0]: r for r in by_pred.get(RDF_REST, [])}
    n1 = head[4]
    assert firsts[n1][4] == "1"
    n2 = rests[n1][4]
    assert firsts[n2][4] == "http://e.org/x"
    assert rests[n2][4] == RDF_NIL


def test_context_handled_inline_or_rejected():
    """Inline contexts now expand (empty context = no-op); only REMOTE
    contexts keep the typed rejection."""
    assert JL.parse_jsonld_document('{"@context": {}, "@graph": []}') == []
    with pytest.raises(JL.JsonLdUnsupportedError, match="remote @context"):
        JL.parse_jsonld_document('[{"@context": "http://x", "@id": "http://s"}]')


def test_ndjson_fallback():
    nd = '\n'.join(
        json.dumps(o) for o in [
            {"@id": "http://e.org/a", "http://e.org/p": [{"@value": "1"}]},
            {"@id": "http://e.org/b", "http://e.org/p": [{"@value": "2"}]},
        ]
    )
    rows = JL.parse_jsonld_document(nd)
    assert {r[0] for r in rows} == {"http://e.org/a", "http://e.org/b"}


def test_render_parse_identity(spark):
    rows = JL.parse_jsonld_document(json.dumps(DOC[:3]))
    schema = (
        "subj string, subj_kind int, pred string, pred_kind int, "
        "obj string, obj_kind int, obj_datatype string, obj_lang string, "
        "graph string, graph_kind int"
    )
    df = spark.createDataFrame(rows, schema)
    back = JL.parse_jsonld_lines(JL.render_jsonld(df))
    key = lambda t: (t[0], t[1], t[2], t[4], t[5], t[6], t[7], t[8])  # noqa: E731
    assert {key(tuple(r)) for r in back.collect()} == {key(t) for t in rows}


def test_single_file_sink_is_valid_json(spark, tmp_path):
    rows = JL.parse_jsonld_document(json.dumps(DOC[:2]))
    schema = (
        "subj string, subj_kind int, pred string, pred_kind int, "
        "obj string, obj_kind int, obj_datatype string, obj_lang string, "
        "graph string, graph_kind int"
    )
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "out.jsonld")
    JL.write_jsonld(df, out, single_file=True)
    import glob

    text = open(glob.glob(out + "/part-*")[0]).read()
    doc = json.loads(text)
    assert isinstance(doc, list) and len(doc) == 2


def test_format_registry_resolution():
    from cli_spark.formats import resolve

    spec = resolve("data.jsonld")
    assert spec.key == "jsonld" and spec.read is not None
    spec2 = resolve("x", explicit="json-ld")
    assert spec2.key == "jsonld"


def test_jsonld_rejects_quoted_triples(spark):
    """Flat expanded JSON-LD has no RDF-star encoding — the writer fails
    typed instead of emitting an @id holding '<< ... >>' source text."""
    import pytest

    from cli_spark.jsonld import render_jsonld
    from cli_spark.nquads import KIND_IRI, KIND_QUOTED

    df = spark.createDataFrame(
        [("http://e.org/d", KIND_IRI, "http://e.org/claims",
          '<< <http://e.org/a> <http://e.org/p> "v" >>', KIND_QUOTED, None, None, None)],
        "subj string, subj_kind int, pred string, obj string, obj_kind int, "
        "obj_datatype string, obj_lang string, graph string",
    )
    with pytest.raises(Exception, match="quoted triples"):
        render_jsonld(df).collect()


def test_context_expansion_full_subset():
    """Inline @context: @vocab, @base, prefix terms, term aliases for
    keywords, @type coercion (@id + datatype), per-term and default
    @language, @container @list, compact term-ids expanding through
    prefixes, and nested-node context inheritance."""
    from cli_spark.jsonld import parse_jsonld_document

    doc = """
    {
      "@context": {
        "@vocab": "http://vocab.org/",
        "@base": "http://base.org/",
        "ex": "http://example.org/",
        "name": "ex:name",
        "knows": {"@id": "ex:knows", "@type": "@id"},
        "born": {"@id": "ex:born",
                 "@type": "http://www.w3.org/2001/XMLSchema#date"},
        "label": {"@id": "ex:label", "@language": "en"},
        "tags": {"@id": "ex:tag", "@container": "@list"},
        "id": "@id", "type": "@type"
      },
      "id": "people/alice",
      "type": "ex:Person",
      "name": "Alice",
      "knows": {"id": "people/bob", "name": "Bob"},
      "born": "1990-01-02",
      "label": "the alice",
      "plain": "vocab term",
      "tags": ["a", "b"]
    }"""
    rows = parse_jsonld_document(doc)
    by_pred = {}
    for r in rows:
        by_pred.setdefault(r[2], []).append(r)
    alice = "http://base.org/people/alice"
    assert by_pred["http://example.org/name"][0][:2] == (alice, 0)
    # knows: nested node, context inherited, @base applied
    knows = [r for r in by_pred["http://example.org/knows"] if r[0] == alice]
    assert knows[0][4] == "http://base.org/people/bob" and knows[0][5] == 0
    # datatype coercion
    born = by_pred["http://example.org/born"][0]
    assert born[4:8] == (
        "1990-01-02", 2, "http://www.w3.org/2001/XMLSchema#date", None
    )
    # per-term language
    label = by_pred["http://example.org/label"][0]
    assert label[4:8] == ("the alice", 2, None, "en")
    # @vocab fallback for undeclared terms
    assert "http://vocab.org/plain" in by_pred
    # @type alias + compact type value
    types = by_pred["http://www.w3.org/1999/02/22-rdf-syntax-ns#type"]
    assert any(r[4] == "http://example.org/Person" for r in types)
    # @container @list produced an rdf:first/rdf:rest chain
    firsts = by_pred["http://www.w3.org/1999/02/22-rdf-syntax-ns#first"]
    assert {r[4] for r in firsts} == {"a", "b"}


def test_reverse_node_map_and_reverse_term():
    """@reverse (JSON-LD 1.0 §6.12): node-level reverse maps and
    reverse term definitions both emit object→subject triples; literal
    values under @reverse are a typed error."""
    from cli_spark.jsonld import JsonLdUnsupportedError, parse_jsonld_document

    doc = """
    {
      "@context": {
        "ex": "http://example.org/",
        "parentOf": {"@reverse": "ex:childOf"}
      },
      "@id": "ex:alice",
      "@reverse": {"ex:knows": [{"@id": "ex:bob"},
                                {"@id": "ex:carol",
                                 "ex:name": "Carol"}]},
      "parentOf": {"@id": "ex:dan"}
    }"""
    rows = parse_jsonld_document(doc)
    triples = {(r[0], r[2], r[4]) for r in rows}
    # node-level reverse: bob/carol point AT alice
    assert ("http://example.org/bob", "http://example.org/knows",
            "http://example.org/alice") in triples
    assert ("http://example.org/carol", "http://example.org/knows",
            "http://example.org/alice") in triples
    # the nested node's own forward triple still emits
    assert ("http://example.org/carol", "http://example.org/name",
            "Carol") in triples
    # reverse term definition: dan childOf alice
    assert ("http://example.org/dan", "http://example.org/childOf",
            "http://example.org/alice") in triples
    # no forward triples in the reverse direction
    assert not any(s == "http://example.org/alice" and "knows" in p
                   for s, p, _ in triples)
    with pytest.raises(JsonLdUnsupportedError, match="@reverse values"):
        parse_jsonld_document(
            '{"@id": "http://e/x", "@reverse":'
            ' {"http://e/p": [{"@value": "lit"}]}}'
        )


def test_index_container_and_scoped_context():
    """@index containers flatten (keys are non-semantic, §6.16);
    a JSON-LD 1.1 property-scoped context applies to that term's
    values only."""
    from cli_spark.jsonld import parse_jsonld_document

    doc = """
    {
      "@context": {
        "ex": "http://example.org/",
        "post": {"@id": "ex:post", "@container": "@index"},
        "friend": {"@id": "ex:friend",
                   "@context": {"nick": "ex:nickname"}}
      },
      "@id": "ex:alice",
      "post": {"en": "hello", "de": ["hallo", "servus"]},
      "friend": {"@id": "ex:bob", "nick": "Bobby"},
      "nick": "dropped-no-vocab"
    }"""
    rows = parse_jsonld_document(doc)
    triples = {(r[0], r[2], r[4]) for r in rows}
    posts = {o for s, p, o in triples
             if p == "http://example.org/post"}
    assert posts == {"hello", "hallo", "servus"}
    # scoped context maps nick only inside friend's values
    assert ("http://example.org/bob", "http://example.org/nickname",
            "Bobby") in triples
    # outside the scoped term, "nick" has no mapping (and no @vocab)
    assert not any(o == "dropped-no-vocab" for _, _, o in triples)


def test_context_remote_rejected_and_passthrough():
    import pytest

    from cli_spark.jsonld import JsonLdUnsupportedError, parse_jsonld_document

    with pytest.raises(JsonLdUnsupportedError, match="remote @context"):
        parse_jsonld_document('{"@context": "http://schema.org/", "@id": "x"}')
    # expanded documents without @context are untouched (regression)
    rows = parse_jsonld_document(
        '[{"@id": "http://e/x", "http://e/p": [{"@value": "v"}]}]'
    )
    assert rows[0][:6] == ("http://e/x", 0, "http://e/p", 0, "v", 2)


def test_context_roundtrip_through_writer(spark, tmp_path):
    """compact read → columnar write (expanded NDJSON) → read = same
    triples: the context layer composes with the existing S4 machinery."""
    from cli_spark.jsonld import parse_jsonld_document, read_jsonld, write_jsonld

    doc = """
    {
      "@context": {"ex": "http://example.org/",
                   "knows": {"@id": "ex:knows", "@type": "@id"}},
      "@id": "http://e/alice",
      "ex:name": "Alice",
      "knows": "http://e/bob"
    }"""
    p = tmp_path / "compact.jsonld"
    p.write_text(doc)
    df = read_jsonld(spark, str(p))
    out = str(tmp_path / "expanded.jsonld")
    write_jsonld(df, out, single_file=True)
    back = read_jsonld(spark, out)
    key = ["subj", "pred", "obj", "obj_kind"]
    assert {tuple(r) for r in back.select(*key).collect()} == {
        tuple(r) for r in df.select(*key).collect()
    }


def test_compact_on_write_roundtrip(spark, tmp_path):
    """compact-on-write: keys/@type/@id compact through the caller's
    context (exact term > longest prefix > @vocab), every line embeds
    the context, and reading the compacted output back yields exactly
    the triples of the expanded write. Guard rules: coercing/container
    terms never become bare keys; bnodes never compact."""
    from cli_spark.jsonld import read_jsonld, render_jsonld, write_jsonld

    rows = [
        # (subj, sk, pred, pk, obj, ok, odt, olang, graph, gk)
        ("http://v/alice", 0, "http://v/name", 0, "Alice", 2, None, None, None, None),
        ("http://v/alice", 0, "http://ex/knows", 0, "_:b1", 1, None, None, None, None),
        ("_:b1", 1, "http://v/age", 0, "30", 2,
         "http://www.w3.org/2001/XMLSchema#integer", None, None, None),
        ("http://v/alice", 0, "http://lists.example/rel", 0, "hi", 2, None, "en",
         "http://ex/g1", 0),
        # IRI exactly equal to a term's id → exact-term key compaction
        ("http://v/alice", 0, "http://ex/name", 0, "http://ex/obj1", 0,
         None, None, None, None),
    ]
    schema = (
        "subj string, subj_kind int, pred string, pred_kind int, "
        "obj string, obj_kind int, obj_datatype string, obj_lang string, "
        "graph string, graph_kind int"
    )
    df = spark.createDataFrame(rows, schema)
    context = {
        "@vocab": "http://v/",
        "ex": "http://ex/",
        "name": "http://ex/name",
        "xsd": "http://www.w3.org/2001/XMLSchema#",
        "lst": {"@id": "http://lists.example/", "@container": "@list"},
    }
    lines = [r.line for r in render_jsonld(df, context=context).collect()]
    text = "\n".join(lines)
    assert all(l.startswith('{"@context":') for l in lines)
    assert '"name":' in text            # exact term beats prefix ex:name
    assert '"ex:knows":' in text        # prefix compaction on keys
    assert '"xsd:integer"' in text      # prefix compaction on @type
    assert '"@id":"ex:g1"' in text      # prefix compaction on graph @id
    assert '"lst:rel":' in text         # container term usable as PREFIX only
    assert '"age":' in text             # @vocab bare-suffix key
    assert '"_:b1"' in text             # bnodes never compact
    # http://v/name must stay EXPANDED: bare "name" is shadowed by the
    # term (it would re-expand to http://ex/name) — the runtime guard
    assert '"http://v/name":' in text
    assert "http://ex/knows" not in text

    compact_out = str(tmp_path / "compact_out")
    write_jsonld(df, compact_out, context=context)
    expanded_out = str(tmp_path / "expanded_out")
    write_jsonld(df, expanded_out)
    key = ["subj", "subj_kind", "pred", "obj", "obj_kind",
           "obj_datatype", "obj_lang", "graph"]
    got = {tuple(r) for r in read_jsonld(spark, compact_out).select(*key).collect()}
    want = {tuple(r) for r in read_jsonld(spark, expanded_out).select(*key).collect()}
    assert got == want and len(got) == len(rows)
