"""Self-interop fixture pinning for the RDF-protobuf / RDF-Thrift
wires (VERDICT r4 'missing' #3): golden files generated once by the
current encoders are checked in, and every future version must
(a) re-encode the battery to the identical bytes and (b) decode the
golden bytes to the identical statements — so a refactor can't
silently fork either wire (the same discipline the Jelly codec gets
from the reference's upstream fixtures in test_jelly_conformance).

The battery covers the full term model: plain/typed/lang literals,
bnodes, IRIs, named + bnode graphs, nested RDF-star quoted triples,
generalized statements (literal subject, bnode predicate), escapes,
and non-ASCII text. No Spark session needed — pure-Python codecs.
"""

from __future__ import annotations

import os

from cli_spark import rdfproto as RP
from cli_spark import rdfthrift as RT
from cli_spark.nquads import KIND_BNODE, KIND_IRI, KIND_LITERAL, KIND_QUOTED

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
XSD = "http://www.w3.org/2001/XMLSchema#"

# The pinned battery. DO NOT edit rows without regenerating the golden
# files — that is a deliberate wire break and should look like one.
GOLDEN_ROWS = [
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
    ("b2", KIND_BNODE, "http://e/p5", KIND_IRI,
     "esc \\\\ \"q\" \n tab\t", KIND_LITERAL, None, None, "bg", KIND_BNODE),
    ("lit as subj", KIND_LITERAL, "b3", KIND_BNODE,
     "gen", KIND_LITERAL, None, None, None, None),
    ("http://e/u", KIND_IRI, "http://e/p6", KIND_IRI,
     "éü unicode \U0001F642", KIND_LITERAL, None, "fr", None, None),
]


def _golden(name: str) -> bytes:
    with open(os.path.join(FIXTURES, name), "rb") as fh:
        return fh.read()


def test_rdfproto_encode_byte_stable():
    assert RP.encode_batch(GOLDEN_ROWS) == _golden("golden.rdf_proto")


def test_rdfproto_decode_golden():
    assert RP.parse_stream(_golden("golden.rdf_proto")) == GOLDEN_ROWS


def test_rdfproto_per_statement_matches_batch():
    # the slow path and the memoized batch path stay byte-identical
    assert b"".join(
        RP.encode_statement(r) for r in GOLDEN_ROWS
    ) == _golden("golden.rdf_proto")


def test_rdfthrift_encode_byte_stable():
    assert RT.encode_batch(GOLDEN_ROWS) == _golden("golden.rdf_thrift")


def test_rdfthrift_decode_golden():
    assert RT.parse_stream(_golden("golden.rdf_thrift")) == GOLDEN_ROWS


def test_rdfthrift_per_statement_matches_batch():
    assert b"".join(
        RT.encode_statement(r) for r in GOLDEN_ROWS
    ) == _golden("golden.rdf_thrift")
