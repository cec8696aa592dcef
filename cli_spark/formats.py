"""RDF format registry (SURVEY.md §2.1 S4; reference
RdfFormat.scala:48-105): one row per supported format with its CLI
names, extensions, capabilities, and reader/writer entry points.

All ten reference formats are implemented: N-Triples, N-Quads, Turtle
(incl. Turtle-star), TriG, Jelly binary, Jelly text (cli_spark.jelly),
JSON-LD flat expanded form (cli_spark.jsonld), RDF/XML subset
(cli_spark.rdfxml), RDF Protobuf (cli_spark.rdfproto), and RDF Thrift
compact protocol (cli_spark.rdfthrift) — each a from-scratch
Spark-first reader/writer, not a Jena delegation."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable


@dataclass(frozen=True)
class RdfFormatSpec:
    key: str
    full_name: str
    cli_options: tuple[str, ...]
    extensions: tuple[str, ...]
    supports_quads: bool
    supports_base_iri: bool
    supports_generalized: bool
    read: Callable | None = field(default=None, compare=False)
    write: Callable | None = field(default=None, compare=False)


def _read_nt(spark, path, base=None):
    from .nquads import read_nquads

    if base is not None:
        raise ValueError("N-Triples/N-Quads do not support --base (S8)")
    return read_nquads(spark, path)


def _write_nt(df, path, single_file=False):
    from .nquads import write_nquads

    write_nquads(df, path, single_file=single_file)


def _read_ttl(spark, path, base=None, resolve_iris=True):
    from .turtle import read_turtle

    return read_turtle(spark, path, base=base, resolve_iris=resolve_iris)


def _write_ttl(df, path, single_file=False, prefixes=None):
    from .turtle import write_turtle

    write_turtle(df, path, single_file=single_file, prefixes=prefixes)


def _read_jsonld(spark, path, base=None):
    from .jsonld import read_jsonld

    if base is not None:
        raise ValueError("expanded JSON-LD carries absolute IRIs; --base unused")
    return read_jsonld(spark, path)


def _write_jsonld(df, path, single_file=False, context=None,
                  per_frame=False, frame_ids=None):
    from .jsonld import write_jsonld

    write_jsonld(df, path, single_file=single_file, context=context,
                 per_frame=per_frame, frame_ids=frame_ids)


def _read_rdfxml(spark, path, base=None):
    from .rdfxml import read_rdfxml

    return read_rdfxml(spark, path, base=base)


def _write_rdfxml(df, path, single_file=False, per_frame=False,
                  frame_ids=None):
    from .rdfxml import write_rdfxml

    write_rdfxml(df, path, single_file=single_file, per_frame=per_frame,
                 frame_ids=frame_ids)


def _read_rdfproto(spark, path, base=None):
    from .rdfproto import read_rdfproto

    if base is not None:
        raise ValueError("RDF Protobuf carries absolute IRIs; --base unused")
    return read_rdfproto(spark, path)


def _write_rdfproto(df, path, single_file=False):
    from .rdfproto import write_rdfproto

    write_rdfproto(df, path, single_file=single_file)


def _read_rdfthrift(spark, path, base=None):
    from .rdfthrift import read_rdfthrift

    if base is not None:
        raise ValueError("RDF Thrift carries absolute IRIs; --base unused")
    return read_rdfthrift(spark, path)


def _write_rdfthrift(df, path, single_file=False):
    from .rdfthrift import write_rdfthrift

    write_rdfthrift(df, path, single_file=single_file)


REGISTRY: dict[str, RdfFormatSpec] = {
    f.key: f
    for f in [
        RdfFormatSpec(
            "nt", "N-Triples", ("nt", "ntriples"), (".nt",),
            supports_quads=False, supports_base_iri=False,
            supports_generalized=True, read=_read_nt, write=_write_nt,
        ),
        RdfFormatSpec(
            "nq", "N-Quads", ("nq", "nquads"), (".nq", ".nquads"),
            supports_quads=True, supports_base_iri=False,
            supports_generalized=True, read=_read_nt, write=_write_nt,
        ),
        RdfFormatSpec(
            "ttl", "Turtle", ("ttl", "turtle"), (".ttl",),
            supports_quads=False, supports_base_iri=True,
            supports_generalized=False, read=_read_ttl, write=_write_ttl,
        ),
        RdfFormatSpec(
            "trig", "TriG", ("trig",), (".trig",),
            supports_quads=True, supports_base_iri=True,
            supports_generalized=False, read=_read_ttl, write=_write_ttl,
        ),
        RdfFormatSpec(
            "jelly", "Jelly binary", ("jelly",), (".jelly",),
            supports_quads=True, supports_base_iri=False,
            supports_generalized=True,
        ),
        RdfFormatSpec(
            "jelly-text", "Jelly text", ("jelly-text", "jellyt"), (".jelly.txt",),
            supports_quads=True, supports_base_iri=False,
            supports_generalized=True,
        ),
        RdfFormatSpec(
            "rdfxml", "RDF/XML", ("rdfxml", "rdf-xml"), (".rdf", ".xml"),
            supports_quads=False, supports_base_iri=True,
            supports_generalized=False,
            read=_read_rdfxml, write=_write_rdfxml,
        ),
        RdfFormatSpec(
            "jsonld", "JSON-LD", ("jsonld", "json-ld"), (".jsonld",),
            supports_quads=True, supports_base_iri=True,
            supports_generalized=False,
            read=_read_jsonld, write=_write_jsonld,
        ),
        # reference: cli/command/rdf/util/RdfFormat.scala:69-88 — Jena's
        # binary formats; it infers generalizedStatements=true for them
        # (RdfJellySerializationOptions.scala:60-67). Registered so
        # resolve() names them in errors instead of "unknown format".
        RdfFormatSpec(
            "jenaproto", "RDF Protobuf", ("jenaproto", "jena-proto"), (".rpb",),
            supports_quads=True, supports_base_iri=False,
            supports_generalized=True,
            read=_read_rdfproto, write=_write_rdfproto,
        ),
        RdfFormatSpec(
            "jenathrift", "RDF Thrift", ("jenathrift", "jena-thrift"), (".rt", ".trdf"),
            supports_quads=True, supports_base_iri=False,
            supports_generalized=True,
            read=_read_rdfthrift, write=_write_rdfthrift,
        ),
    ]
}


def resolve(name_or_path: str, explicit: str | None = None) -> RdfFormatSpec:
    """Format lookup: explicit CLI option wins; else longest matching
    file extension (mirrors the reference's option-then-inference
    order)."""
    if explicit is not None:
        for f in REGISTRY.values():
            if explicit in f.cli_options or explicit == f.key:
                return f
        raise ValueError(
            f"unknown format {explicit!r}; known: "
            + ", ".join(sorted(REGISTRY))
        )
    best = None
    for f in REGISTRY.values():
        for ext in f.extensions:
            if name_or_path.endswith(ext) and (best is None or len(ext) > best[0]):
                best = (len(ext), f)
    if best is None:
        raise ValueError(
            f"cannot infer RDF format from {name_or_path!r}; pass an "
            f"explicit format ({', '.join(sorted(REGISTRY))})"
        )
    return best[1]
