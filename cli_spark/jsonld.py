"""Flat expanded-form JSON-LD reader + writer (SURVEY.md §2.1 S4;
reference format registry RdfFormat.scala:90-96 — Jena's JSONLD,
`supportsQuads`, batch-writeable; format sweep RdfToJellySpec.scala:537-615).

Supported subset (documented descope — the reference delegates all
JSON-LD processing to Jena/Titanium): **expanded form** documents — a
top-level array of node objects (or an object with a top-level
``@graph``), node objects with ``@id`` / ``@type`` / full-IRI property
keys, value objects (``@value`` + ``@type``/``@language``), node
references (``@id``), ``@list`` arrays, nested node objects, and named
graphs (``@id`` + ``@graph``), and an inline ``@context`` subset
(term→IRI maps, compact IRIs, ``@vocab``/``@base``, ``@type``/
``@language`` coercion, ``@list``/``@set``/``@index`` containers,
``@reverse`` — node-level maps and reverse term definitions — and
JSON-LD 1.1 property-scoped contexts — see ``_Context``). NOT
supported: remote contexts (a string/URL ``@context`` raises a typed
error — no network I/O from executors) and JSON-LD 1.1 type-scoped
contexts.

Design for Spark's execution model:

- **Reader** is file-parallel (one task per document via ``binaryFile``
  + ``mapInPandas``), exactly like the Turtle reader: a JSON document
  is one parse unit; the 100 TB parallelism axis is the corpus of
  millions of documents. A newline-delimited variant (one node object
  per line — the shape this module's writer emits in distributed mode)
  parses line-parallel.
- **Writer** is fully columnar — zero Python in the row path. Value
  objects are null-sparse structs serialized by ``to_json`` (Spark
  drops null fields by default), per-subject property maps are
  ``map_from_entries(collect_list(...))``, and the node line is a
  string concat. Two hash aggregations ((graph,subj,pred) then
  (graph,subj)), no window, no driver collect in the distributed path.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .nquads import KIND_BNODE, KIND_IRI, KIND_LITERAL, KIND_QUOTED, TRIPLE_COLS
from .turtle import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, XSD

if TYPE_CHECKING:
    import pandas as pd


class JsonLdUnsupportedError(ValueError):
    """Typed error for documents outside the supported subset."""


def _as_list(v):
    return v if isinstance(v, list) else [v]


_KEYWORDS = {
    "@id", "@type", "@value", "@language", "@list", "@set", "@graph",
    "@context", "@vocab", "@base", "@container", "@reverse", "@index",
}


class _Context:
    """JSON-LD 1.0 ``@context`` subset: term→IRI maps, compact IRIs
    (``prefix:suffix``), ``@vocab``, ``@base``, default ``@language``,
    per-term ``@type`` coercion (``@id`` or a datatype IRI),
    ``@language`` overrides, ``@container: @list``/``@set``, and keyword
    aliases. Remote (string/URL) contexts raise a typed error — no
    network in an executor."""

    def __init__(self, data, parent: "_Context | None" = None):
        self.vocab = parent.vocab if parent else None
        self.base = parent.base if parent else None
        self.language = parent.language if parent else None
        self.terms: dict[str, dict] = dict(parent.terms) if parent else {}
        for layer in _as_list(data if data is not None else []):
            if layer is None:
                self.vocab = self.base = self.language = None
                self.terms = {}
                continue
            if isinstance(layer, str):
                raise JsonLdUnsupportedError(
                    "remote @context documents are not supported (no "
                    "network fetch in an executor) — inline the context "
                    "or expand the document first"
                )
            if not isinstance(layer, dict):
                raise JsonLdUnsupportedError(
                    f"unsupported @context entry: {layer!r}"
                )
            for k, v in layer.items():
                if k == "@vocab":
                    self.vocab = v
                elif k == "@base":
                    self.base = v
                elif k == "@language":
                    self.language = v
                elif k.startswith("@"):
                    raise JsonLdUnsupportedError(
                        f"unsupported @context keyword: {k}"
                    )
                elif isinstance(v, str):
                    self.terms[k] = {
                        "id": v, "type": None, "language": ..., "container": None,
                        "reverse": False, "context": None,
                    }
                elif isinstance(v, dict):
                    self.terms[k] = {
                        # {"term": {"@reverse": "iri"}}: term maps to a
                        # reverse property (values emit object→subject)
                        "id": v.get("@id", v.get("@reverse")),
                        "type": v.get("@type"),
                        "language": v.get("@language", ...),
                        "container": v.get("@container"),
                        "reverse": "@reverse" in v,
                        # JSON-LD 1.1 property-scoped context: applied
                        # while expanding this term's values
                        "context": v.get("@context"),
                    }
                elif v is None:
                    self.terms.pop(k, None)
                else:
                    raise JsonLdUnsupportedError(
                        f"unsupported term definition for {k!r}: {v!r}"
                    )

    def _term_id(self, term: str) -> str | None:
        d = self.terms.get(term)
        return d["id"] if d else None

    def expand_iri(
        self, value: str, vocab: bool = False, _seen: frozenset = frozenset()
    ) -> str | None:
        """term / compact IRI / relative IRI → absolute IRI (or keyword
        alias passthrough); None when not expandable. Term ids that are
        themselves terms or compact IRIs expand recursively (cycle-
        guarded)."""
        if not isinstance(value, str):
            return None
        if value.startswith("@") and value in _KEYWORDS:
            return value
        tid = self._term_id(value)
        if tid is not None and value not in _seen:
            if tid.startswith("@"):
                return tid  # keyword alias ("id": "@id")
            return (
                self.expand_iri(tid, _seen=_seen | {value})
                or self._absolute(tid)
            )
        if ":" in value:
            prefix, suffix = value.split(":", 1)
            if suffix.startswith("//"):
                return value  # absolute IRI with authority
            pid = self._term_id(prefix)
            if pid is not None and not pid.startswith("@") and prefix not in _seen:
                base = (
                    self.expand_iri(pid, _seen=_seen | {prefix}) or pid
                )
                return base + suffix
            return value  # absolute IRI with a scheme (kg:, urn:, ...)
        if vocab and self.vocab:
            return self.vocab + value
        return None

    def _absolute(self, iri: str) -> str:
        if ":" in iri or not self.base:
            return iri
        from urllib.parse import urljoin

        return urljoin(self.base, iri)

    def expand_id(self, value: str) -> str:
        if value.startswith("_:"):
            return value
        tid = self._term_id(value)
        if tid is not None and not tid.startswith("@"):
            return self.expand_iri(value) or self._absolute(tid)
        if ":" in value:
            expanded = self.expand_iri(value)
            return expanded if expanded else value
        return self._absolute(value)


def _expand_value(v, ctx: _Context, term_def: dict | None):
    """compact value → expanded value (value object / node object)."""
    if isinstance(v, dict):
        return _expand_obj(v, ctx)
    coerce = term_def.get("type") if term_def else None
    if isinstance(v, str):
        if coerce == "@id":
            return {"@id": ctx.expand_id(v)}
        if coerce:
            return {"@value": v, "@type": ctx.expand_iri(coerce, vocab=True)}
        lang = (
            term_def["language"]
            if term_def and term_def.get("language") is not ...
            else ctx.language
        )
        return {"@value": v, "@language": lang} if lang else v
    if coerce and not isinstance(v, (dict, list)) and coerce != "@id":
        return {"@value": v, "@type": ctx.expand_iri(coerce, vocab=True)}
    return v  # bare numbers / booleans keep native-type expansion


def _expand_obj(obj: dict, ctx: _Context) -> dict:
    """One compact node/value object → expanded form (context applied,
    @context keys stripped). Pure dict-to-dict, document-local."""
    if "@context" in obj:
        ctx = _Context(obj["@context"], parent=ctx)
    out: dict = {}
    for key, vals in obj.items():
        if key == "@context":
            continue
        expanded_key = ctx.expand_iri(key, vocab=True) if not key.startswith("@") else key
        if expanded_key is None:
            continue  # term with no IRI mapping and no @vocab: dropped
        if expanded_key == "@id":
            out["@id"] = ctx.expand_id(vals)
        elif expanded_key == "@type":
            if "@value" in obj or any(
                ctx.expand_iri(k, vocab=True) == "@value"
                for k in obj if not k.startswith("@")
            ):
                out["@type"] = ctx.expand_iri(vals, vocab=True)
            else:
                out["@type"] = [
                    ctx.expand_iri(t, vocab=True) or t for t in _as_list(vals)
                ]
        elif expanded_key in ("@value", "@language", "@index"):
            out[expanded_key] = vals
        elif expanded_key == "@list":
            out["@list"] = [_expand_value(x, ctx, None) for x in _as_list(vals)]
        elif expanded_key == "@graph":
            out["@graph"] = [_expand_obj(x, ctx) for x in _as_list(vals)]
        elif expanded_key == "@reverse":
            # node-level reverse map: {"@reverse": {prop: node(s)}} —
            # each value is a node object/reference whose triple points
            # BACK at this subject (JSON-LD 1.0 §6.12)
            if not isinstance(vals, dict):
                raise JsonLdUnsupportedError(
                    f"@reverse expects a map of properties, got: {vals!r}"
                )
            rev = out.setdefault("@reverse", {})
            for rk, rv in vals.items():
                riri = ctx.expand_iri(rk, vocab=True)
                if riri is None or riri.startswith("@"):
                    raise JsonLdUnsupportedError(
                        f"@reverse property must expand to an IRI: {rk!r}"
                    )
                rdef = ctx.terms.get(rk)
                rev.setdefault(riri, []).extend(
                    _expand_value(x, ctx, rdef) for x in _as_list(rv)
                )
        elif expanded_key.startswith("@"):
            raise JsonLdUnsupportedError(
                f"unsupported JSON-LD keyword: {expanded_key}"
            )
        else:
            term_def = ctx.terms.get(key)
            container = term_def.get("container") if term_def else None
            val_ctx = ctx
            if term_def and term_def.get("context") is not None:
                # JSON-LD 1.1 property-scoped context: in force for this
                # term's values only
                val_ctx = _Context(term_def["context"], parent=ctx)
            if (
                container == "@index"
                and isinstance(vals, dict)
                and not any(k.startswith("@") for k in vals)
            ):
                # index map: keys are organizational only — values
                # flatten into the property's array (index dropped from
                # the graph, JSON-LD 1.0 §6.16)
                vals = [x for v in vals.values() for x in _as_list(v)]
            flat = []
            for x in _as_list(vals):
                # {"@set": [...]} flattens into the property's array
                if isinstance(x, dict) and "@set" in x and set(x) <= {"@set"}:
                    flat.extend(_as_list(x["@set"]))
                else:
                    flat.append(x)
            # null values drop the property (JSON-LD expansion: "if
            # value is null, continue")
            items = [
                _expand_value(x, val_ctx, term_def)
                for x in flat
                if x is not None
            ]
            if not items and flat:
                continue
            if container == "@list" and not (
                len(items) == 1 and isinstance(items[0], dict) and "@list" in items[0]
            ):
                items = [{"@list": items}]
            if term_def and term_def.get("reverse"):
                rev = out.setdefault("@reverse", {})
                rev.setdefault(expanded_key, []).extend(items)
            else:
                out.setdefault(expanded_key, []).extend(items)
    return out


def expand_document(doc, ctx: _Context | None = None):
    """Compact JSON-LD (inline @context) → expanded form the flat
    reader accepts. Documents without @context pass through _expand_obj
    unchanged in effect (keys already absolute)."""
    ctx = ctx or _Context(None)
    if isinstance(doc, list):
        return [_expand_obj(o, ctx) for o in doc]
    return _expand_obj(doc, ctx)


class _JsonLdReader:
    """One instance per document (fresh-bnode counter is doc-scoped)."""

    def __init__(self):
        self.rows: list[tuple] = []
        self._genid = 0

    def _fresh(self) -> str:
        self._genid += 1
        return f"genid-jl-{self._genid}"

    def _emit(self, s, s_kind, p, o_term, graph, graph_kind):
        o_kind, o_val, o_dt, o_lang = o_term
        self.rows.append(
            (s, s_kind, p, KIND_IRI, o_val, o_kind, o_dt, o_lang, graph, graph_kind)
        )

    def _subject_of(self, obj) -> tuple[str, int]:
        nid = obj.get("@id")
        if nid is None:
            return self._fresh(), KIND_BNODE
        if nid.startswith("_:"):
            return nid[2:], KIND_BNODE
        return nid, KIND_IRI

    def _value_term(self, v, graph, graph_kind):
        """expanded-form value → (kind, value, datatype, lang); nested
        node objects / lists emit their own triples."""
        if isinstance(v, dict):
            if "@value" in v:
                raw = v["@value"]
                dt = v.get("@type")
                lang = v.get("@language")
                if isinstance(raw, bool):
                    return (KIND_LITERAL, "true" if raw else "false",
                            dt or XSD + "boolean", None)
                if isinstance(raw, int):
                    return (KIND_LITERAL, str(raw), dt or XSD + "integer", None)
                if isinstance(raw, float):
                    return (KIND_LITERAL, repr(raw), dt or XSD + "double", None)
                return (KIND_LITERAL, raw, dt, lang)
            if "@list" in v:
                items = [
                    self._value_term(x, graph, graph_kind) for x in v["@list"]
                ]
                if not items:
                    return (KIND_IRI, RDF_NIL, None, None)
                nodes = [self._fresh() for _ in items]
                for i, (node, item) in enumerate(zip(nodes, items)):
                    self._emit(node, KIND_BNODE, RDF_FIRST, item, graph, graph_kind)
                    rest = (
                        (KIND_BNODE, nodes[i + 1], None, None)
                        if i + 1 < len(nodes)
                        else (KIND_IRI, RDF_NIL, None, None)
                    )
                    self._emit(node, KIND_BNODE, RDF_REST, rest, graph, graph_kind)
                return (KIND_BNODE, nodes[0], None, None)
            # node object (reference or inline): recurse
            label, kind = self.node(v, graph, graph_kind)
            return (kind, label, None, None)
        if isinstance(v, str):
            return (KIND_LITERAL, v, None, None)
        if isinstance(v, bool):
            return (KIND_LITERAL, "true" if v else "false", XSD + "boolean", None)
        if isinstance(v, int):
            return (KIND_LITERAL, str(v), XSD + "integer", None)
        if isinstance(v, float):
            return (KIND_LITERAL, repr(v), XSD + "double", None)
        raise JsonLdUnsupportedError(f"unsupported JSON-LD value: {v!r}")

    def node(self, obj, graph=None, graph_kind=None) -> tuple[str, int]:
        if "@context" in obj:
            raise JsonLdUnsupportedError(
                "JSON-LD @context processing is not supported by this "
                "engine (descoped: the reference delegates to Jena/"
                "Titanium) — expand the document first (flat expanded "
                "form is accepted)"
            )
        label, kind = self._subject_of(obj)
        for t in _as_list(obj.get("@type", [])):
            self._emit(label, kind, RDF_TYPE, (KIND_IRI, t, None, None),
                       graph, graph_kind)
        for key, vals in obj.items():
            if key.startswith("@"):
                if key == "@graph":
                    # named graph: children scoped to this node's id
                    for child in _as_list(vals):
                        self.node(child, label,
                                  KIND_IRI if kind == KIND_IRI else KIND_BNODE)
                elif key == "@reverse":
                    # reversed direction: each value node points back at
                    # this subject (object position = this node)
                    for rpred, rvals in vals.items():
                        for rv in _as_list(rvals):
                            if not isinstance(rv, dict) or "@value" in rv or "@list" in rv:
                                raise JsonLdUnsupportedError(
                                    "@reverse values must be node "
                                    f"objects, got: {rv!r}"
                                )
                            rlabel, rkind = self.node(rv, graph, graph_kind)
                            self._emit(
                                rlabel, rkind, rpred,
                                (kind, label, None, None),
                                graph, graph_kind,
                            )
                continue
            for v in _as_list(vals):
                term = self._value_term(v, graph, graph_kind)
                self._emit(label, kind, key, term, graph, graph_kind)
        return label, kind


def parse_jsonld_document(text: str) -> list[tuple]:
    """One expanded-form document (JSON array / @graph object / NDJSON
    lines of node objects) → rows in nquads.TRIPLE_COLS order."""
    text = text.strip()
    reader = _JsonLdReader()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        # newline-delimited node objects (this module's distributed sink)
        doc = [json.loads(ln) for ln in text.splitlines() if ln.strip()]
    if isinstance(doc, list):
        if any(isinstance(o, dict) and "@context" in o for o in doc):
            doc = expand_document(doc)
    elif isinstance(doc, dict):
        if "@context" in doc:
            doc = expand_document(doc)
        if set(doc) <= {"@graph"} and "@graph" in doc:
            doc = doc["@graph"]
        else:
            doc = [doc]
    for obj in doc:
        if not isinstance(obj, dict):
            raise JsonLdUnsupportedError(
                f"expanded JSON-LD node object expected, got: {obj!r}"
            )
        reader.node(obj)
    return reader.rows


def read_jsonld(spark: SparkSession, path: str) -> DataFrame:
    """Expanded JSON-LD files → term-model triples, one task per FILE
    (the scalable unit, same as the Turtle reader)."""
    raw = spark.read.format("binaryFile").load(path).select("content")
    schema = (
        "subj string, subj_kind int, pred string, pred_kind int, "
        "obj string, obj_kind int, obj_datatype string, obj_lang string, "
        "graph string, graph_kind int"
    )

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows: list[tuple] = []
            for content in pdf["content"]:
                rows.extend(parse_jsonld_document(bytes(content).decode("utf-8")))
            yield pd.DataFrame(rows, columns=TRIPLE_COLS)

    return raw.mapInPandas(parse, schema)


def parse_jsonld_lines(lines: DataFrame, text_col: str = "line") -> DataFrame:
    """Line-parallel parse for newline-delimited node objects (the shape
    this module's distributed writer emits): every line is a complete
    expanded node object — fully distributed, no document sequencing."""
    schema = (
        "subj string, subj_kind int, pred string, pred_kind int, "
        "obj string, obj_kind int, obj_datatype string, obj_lang string, "
        "graph string, graph_kind int"
    )

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows: list[tuple] = []
            for ln in pdf[text_col]:
                if ln and ln.strip():
                    rows.extend(parse_jsonld_document(ln))
            yield pd.DataFrame(rows, columns=TRIPLE_COLS)

    return lines.mapInPandas(parse, schema)


# ---------------------------------------------------------------------------
# writer — fully columnar
# ---------------------------------------------------------------------------


def _norm_id(value, kind):
    """Term-model id → JSON-LD @id string ('_:' prefix for bnodes;
    accepts both bare labels and pre-prefixed '_:x' flat-schema values).
    RDF-star quoted triples have no flat expanded-form encoding — fail
    the write with a typed row-level error rather than emit an @id
    holding '<< ... >>' source text."""
    bnode = F.concat(F.lit("_:"), F.regexp_replace(value, "^_:", ""))
    return (
        F.when(
            kind == KIND_QUOTED,
            F.raise_error(
                F.lit("flat expanded JSON-LD cannot serialize RDF-star quoted triples")
            ),
        )
        .when(kind == KIND_BNODE, bnode)
        .otherwise(value)
    )


def _compaction_rules(context) -> dict:
    """Caller context → driver-side compaction rule set for the writer.

    Only rules whose round-trip is structurally guaranteed against THIS
    module's reader (and standard JSON-LD 1.0 expansion) are kept:

    - **exact term** (keys / ``@type`` values only): term defined as a
      plain IRI mapping with no ``@container``/``@type``/``@language``
      (the writer emits dict value objects, which bypass coercion, but a
      ``@container: @list`` term would re-interpret the value array).
    - **compact IRI** ``term:suffix`` (keys, ``@type``, and ``@id``
      values): term's IRI is a usable namespace; skipped when another
      term name shadows ``term:…``.
    - **@vocab suffix** (keys / ``@type`` values only — ``@id`` values
      are base-resolved, not vocab-resolved): guarded at runtime so the
      bare suffix is non-empty, has no ``:``, no leading ``@``, and is
      not itself a defined term.

    The context document itself is embedded verbatim (deterministic
    key-sorted JSON) in every emitted top-level line, so each line stays
    a self-contained JSON-LD document."""
    ctx = _Context(context)
    term_names = sorted(ctx.terms)
    key_exact: list[tuple[str, str]] = []
    prefixes: list[tuple[str, str]] = []
    for term, d in sorted(ctx.terms.items()):
        if term.startswith("@") or term == "_":
            continue
        resolved = ctx.expand_iri(term, vocab=True)
        if not resolved or resolved.startswith("@"):
            continue
        neutral = (
            d.get("container") is None
            and d.get("type") is None
            and d.get("language") is ...
        )
        if neutral:
            key_exact.append((resolved, term))
        # usable as a namespace prefix? probe how "term:<x>" expands
        sentinel = "\x01"
        probe = ctx.expand_iri(term + ":" + sentinel)
        shadowed = any(t != term and t.startswith(term + ":") for t in ctx.terms)
        if probe and probe.endswith(sentinel) and not shadowed:
            prefixes.append((probe[: -len(sentinel)], term))
    # longest namespace first: most specific compaction wins
    prefixes.sort(key=lambda pt: -len(pt[0]))
    return {
        "ctx_json": json.dumps(context, sort_keys=True, separators=(",", ":")),
        "key_exact": key_exact,
        "prefixes": prefixes,
        "vocab": ctx.vocab,
        "term_names": term_names,
    }


def _compact_key_col(col, rules: dict):
    """IRI column → compacted key/@type column (exact term, compact
    IRI, @vocab suffix — first match wins, else the IRI unchanged).
    Pure WHEN chain over the bounded rule set: zero Python per row."""
    out = col
    vocab = rules["vocab"]
    if vocab:
        suffix = col.substr(F.lit(len(vocab) + 1), F.length(col))
        cond = (
            col.startswith(vocab)
            & (F.length(col) > len(vocab))
            & ~suffix.contains(":")
            & ~suffix.startswith("@")
        )
        if rules["term_names"]:
            cond = cond & ~suffix.isin(rules["term_names"])
        out = F.when(cond, suffix).otherwise(out)
    for p, t in reversed(rules["prefixes"]):
        suffix = col.substr(F.lit(len(p) + 1), F.length(col))
        cond = (
            col.startswith(p)
            & (F.length(col) > len(p))
            & ~suffix.startswith("//")
        )
        out = F.when(cond, F.concat(F.lit(t + ":"), suffix)).otherwise(out)
    for iri, term in rules["key_exact"]:
        out = F.when(col == iri, F.lit(term)).otherwise(out)
    return out


def _compact_id_col(col, rules: dict):
    """IRI column → compacted ``@id`` value (compact-IRI rules only:
    bare terms/@vocab suffixes are not ``@id``-expandable; blank nodes
    pass through untouched)."""
    out = col
    for p, t in reversed(rules["prefixes"]):
        suffix = col.substr(F.lit(len(p) + 1), F.length(col))
        cond = (
            ~col.startswith("_:")
            & col.startswith(p)
            & (F.length(col) > len(p))
            & ~suffix.startswith("//")
        )
        out = F.when(cond, F.concat(F.lit(t + ":"), suffix)).otherwise(out)
    return out


def _json_str(col):
    """JSON-encode a string column (quotes + escapes) by round-tripping
    through to_json(struct(...)) and trimming the {"k": ... } wrapper —
    keeps escaping JVM-side, no Python in the row path."""
    j = F.to_json(F.struct(col.alias("k")))
    # j == '{"k":<encoded>}' — strip the 5-char prefix and 1-char suffix
    return j.substr(F.lit(6), F.length(j) - F.lit(6))


def _node_lines(
    triples: DataFrame, rules: dict | None = None,
    group_col: str | None = None,
) -> DataFrame:
    """Per-(graph, subj) flat node object as a JSON line (expanded form,
    or compacted keys/ids when ``rules`` from :func:`_compaction_rules`
    is given — values stay expanded value objects, which compact
    documents may legally carry).

    Null struct fields are dropped by to_json (Spark default
    jsonGenerator.ignoreNullFields=true), so one sparse struct covers
    IRI refs and plain / typed / language literals. Two hash
    aggregations, no window, no driver collect."""
    cols = set(triples.columns)
    get = lambda c: F.col(c) if c in cols else F.lit(None).cast("string")  # noqa: E731
    infer = lambda c: F.when(  # noqa: E731
        F.col(c).startswith("_:"), F.lit(KIND_BNODE)
    ).otherwise(F.lit(KIND_IRI))
    ckey = (lambda c: _compact_key_col(c, rules)) if rules else (lambda c: c)
    cid = (lambda c: _compact_id_col(c, rules)) if rules else (lambda c: c)
    s_kind = (F.col("subj_kind") if "subj_kind" in cols else infer("subj")).cast("int")
    o_kind = F.col("obj_kind").cast("int")
    vo = F.struct(
        F.when(o_kind != KIND_LITERAL, cid(_norm_id(F.col("obj"), o_kind))).alias("@id"),
        F.when(o_kind == KIND_LITERAL, F.col("obj")).alias("@value"),
        F.when(o_kind == KIND_LITERAL, ckey(get("obj_datatype"))).alias("@type"),
        F.when(o_kind == KIND_LITERAL, get("obj_lang")).alias("@language"),
    )
    extra = [F.col(group_col)] if group_col else []
    gkeys = [group_col] if group_col else []
    per_pred = (
        triples.select(
            *extra,
            cid(get("graph")).alias("graph"),
            cid(_norm_id(F.col("subj"), s_kind)).alias("sid"),
            ckey(F.col("pred")).alias("pred"),
            vo.alias("vo"),
        )
        .groupBy(*gkeys, "graph", "sid", "pred")
        .agg(
            F.concat(
                _json_str(F.col("pred")), F.lit(":"), F.to_json(F.collect_list("vo"))
            ).alias("entry")
        )
    )
    return (
        per_pred.groupBy(*gkeys, "graph", "sid")
        .agg(F.concat_ws(",", F.sort_array(F.collect_list("entry"))).alias("entries"))
        .select(
            *gkeys,
            "graph",
            F.concat(
                F.lit('{"@id":'),
                _json_str(F.col("sid")),
                F.lit(","),
                F.col("entries"),
                F.lit("}"),
            ).alias("node"),
        )
    )


def render_jsonld(
    triples: DataFrame, context=None, group_col: str | None = None
) -> DataFrame:
    """→ DataFrame['line']: default-graph node objects one per line;
    each named graph collapsed to one ``{"@id": g, "@graph":[...]}``
    line. ``group_col`` (e.g. ``frame_index``) keeps that column and
    scopes all grouping to it — the per-frame document mode.

    ``context`` (a JSON-LD ``@context`` value from the supported
    subset) switches the writer to **compact-on-write**: property keys,
    ``@type`` datatypes, and ``@id`` values compact through the
    context's terms / namespace prefixes / ``@vocab`` (rule guards in
    :func:`_compaction_rules`), and every top-level line embeds the
    context so it remains a self-contained JSON-LD document. Reading
    the result back (this reader or any conformant processor) yields
    the same statements as the expanded form."""
    rules = _compaction_rules(context) if context is not None else None
    nodes = _node_lines(triples, rules, group_col=group_col)
    gk = [group_col] if group_col else []
    default = nodes.filter(F.col("graph").isNull()).select(
        *gk, F.col("node").alias("line")
    )
    named_hdr = '{"@id":'
    if rules:
        ctx_frag = '{"@context":' + rules["ctx_json"] + ","
        # node lines already start with '{' — splice the context in
        default = default.select(
            *gk,
            F.concat(F.lit(ctx_frag), F.col("line").substr(F.lit(2), F.length("line")))
            .alias("line"),
        )
        named_hdr = ctx_frag + '"@id":'
    named = (
        nodes.filter(F.col("graph").isNotNull())
        .groupBy(*gk, "graph")
        .agg(F.concat_ws(",", F.sort_array(F.collect_list("node"))).alias("body"))
        .select(
            *gk,
            F.concat(
                F.lit(named_hdr),
                _json_str(F.col("graph")),
                F.lit(',"@graph":['),
                F.col("body"),
                F.lit("]}"),
            ).alias("line"),
        )
    )
    return default.unionByName(named)


def write_jsonld(
    triples: DataFrame, path: str, single_file: bool = False, context=None,
    per_frame: bool = False, frame_ids: DataFrame | None = None,
) -> None:
    """JSON-LD sink. Distributed mode writes one node object per line
    (newline-delimited flat expanded form — the reader accepts it);
    ``single_file`` assembles a standard JSON array document via
    coalesce(1) with header/footer rows (the bounded artifact path,
    same contract as the Turtle single-file sink). ``context`` enables
    compact-on-write (see :func:`render_jsonld`).

    ``per_frame`` writes one complete ``[...]`` array document per
    ``frame_index``, concatenated in frame order — the reference's
    default for batch formats without --combine
    (RdfFromJelly.scala:106-118). ``frame_ids`` supplies the full frame
    list so statement-free frames still emit an empty ``[]`` document.
    Per-frame output is assembled ordered (bounded-artifact contract,
    like the reference's in-memory batch writer)."""
    if per_frame:
        lines = render_jsonld(triples, context=context,
                              group_col="frame_index")
        fids = (
            frame_ids if frame_ids is not None
            else triples.select("frame_index").distinct()
        ).select(F.col("frame_index"))
        hdr = fids.select("frame_index", F.lit(0).alias("k"),
                          F.lit("[").alias("line"))
        ftr = fids.select("frame_index", F.lit(2).alias("k"),
                          F.lit("]").alias("line"))
        body = lines.select(
            "frame_index", F.lit(1).alias("k"),
            F.concat(F.col("line"), F.lit(",")).alias("line"),
        )
        out = (
            hdr.unionByName(body).unionByName(ftr)
            .coalesce(1)
            .sortWithinPartitions("frame_index", "k", "line")
        )

        def fix(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            import pandas as pd

            # drop the trailing comma before every ']' (last body row
            # of each frame's array) — one partition holds the whole
            # assembled document, so lookahead is safe
            for pdf in batches:
                s = pdf["line"].tolist()
                for i in range(len(s) - 1):
                    if s[i + 1] == "]" and s[i].endswith(","):
                        s[i] = s[i][:-1]
                yield pd.DataFrame({"line": s})

        out.select("line").mapInPandas(fix, "line string").write.mode(
            "overwrite"
        ).text(path)
        return
    lines = render_jsonld(triples, context=context)
    if not single_file:
        lines.write.mode("overwrite").text(path)
        return
    spark = triples.sparkSession
    hdr = spark.createDataFrame([(0, "[")], "k int, line string")
    ftr = spark.createDataFrame([(2, "]")], "k int, line string")
    body = lines.select(
        F.lit(1).alias("k"),
        F.concat(F.col("line"), F.lit(",")).alias("line"),
    )
    # trailing comma before ']' is invalid JSON — drop it from the last
    # body row by sorting and rewriting in the single output partition
    out = (
        hdr.unionByName(body)
        .unionByName(ftr)
        .coalesce(1)
        .sortWithinPartitions("k", "line")
    )

    def fix(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            s = pdf["line"].tolist()
            for i in range(len(s) - 1, -1, -1):
                if s[i].endswith(","):
                    s[i] = s[i][:-1]
                    break
            yield pd.DataFrame({"line": s})

    out.select("line").mapInPandas(fix, "line string").write.mode(
        "overwrite"
    ).text(path)
