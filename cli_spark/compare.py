"""RDF comparison battery — the distributed re-expression of
``rdf validate`` (SURVEY.md §2.3, §3.3). Unlike the reference, which
materializes every frame in memory (RdfValidate.scala:101, documented
OOM), every comparison here is a join.

- :func:`ordered_compare`     J1: positional equality with blank-node
  bijection (OrderedRdfCompare.scala:10-75)
- :func:`unordered_compare`   J2: per-graph isomorphism via iterative
  hash-refinement canonical bnode labeling (UnorderedRdfCompare.scala:10-34)
- :func:`containment`         J3: expected ⊆ actual via left-anti join
- :func:`precision_recall`    north-rule P/R scorer over canonicalized triples
- :func:`validate_stream`     P5/P8/P10 structural checks over a frames/rows table
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

BNODE_PREFIX = "_:"
REFINE_ROUNDS = 5


@dataclass
class CompareResult:
    equal: bool
    detail: str


def _is_bnode(col):
    return col.startswith(BNODE_PREFIX)


def ordered_compare(
    expected: DataFrame,
    actual: DataFrame,
    cols: tuple[str, ...] = ("subj", "pred", "obj"),
) -> CompareResult:
    """Positional compare with bnode bijection (J1). Inputs must carry a
    deterministic order column ``idx`` (or be small enough for a window).

    Mirrors the reference's one-directional functional check
    (OrderedRdfCompare.scala:38-44): each expected bnode label maps to
    exactly one actual label. ``cols`` extends the positional check to
    quads (pass a 4th graph column, nulls coalesced by the caller —
    the reference compares full datasets via its AnyStatementHandler,
    RdfValidate.scala:173-181).
    """
    def with_idx(df):
        if "idx" in df.columns:
            return df
        # "stream order as given": source-layout order via the partition-
        # indexed monotonic id, ranked with the partition-offset technique
        # (parallel AND deterministic w.r.t. the source layout — the old
        # row_number-over-lit(1) fallback was a single task whose order
        # was undefined after a shuffle). Callers that shuffled upstream
        # must pass an explicit idx column.
        from .order import global_row_number

        tagged = df.withColumn("_src_pos", F.monotonically_increasing_id())
        return global_row_number(tagged, ["_src_pos"], rn_col="idx").drop("_src_pos")

    e, a = with_idx(expected).alias("e"), with_idx(actual).alias("a")
    ne, na = e.count(), a.count()
    if ne != na:
        return CompareResult(False, f"size mismatch: expected {ne} != actual {na}")
    j = e.join(a, "idx")

    # Positional equality with bnode labels MASKED — this recurses into
    # RDF-star quoted-triple terms for free (OrderedRdfCompare.scala:45-51):
    # a "<< _:x <p> _:y >>" term masks to "<< _:ω <p> _:ω >>", so two
    # quoted terms are position-equal iff their non-bnode structure is
    # identical; their inner labels feed the same bijection as top-level
    # bnodes. Masking applies only to bnode terms and quoted-triple
    # terms, so literals containing the text "_:" are untouched.
    _LABEL_RX = "_:[A-Za-z0-9_](?:[A-Za-z0-9_\\-.]*[A-Za-z0-9_\\-])?"

    def masked(col):
        needs = _is_bnode(col) | col.startswith("<<")
        return F.when(
            needs, F.regexp_replace(col, _LABEL_RX, "_:ω")
        ).otherwise(col)

    for c in cols:
        bad = j.filter(
            ~(
                masked(F.col(f"e.{c}")).eqNullSafe(masked(F.col(f"a.{c}")))
            )
        ).count()
        if bad:
            return CompareResult(False, f"{bad} positions differ in {c}")
    # bnode bijection (functional e→a): every expected label pairs with
    # exactly one actual label across all positions, including labels
    # inside quoted triples (zipped in source order — masked equality
    # above guarantees equal counts and matching positions)
    pairs = None
    for c in cols:
        has_labels = _is_bnode(F.col(f"e.{c}")) | F.col(f"e.{c}").startswith("<<")
        p = (
            j.filter(has_labels)
            .select(
                F.explode(
                    F.arrays_zip(
                        F.regexp_extract_all(F.col(f"e.{c}"), F.lit(_LABEL_RX), F.lit(0)),
                        F.regexp_extract_all(F.col(f"a.{c}"), F.lit(_LABEL_RX), F.lit(0)),
                    )
                ).alias("z")
            )
            .select(F.col("z.0").alias("e_label"), F.col("z.1").alias("a_label"))
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    if pairs is None:
        return CompareResult(True, "equal (no bnodes)")
    violations = (
        pairs.distinct()
        .groupBy("e_label")
        .agg(F.countDistinct("a_label").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    if violations:
        return CompareResult(False, f"{violations} bnode labels map to multiple targets")
    return CompareResult(True, "equal")


def canonical_bnode_labels(triples: DataFrame, rounds: int = REFINE_ROUNDS) -> DataFrame:
    """Canonical bnode labeling by iterative hash refinement (color
    refinement over the bnode incidence structure) — SURVEY.md §7 hard
    part 1. Correct for graphs without automorphic bnode clusters; the
    refinement hash folds each bnode's multiset of (pred, direction,
    neighbor-signature) per round.

    Returns (graph, label, canon) for every bnode label per graph.
    """
    g = triples.withColumn("graph", F.coalesce(F.col("graph"), F.lit("")))
    # edges incident to bnodes, both directions
    occ = None
    for c, d in (("subj", "s"), ("obj", "o")):
        other = "obj" if c == "subj" else "subj"
        e = g.filter(_is_bnode(F.col(c))).select(
            "graph",
            F.col(c).alias("label"),
            F.lit(d).alias("dir"),
            F.col("pred"),
            F.col(other).alias("neighbor"),
        )
        occ = e if occ is None else occ.unionByName(e)
    occ = occ.persist()
    # initial signature: degree-ish — hash of sorted incident (dir, pred,
    # non-bnode neighbor) multiset; bnode neighbors start as "?"
    sig = occ.select(
        "graph",
        "label",
        F.when(_is_bnode(F.col("neighbor")), F.lit("?")).otherwise(F.col("neighbor")).alias(
            "nsig"
        ),
        "dir",
        "pred",
    )
    labels = (
        sig.groupBy("graph", "label")
        .agg(F.md5(F.concat_ws("|", F.sort_array(F.collect_list(
            F.concat_ws(":", "dir", "pred", "nsig"))))).alias("h"))
    )
    for _ in range(rounds):
        nb = occ.join(
            labels.select("graph", F.col("label").alias("neighbor"), F.col("h").alias("nh")),
            ["graph", "neighbor"],
            "left",
        ).select(
            "graph",
            "label",
            "dir",
            "pred",
            F.coalesce(F.col("nh"), F.col("neighbor")).alias("nsig"),
        )
        labels = nb.groupBy("graph", "label").agg(
            F.md5(
                F.concat_ws(
                    "|", F.sort_array(F.collect_list(F.concat_ws(":", "dir", "pred", "nsig")))
                )
            ).alias("h")
        ).localCheckpoint()
    from .session import release_on_gc

    return release_on_gc(
        labels.select(
            "graph", "label", F.concat(F.lit("_:c"), F.col("h")).alias("canon")
        ),
        occ,
    )


def canonicalize_bnodes(triples: DataFrame) -> DataFrame:
    """Rewrite bnode labels to canonical refinement hashes; IRIs and
    literals pass through. Output: (graph, subj, pred, obj, obj_kind?)."""
    has_kind = "obj_kind" in triples.columns
    g = triples.withColumn("graph", F.coalesce(F.col("graph"), F.lit("")))
    labels = canonical_bnode_labels(triples)
    out = (
        g.join(
            labels.select("graph", F.col("label").alias("subj"), F.col("canon").alias("sc")),
            ["graph", "subj"],
            "left",
        )
        .join(
            labels.select("graph", F.col("label").alias("obj"), F.col("canon").alias("oc")),
            ["graph", "obj"],
            "left",
        )
        .select(
            "graph",
            F.coalesce("sc", "subj").alias("subj"),
            "pred",
            F.coalesce("oc", "obj").alias("obj"),
            *(["obj_kind"] if has_kind else []),
        )
    )
    return out


def unordered_compare(expected: DataFrame, actual: DataFrame) -> CompareResult:
    """Per-graph isomorphism check (J2): graph sets equal, each graph's
    canonicalized triple multiset equal (exceptAll both ways)."""
    e = canonicalize_bnodes(expected)
    a = canonicalize_bnodes(actual)
    ge = e.select("graph").distinct()
    ga = a.select("graph").distinct()
    missing_g = ge.exceptAll(ga).count() + ga.exceptAll(ge).count()
    if missing_g:
        return CompareResult(False, f"graph sets differ ({missing_g} unmatched)")
    diff = e.exceptAll(a).count() + a.exceptAll(e).count()
    if diff:
        return CompareResult(False, f"{diff} canonicalized triples unmatched")
    return CompareResult(True, "isomorphic")


def containment(expected: DataFrame, actual: DataFrame, keys=("subj", "pred", "obj")) -> int:
    """J3: # expected triples missing from actual (0 ⇒ contained)."""
    return expected.select(*keys).distinct().join(
        actual.select(*keys).distinct(), list(keys), "left_anti"
    ).count()


def precision_recall(
    expected: DataFrame, actual: DataFrame, keys=("subj", "pred", "obj")
) -> dict:
    """North-rule scorer: P = |E∩A|/|A|, R = |E∩A|/|E|."""
    e = expected.select(*keys).distinct().persist()
    a = actual.select(*keys).distinct().persist()
    try:
        ne, na = e.count(), a.count()
        ni = e.join(a, list(keys)).count()
    finally:
        e.unpersist()
        a.unpersist()
    return {
        "n_expected": ne,
        "n_actual": na,
        "n_inter": ni,
        "precision": ni / na if na else 0.0,
        "recall": ni / ne if ne else 0.0,
    }


def validate_stream(rows: DataFrame) -> list[str]:
    """Structural validation of a decoded rows table (P5/P10 analogs):
    returns a list of violation strings (empty ⇒ valid).

    - every sub-stream's first row is an options row
      (RdfValidate.scala:118-121)
    - statement rows are fully resolved (the resolver inlines every
      table ref and elided term; a NULL s/p/o value on a statement row
      means the stream was malformed)
    - P8 flag conformance (RdfValidate.scala:159-182, isGeneralized /
      isRdfStar in StatementUtils.scala:14-25): statements whose
      explicit term kinds exceed what the stream options declare; the
      first offending frame is named, like the reference's
      CriticalException. (Declared-table-bound conformance is enforced
      during decode by the strict resolver — jellywire.StreamState.)
    """
    from .jelly import (
        KIND_NAME,
        KIND_OPTIONS,
        KIND_QUAD,
        KIND_TRIPLE,
        assign_segments,
    )

    rows = assign_segments(rows)  # per-options-row sub-stream ids
    problems: list[str] = []
    # first row of each sub-stream: a groupBy min-of-struct (map-side
    # partial agg, scales with segments), not a row_number window —
    # a single-file import would serialize that window into one task.
    # (frame_index, row_pos) is unique within a segment, so the
    # trailing row_kind field never decides the ordering; it just
    # rides along to be read back out of the min.
    first_rows = (
        rows.groupBy("seg")
        .agg(
            F.min(
                F.struct(
                    F.col("frame_index"), F.col("row_pos"),
                    F.col("row_kind").alias("k"),
                )
            ).alias("first")
        )
        .filter(F.col("first.k") != KIND_OPTIONS)
        .count()
    )
    if first_rows:
        problems.append(f"{first_rows} segment(s) do not start with an options row")
    stmts = rows.filter(F.col("row_kind").isin(KIND_TRIPLE, KIND_QUAD))
    # fully-resolved contract: IRI/bnode/literal/quoted terms carry a
    # value; only a default-graph term is legitimately NULL
    unresolved = stmts.filter(
        F.col("subj").isNull()
        | F.col("pred").isNull()
        | F.col("obj").isNull()
        | ((F.col("row_kind") == KIND_QUAD)
           & F.col("graph").isNull()
           & (F.col("graph_kind") != 4))
    ).count()
    if unresolved:
        problems.append(f"{unresolved} statement(s) with unresolved terms")
    # Re-assigning a previously-used entry id is LEGAL Jelly (bounded
    # tables overwrite slots once full), so id reuse is not a problem.
    # What IS a violation: an entry id above the table size the stream's
    # own options declared — no decoder can store it.
    from .jelly import KIND_DATATYPE, KIND_PREFIX

    seg_limits = F.broadcast(
        rows.filter(F.col("row_kind") == KIND_OPTIONS)
        .groupBy("seg")
        .agg(
            F.max("opt_max_name").alias("_max_name"),
            F.max("opt_max_prefix").alias("_max_prefix"),
            F.max("opt_max_dt").alias("_max_dt"),
        )
    )
    entry_limit = (
        F.when(F.col("row_kind") == KIND_NAME, F.col("_max_name"))
        .when(F.col("row_kind") == KIND_PREFIX, F.col("_max_prefix"))
        .otherwise(F.col("_max_dt"))
    )
    oob_ids = (
        rows.filter(
            F.col("row_kind").isin(KIND_NAME, KIND_PREFIX, KIND_DATATYPE)
        )
        .join(seg_limits, "seg")
        .filter(
            entry_limit.isNotNull()
            & (entry_limit > 0)
            & (F.col("name_id") > entry_limit)
        )
        .count()
    )
    if oob_ids:
        problems.append(
            f"{oob_ids} dictionary entry id(s) exceed the declared "
            f"lookup-table size"
        )
    if "opt_flags" in rows.columns:
        s_kind = F.col("subj_kind")
        p_kind = F.col("pred_kind")
        o_kind = F.col("obj_kind")
        g_kind = F.col("graph_kind")

        def _declared(bit: int) -> bool:
            return (
                rows.filter(F.col("row_kind") == KIND_OPTIONS)
                .filter(F.col("opt_flags").bitwiseAND(bit) != 0)
                .limit(1)
                .count()
                > 0
            )

        def _first_frame(pred):
            hit = (
                stmts.filter(pred)
                .orderBy("seg", "frame_index", "row_pos")
                .select("frame_index")
                .limit(1)
                .collect()
            )
            return hit[0].frame_index if hit else None

        if not _declared(1):
            # isGeneralized: literal subject, non-IRI predicate, or (quad)
            # literal graph name (StatementUtils.scala:14-21)
            frame = _first_frame(
                (s_kind == 2)
                | (p_kind != 0)
                | ((F.col("row_kind") == KIND_QUAD) & (g_kind == 2))
            )
            if frame is not None:
                problems.append(
                    f"generalized statement in frame {frame} but the "
                    f"stream options do not declare the generalized-RDF flag"
                )
        if not _declared(2):
            # isRdfStar: any quoted-triple term (StatementUtils.scala:23-25)
            frame = _first_frame(
                (o_kind == 3) | (s_kind == 3) | (p_kind == 3) | (g_kind == 3)
            )
            if frame is not None:
                problems.append(
                    f"RDF-star statement in frame {frame} "
                    f"but the stream options do not declare the rdf-star flag"
                )
    return problems


# ---------------------------------------------------------------------------
# Eager term validation (--validate-terms)
#
# The reference's RdfPerformanceOptions.validateTerms
# (cli/command/rdf/util/RdfPerformanceOptions.scala:15-18) re-enables
# Jena's eager literal/IRI checking, which every command disables by
# default for speed (JenaSystemOptions.scala:14-37) except `rdf
# validate` (RdfValidate.scala:95: default TRUE there).  The Spark
# re-expression is one codegen-only filter pass over the statements
# table — no shuffle, no UDF:
#
#   - IRI terms must be absolute (scheme prefix) and free of the
#     characters N-Triples forbids inside <>: space/control, <>"{}|^`\
#   - language tags must be well-formed BCP47 subtags
#   - literals with a known XSD datatype must match that datatype's
#     lexical space (the integer family, decimal, float/double,
#     boolean, date, time, dateTime) — lexical-form checking, the same
#     layer Jena's EAGER LiteralLabel mode enforces
# ---------------------------------------------------------------------------

XSD_NS = "http://www.w3.org/2001/XMLSchema#"

_IRI_RX = r'^[A-Za-z][A-Za-z0-9+.\-]*:[^\x00-\x20<>"{}|^`\\]*$'
_LANG_RX = r"^[A-Za-z]{1,8}(-[A-Za-z0-9]{1,8})*$"
_INT_RX = r"^[+-]?[0-9]+$"
_UNSIGNED_RX = r"^\+?[0-9]+$"
_DEC_RX = r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$"
_FLOAT_RX = (
    r"^([+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?|[+-]?INF|NaN)$"
)
_TZ = r"(Z|[+-](0[0-9]|1[0-3]):[0-5][0-9]|[+-]14:00)?"
_DATE_BODY = r"-?[0-9]{4,}-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])"
_TIME_BODY = r"([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9](\.[0-9]+)?"

XSD_LEXICAL_RX: dict[str, str] = {
    **{XSD_NS + t: _INT_RX for t in ("integer", "long", "int", "short", "byte",
                                     "negativeInteger", "nonPositiveInteger")},
    **{XSD_NS + t: _UNSIGNED_RX
       for t in ("nonNegativeInteger", "positiveInteger", "unsignedLong",
                 "unsignedInt", "unsignedShort", "unsignedByte")},
    XSD_NS + "decimal": _DEC_RX,
    XSD_NS + "float": _FLOAT_RX,
    XSD_NS + "double": _FLOAT_RX,
    XSD_NS + "boolean": r"^(true|false|0|1)$",
    XSD_NS + "date": f"^{_DATE_BODY}{_TZ}$",
    XSD_NS + "time": f"^{_TIME_BODY}{_TZ}$",
    XSD_NS + "dateTime": f"^{_DATE_BODY}T{_TIME_BODY}{_TZ}$",
}

# term-kind bytes shared with the statement model (jelly.py:112)
_K_IRI, _K_BNODE, _K_LITERAL = 0, 1, 2


def term_violations(stmts: DataFrame) -> DataFrame:
    """→ DataFrame['position','value','reason'] of term-validation
    failures in a statements table (triples or quads, annotated or
    flat — missing kind/datatype/langtag columns are inferred/ignored
    the same way the renderers do).  Empty ⇒ all terms valid."""
    cols = set(stmts.columns)
    get = lambda c: (  # noqa: E731
        F.col(c) if c in cols else F.lit(None).cast("string")
    )

    def infer_kind(c: str) -> "F.Column":
        return F.when(
            F.col(c).startswith(BNODE_PREFIX), F.lit(_K_BNODE)
        ).otherwise(F.lit(_K_IRI))

    positions = [
        ("subj", "subj_kind", "subj_dt", "subj_lang"),
        ("pred", "pred_kind", "pred_dt", "pred_lang"),
        ("obj", "obj_kind", "obj_datatype", "obj_lang"),
    ]
    if "graph" in cols:
        positions.append(("graph", "graph_kind", "graph_dt", "graph_lang"))

    stack_args: list = []
    for pos, kind_c, dt_c, lang_c in positions:
        value = F.col(pos)
        kind = (
            F.col(kind_c).cast("int") if kind_c in cols else infer_kind(pos)
        )
        dt, lang = get(dt_c), get(lang_c)
        lexical_ok = F.lit(True)
        for dt_iri, rx in XSD_LEXICAL_RX.items():
            lexical_ok = F.when(dt == dt_iri, value.rlike(rx)).otherwise(
                lexical_ok
            )
        reason = (
            F.when(
                value.isNotNull() & (kind == _K_IRI) & ~value.rlike(_IRI_RX),
                F.lit("invalid IRI"),
            )
            .when(
                lang.isNotNull() & ~lang.rlike(_LANG_RX),
                F.lit("invalid language tag"),
            )
            .when(
                value.isNotNull() & (kind == _K_LITERAL) & ~lexical_ok,
                F.concat(F.lit("invalid lexical form for <"), dt, F.lit(">")),
            )
        )
        stack_args += [F.lit(pos), value, reason]

    n = len(positions)
    return (
        stmts.select(
            F.stack(F.lit(n), *stack_args).alias("position", "value", "reason")
        )
        .filter(F.col("reason").isNotNull())
    )


def ensure_valid_terms(stmts: DataFrame, context: str = "input") -> None:
    """Raise ``ValueError`` naming the first invalid term (the typed
    CLI error the reference signals when --validate-terms is on and a
    term fails Jena's eager checks)."""
    hit = term_violations(stmts).limit(1).collect()
    if hit:
        r = hit[0]
        raise ValueError(
            f"term validation failed in {context}: {r['reason']} at "
            f"{r['position']}: {r['value']!r}"
        )
