"""Stage 1 — mention extraction: source files → (subj, pred, obj) triples.

The reference's analog is the push-parser stage of ``rdf to-jelly``
(tokenizer → statements, /root/reference/src/main/scala/eu/neverblink/
jelly/cli/util/jena/riot/RiotParserUtil.scala:14-40). Here the "parse"
is per-language mention detection over file content, emitting entity
triples (repo, file, commit, import, symbol-def/use) with the fixed
vocabulary of :mod:`cli_spark.corpus`.

Two interchangeable engines, identical output:

- ``engine="sql"`` (default): ``regexp_extract_all`` columnar
  expressions — whole-stage-codegen'd, zero Python in the hot path.
  This is the 100 TB path: the scan, regex, explode, and dedup all
  stay JVM-side and pipeline inside one stage.
- ``engine="pandas"``: an Arrow-batched ``mapInPandas`` extractor
  (vectorized ``Series.str.findall``, no per-row Python) — the shape
  mandated for extractors that need real per-lang tokenizers/AST
  walks; the regex set here is the stand-in for that logic.

Output schema (FIXTURES.md §2): subj, pred, obj, obj_kind, graph,
src_repo, src_path, src_commit. Triples are set-semantics, matching
Jena's DatasetGraph-is-a-set behavior (StreamRdfBatchWriter.scala:18-19)
— enforced row-locally (see extract_triples), not with a global shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .corpus import (
    KIND_IRI,
    KIND_LITERAL,
    PRED_AT_COMMIT,
    PRED_DEFINES,
    PRED_HAS_FILE,
    PRED_IMPORTS,
    PRED_IN_LANG,
    PRED_PROVIDES,
    PRED_USES,
)

if TYPE_CHECKING:
    import pandas as pd

# (mention_type, regex-with-one-capture-group) per language. Multiline
# anchors via inline (?m). These are the "per-lang regex extractors" of
# the north rule; an AST-token extractor slots in per language without
# touching the pipeline (same mention_type vocabulary).
LANG_PATTERNS: dict[str, list[tuple[str, str]]] = {
    "python": [
        ("provides", r'(?m)^"""module (\w+)'),
        ("imports", r"(?m)^import (\w+)$"),
        ("imports", r"(?m)^from (\w+) import"),
        ("defines", r"(?m)^def (\w+)\("),
        ("defines", r"(?m)^class (\w+)[:(]"),
        ("uses", r"(?m)return (\w+)\("),
    ],
    "scala": [
        ("provides", r"(?m)^package (\w+)"),
        ("imports", r"(?m)^import lib\.(\w+)"),
        ("defines", r"(?m)\bdef (\w+)\("),
        ("defines", r"(?m)^(?:object|class) (\w+)"),
        ("uses", r"(?m)= (\w+)\("),
    ],
    "javascript": [
        ("provides", r"(?m)^// module (\w+)"),
        ("imports", r"require\('(\w+)'\)"),
        ("imports", r"(?m)^import (?:\w+) from '(\w+)'"),
        ("defines", r"(?m)^function (\w+)\("),
        ("defines", r"(?m)^class (\w+)"),
        ("uses", r"(?m)return (\w+)\("),
    ],
}

MENTION_SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "mention_type string, name string"
)


def _mentions_sql(repos: DataFrame) -> DataFrame:
    """Columnar mention extraction: one regexp_extract_all per pattern,
    concatenated per language, exploded once. All JVM-side."""
    def one_pattern(mtype: str, rx: str) -> Column:
        # NB: the lambda must be unary — F.transform passes (elem, idx)
        # to two-arg lambdas, so a default-arg closure would capture the
        # index column instead of the Python string.
        return F.transform(
            F.regexp_extract_all(F.col("content"), F.lit(rx), F.lit(1)),
            lambda name: F.struct(F.lit(mtype).alias("mention_type"), name.alias("name")),
        )

    per_lang = []
    for lang, patterns in LANG_PATTERNS.items():
        arrays = [one_pattern(mtype, rx) for mtype, rx in patterns]
        # per-row dedup (array_distinct) — set semantics without a
        # shuffle; see extract_triples for why row-local is sufficient
        per_lang.append((lang, F.array_distinct(F.concat(*arrays))))
    mentions_col = None
    for lang, arr in per_lang:
        clause = F.when(F.col("lang") == lang, arr)
        mentions_col = clause if mentions_col is None else mentions_col.when(
            F.col("lang") == lang, arr
        )
    return repos.select(
        "repo",
        "path",
        "commit",
        "lang",
        F.explode(mentions_col).alias("m"),
    ).select("repo", "path", "commit", "lang", "m.mention_type", "m.name")


def _mentions_pandas(repos: DataFrame) -> DataFrame:
    """Arrow-batched extractor: vectorized pandas str ops per batch.

    Stand-in for real tokenizer/AST extractors — batch shape and UDF
    signature are the production ones (iterator of pandas DataFrames in
    and out, never row-at-a-time Python).
    """

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            outs = []
            for lang, patterns in LANG_PATTERNS.items():
                sub = pdf[pdf["lang"] == lang]
                if sub.empty:
                    continue
                sub_outs = []
                for mtype, rx in patterns:
                    # findall is vectorized across the batch (Python re
                    # honors the inline (?m) flag); explode flattens the
                    # per-row match lists.
                    hits = sub["content"].str.findall(rx)
                    frame = sub[["repo", "path", "commit", "lang"]].copy()
                    frame["name"] = hits
                    frame = frame.explode("name").dropna(subset=["name"])
                    frame["mention_type"] = mtype
                    sub_outs.append(
                        frame[["repo", "path", "commit", "lang", "mention_type", "name"]]
                    )
                # row-local set semantics, mirroring the SQL engine's
                # array_distinct (provenance keys make rows independent)
                outs.append(
                    pd.concat(sub_outs, ignore_index=True).drop_duplicates()
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)
            else:
                yield pd.DataFrame(
                    columns=["repo", "path", "commit", "lang", "mention_type", "name"]
                )

    return repos.select("repo", "path", "commit", "lang", "content").mapInPandas(
        extract, schema=MENTION_SCHEMA
    )


def extract_mentions(repos: DataFrame, engine: str = "sql") -> DataFrame:
    """(repo, path, commit, lang, mention_type, name) — one row per hit."""
    if engine == "sql":
        return _mentions_sql(repos)
    if engine == "pandas":
        return _mentions_pandas(repos)
    raise ValueError(f"unknown extraction engine: {engine!r}")


def _file_iri() -> Column:
    return F.format_string("kg:file/%s/%s@%s", F.col("repo"), F.col("path"), F.col("commit"))


def extract_triples(repos: DataFrame, engine: str = "sql") -> DataFrame:
    """Full stage-1 output: metadata triples (columnar, no parsing) ∪
    mention triples (regex engines above), deduplicated.

    Scale notes: the metadata arm is a pure projection; the mention arm
    is scan → regex → explode (no shuffle until the final dedup, which
    is a hash-aggregate on the natural output partitioning).
    """
    file_iri = _file_iri()
    repo_iri = F.format_string("kg:repo/%s", F.col("repo"))
    meta = repos.select(
        F.explode(
            F.array(
                F.struct(
                    repo_iri.alias("subj"),
                    F.lit(PRED_HAS_FILE).alias("pred"),
                    file_iri.alias("obj"),
                    F.lit(KIND_IRI).alias("obj_kind"),
                ),
                F.struct(
                    file_iri.alias("subj"),
                    F.lit(PRED_AT_COMMIT).alias("pred"),
                    F.col("commit").alias("obj"),
                    F.lit(KIND_LITERAL).alias("obj_kind"),
                ),
                F.struct(
                    file_iri.alias("subj"),
                    F.lit(PRED_IN_LANG).alias("pred"),
                    F.format_string("kg:lang/%s", F.col("lang")).alias("obj"),
                    F.lit(KIND_IRI).alias("obj_kind"),
                ),
            )
        ).alias("t"),
        F.col("repo").alias("src_repo"),
        F.col("path").alias("src_path"),
        F.col("commit").alias("src_commit"),
    ).select("t.subj", "t.pred", "t.obj", "t.obj_kind", "src_repo", "src_path", "src_commit")

    mentions = extract_mentions(repos, engine=engine)
    pred = (
        F.when(F.col("mention_type") == "imports", F.lit(PRED_IMPORTS))
        .when(F.col("mention_type") == "provides", F.lit(PRED_PROVIDES))
        .when(F.col("mention_type") == "defines", F.lit(PRED_DEFINES))
        .otherwise(F.lit(PRED_USES))
    )
    obj = F.when(
        F.col("mention_type").isin("imports", "provides"),
        F.concat(F.lit("kg:mod/"), F.col("name")),
    ).otherwise(F.format_string("kg:sym/%s/%s", F.col("lang"), F.col("name")))
    mention_triples = mentions.select(
        _file_iri().alias("subj"),
        pred.alias("pred"),
        obj.alias("obj"),
        F.lit(KIND_IRI).alias("obj_kind"),
        F.col("repo").alias("src_repo"),
        F.col("path").alias("src_path"),
        F.col("commit").alias("src_commit"),
    )
    # Set semantics WITHOUT a global dropDuplicates shuffle: every triple
    # carries (src_repo, src_path, src_commit), and that provenance key is
    # unique per source row — so duplicates can only arise within one row
    # (a mention matched twice in the same file). Those are removed
    # row-locally (array_distinct in the SQL engine, drop_duplicates per
    # sub-batch in the pandas engine), which makes extraction a pure
    # narrow map: at corpus scale this is the difference between
    # shuffling the whole triple table once and not shuffling at all.
    out = meta.unionByName(mention_triples)
    return out.withColumn("graph", F.format_string("kg:graph/%s", F.col("src_repo")))
