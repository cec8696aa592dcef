"""``rdf inspect`` as Spark jobs (SURVEY.md §2.4 A1-A6): per-frame and
aggregate row-kind metrics over a frames/rows table, term×node-kind
detail with the three report granularities, YAML rendering driver-side
(the reference prints YAML — MetricsPrinter.scala:258-293)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .jelly import KIND_NAME, KIND_OPTIONS, KIND_TRIPLE


def per_frame_metrics(rows: DataFrame, use_size: bool = False) -> DataFrame:
    """(seg, frame_index, option_count, name_count, triple_count,
    row_count[, *_size]) — A1 counters; `use_size` switches to the
    SizeStatistic strategy (A2): serialized byte size instead of count."""
    if use_size:
        weight = (
            F.when(F.col("row_kind") == KIND_NAME, F.length(F.coalesce("name", F.lit(""))) + 4)
            .when(
                F.col("row_kind") == KIND_TRIPLE,
                # 4 ref varints + o_kind + dt ref + langtag bytes
                F.lit(16) + F.length(F.coalesce("obj_lang", F.lit(""))) + 2,
            )
            .otherwise(F.lit(8))
        )
    else:
        weight = F.lit(1)
    return (
        rows.withColumn("_w", weight)
        .groupBy("seg", "frame_index")
        .agg(
            F.sum(F.when(F.col("row_kind") == KIND_OPTIONS, F.col("_w")).otherwise(0)).alias(
                "option_count"
            ),
            F.sum(F.when(F.col("row_kind") == KIND_NAME, F.col("_w")).otherwise(0)).alias(
                "name_count"
            ),
            F.sum(F.when(F.col("row_kind") == KIND_TRIPLE, F.col("_w")).otherwise(0)).alias(
                "triple_count"
            ),
            F.sum("_w").alias("row_count"),
        )
    )


def aggregate_metrics(rows: DataFrame, use_size: bool = False) -> dict:
    """Global roll-up (A3: the FrameInfo `+=` merge is Spark's
    partial+final agg). Driver-side dict, one row."""
    pf = per_frame_metrics(rows, use_size)
    r = pf.agg(
        F.count(F.lit(1)).alias("frame_count"),
        F.sum("option_count").alias("option_count"),
        F.sum("name_count").alias("name_count"),
        F.sum("triple_count").alias("triple_count"),
        F.sum("row_count").alias("row_count"),
    ).collect()[0]
    return {k: int(v) for k, v in r.asDict().items()}


def term_detail(triples: DataFrame) -> DataFrame:
    """(term_pos, node_kind, n) with GROUPING SETS — A4 node-kind detail
    × A5 granularities (all / by node / by term). node_kind follows the
    NodeDetailInfo taxonomy (0=iri, 1=bnode, 2=literal)."""
    kind_of = lambda c: F.when(F.col(c).startswith("_:"), F.lit(1)).otherwise(F.lit(0))  # noqa: E731
    terms = (
        triples.select(F.lit("subject").alias("term_pos"), kind_of("subj").alias("node_kind"))
        .unionAll(triples.select(F.lit("predicate"), kind_of("pred")))
        .unionAll(
            triples.select(
                F.lit("object"),
                F.coalesce(F.col("obj_kind").cast("int"), kind_of("obj")).alias("k"),
            )
        )
    )
    terms.createOrReplaceTempView("_term_detail")
    return triples.sparkSession.sql(
        """
        SELECT term_pos, node_kind, COUNT(*) AS n FROM _term_detail
        GROUP BY GROUPING SETS ((term_pos, node_kind), (term_pos), (node_kind))
        """
    )


def render_yaml(metrics: dict) -> str:
    """Tiny YAML renderer (scalars + nested dicts/lists) mirroring
    YamlDocBuilder (cli/util/io/YamlDocBuilder.scala:5-89) — driver-side,
    metrics are small aggregates."""

    def esc(s: str) -> str:
        if any(ch in s for ch in '\\"\n\r\t') or s != s.strip():
            return '"' + s.replace("\\", "\\\\").replace('"', '\\"').replace(
                "\n", "\\n"
            ).replace("\r", "\\r").replace("\t", "\\t") + '"'
        return s

    def walk(v, indent: int) -> str:
        pad = "  " * indent
        if isinstance(v, dict):
            return "\n".join(
                f"{pad}{k}:" + (walk(x, indent + 1) if isinstance(x, (dict, list)) else f" {walk(x, 0)}")
                for k, x in v.items()
            )
        if isinstance(v, list):
            return "\n".join(f"{pad}- {walk(x, 0)}" for x in v)
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, str):
            return esc(v)
        return str(v)

    return walk(metrics, 0) + "\n"
