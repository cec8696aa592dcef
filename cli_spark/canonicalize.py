"""Stage 3 — IRI canonicalization via iterative hash-min connected
components (SURVEY.md §4 custom machinery #1; north rule: "checkpointed
DataFrame loop, no GraphFrames dependency").

Given sameAs edges, computes per-node component = min IRI reachable,
then rewrites triple subjects/objects through the component map.

Algorithm (hash-min / label propagation):
    label(v) ← v
    repeat: label(v) ← min(label(v), min_{(u,v)∈E} label(u))
until no label changes. Converges in O(diameter) rounds; each round is
one join + one groupBy-min. ``localCheckpoint()`` truncates lineage per
round so plans don't grow exponentially — the fixpoint Catalyst cannot
express (SURVEY.md §4).

Scale: labels table is (node, label) — far smaller than the triple
table; the expensive join is labels⋈edges on node, hash-partitioned
once and reused. The final rewrite joins the (usually tiny) non-trivial
component map against triples — broadcast when it fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERATIONS = 50


def connected_components(edges: DataFrame, max_iter: int = MAX_ITERATIONS) -> DataFrame:
    """edges(src, dst) undirected → (node, component) with component =
    lexicographic min node id in the component."""
    sym = edges.select(F.col("src"), F.col("dst")).unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node")).localCheckpoint()
    sym = sym.localCheckpoint()

    for _ in range(max_iter):
        # (1) hash-min: candidate labels flowing along edges
        neighbor_min = (
            sym.join(labels, sym.src == labels.node)
            .select(F.col("dst").alias("node"), F.col("label"))
            .groupBy("node")
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                "cand"
            ),
            "label",
        )
        # (2) pointer jump: label(label(v)) — shortcut through the current
        # label table so chains converge in O(log diameter) rounds instead
        # of O(diameter) (plain min-propagation walks one hop per round).
        lookup = labels.select(
            F.col("node").alias("cand"), F.col("label").alias("cand_label")
        )
        # Checkpoint BEFORE the convergence count: counting first would
        # execute the round's joins once for the count and again for the
        # checkpoint — doubling every round's work. After the (eager)
        # checkpoint the count is a scan of local blocks.
        new_labels = stepped.join(lookup, "cand", "left").select(
            "node",
            F.least(F.col("cand"), F.coalesce(F.col("cand_label"), F.col("cand"))).alias(
                "new_label"
            ),
            "label",
        ).localCheckpoint()
        changed = new_labels.filter(F.col("new_label") != F.col("label")).count()
        labels = new_labels.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def canonical_map(same_as: DataFrame) -> DataFrame:
    """sameAs triples → (iri, canonical_iri) for non-trivial entries only
    (identity rows omitted so the rewrite join stays small)."""
    edges = same_as.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    comps = connected_components(edges)
    return comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("iri"), F.col("component").alias("canonical_iri")
    )


def rewrite_triples(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subj and obj through the canonical map (left joins keep
    unmapped IRIs); literals (obj_kind != 0) are never rewritten."""
    m_subj = mapping.select(
        F.col("iri").alias("subj"), F.col("canonical_iri").alias("subj_canon")
    )
    m_obj = mapping.select(
        F.col("iri").alias("obj"), F.col("canonical_iri").alias("obj_canon")
    )
    out = (
        triples.join(F.broadcast(m_subj), "subj", "left")
        .join(F.broadcast(m_obj), "obj", "left")
        .select(
            F.coalesce(F.col("subj_canon"), F.col("subj")).alias("subj"),
            F.col("pred"),
            F.when(F.col("obj_kind") == 0, F.coalesce(F.col("obj_canon"), F.col("obj")))
            .otherwise(F.col("obj"))
            .alias("obj"),
            F.col("obj_kind"),
            *[c for c in triples.columns if c not in ("subj", "pred", "obj", "obj_kind")],
        )
    )
    return out
