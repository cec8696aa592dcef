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
    lexicographic min node id in the component.

    The fixpoint loop runs on **order-preserving dense long ids**, not
    the IRI strings: every round shuffles the label table O(rounds)
    times, and 8-byte keys shuffle ~8× less than ~60-char IRIs (and
    hash/compare without allocation). The ids come from
    :func:`cli_spark.order.global_row_number` (range-partition + local
    rank + partition offsets — no single-task sort), so id order ==
    string order. Order preservation is not cosmetic: with ids assigned
    in key order, the pointer-jump step doubles the propagation distance
    every round (label(v) always points at an id whose own label is at
    least as far along), keeping convergence at O(log diameter). With
    randomly-ordered ids (e.g. hashes) the jump target's label is
    uncorrelated with progress and the loop degrades to O(diameter) —
    measured 60+ rounds on a 64-node chain. Strings surface only in the
    one-time encode joins and the final decode.
    """
    sym_str = edges.select(F.col("src"), F.col("dst")).unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    from .order import global_row_number

    # node_map is NOT re-materialized here: global_row_number already
    # persists its ranked partitions, so the map/decode projections
    # below are cheap scans over those cached blocks. (An extra
    # localCheckpoint doubled the setup barrier count for no lineage
    # benefit — node_map never iterates.)
    node_map = global_row_number(
        sym_str.select(F.col("src").alias("node")).distinct(), ["node"], rn_col="nid"
    )
    src_ids = node_map.select(F.col("node").alias("src"), F.col("nid").alias("src_id"))
    dst_ids = node_map.select(F.col("node").alias("dst"), F.col("nid").alias("dst_id"))
    sym = (
        sym_str.join(src_ids, "src")
        .join(dst_ids, "dst")
        .select(F.col("src_id").alias("src"), F.col("dst_id").alias("dst"))
        .localCheckpoint()
    )
    # labels round 0 is a projection of the persisted rank table; only
    # per-round outputs need checkpointing (they are what iterates)
    labels = node_map.select(F.col("nid").alias("node")).withColumn(
        "label", F.col("node")
    )

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
        # The convergence count rides INSIDE the checkpoint job as an
        # observed metric — one action per round, not checkpoint+count.
        # (The eager localCheckpoint is the round's single execution;
        # CollectMetrics folds the changed-row count into that same
        # pass, so convergence detection costs zero extra jobs.)
        from pyspark.sql import Observation

        obs = Observation()
        new_labels = stepped.join(lookup, "cand", "left").select(
            "node",
            F.least(F.col("cand"), F.coalesce(F.col("cand_label"), F.col("cand"))).alias(
                "new_label"
            ),
            "label",
        ).observe(
            obs,
            F.sum(
                (F.col("new_label") != F.col("label")).cast("long")
            ).alias("changed"),
        ).localCheckpoint()
        changed = obs.get["changed"] or 0
        labels = new_labels.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    # Decode: ids are order-preserving, so min id == lexicographic-min
    # IRI — two joins against the id map, no extra aggregation.
    names = node_map.select(F.col("nid"), F.col("node").alias("name"))
    return (
        labels.join(names.withColumnRenamed("nid", "node"), "node")
        .join(
            names.select(
                F.col("nid").alias("label"), F.col("name").alias("component")
            ),
            "label",
        )
        .select(F.col("name").alias("node"), "component")
    )


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
    unmapped IRIs); literals (obj_kind != 0) are never rewritten.

    No broadcast hint: on a near-dup-heavy corpus the non-trivial
    canonical map is unbounded (tens of GB at 100 TB), so forcing a
    broadcast risks executor OOM. AQE picks broadcast at runtime when
    the map's actual size is under autoBroadcastJoinThreshold, and a
    shuffle hash join otherwise — the safe default at every scale."""
    m_subj = mapping.select(
        F.col("iri").alias("subj"), F.col("canonical_iri").alias("subj_canon")
    )
    m_obj = mapping.select(
        F.col("iri").alias("obj"), F.col("canonical_iri").alias("obj_canon")
    )
    out = (
        triples.join(m_subj, "subj", "left")
        .join(m_obj, "obj", "left")
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
