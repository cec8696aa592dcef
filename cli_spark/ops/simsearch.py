"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk`   brute-force top-k — the exact baseline. Dot
  products are computed JVM-side with ``F.aggregate``/``zip_with`` in a
  fixed left-to-right fold (deterministic doubles, oracle-comparable).
- :func:`lsh_topk`      random-hyperplane LSH: sign-bit signatures from
  deterministic pseudo-hyperplanes (hash-derived, no RNG state), probe
  by bucket equi-join, exact re-rank inside buckets. The scale path: the
  candidate set per query is the bucket population, not the corpus.
- :func:`ivf_topk`      IVF-style probing with hash-partition "cells"
  (a stand-in for k-means centroids that keeps determinism): re-rank
  only within the probed cells.

Scale notes: brute force is a broadcast of the (small) query set against
a full scan — one pass, no shuffle; LSH replaces the scan with a
bucket-join whose right side is ~corpus/2^bits per probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

__all__ = ["cosine_topk", "lsh_topk", "ivf_topk", "with_norm"]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rnk) — exact brute force.

    The query side is broadcast; the corpus is scanned once. Ranking
    ties break on neighbor id (deterministic)."""
    q = with_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .withColumnRenamed("_norm", "qnorm"),
        "qv",
    ).withColumnRenamed("_norm", "qnorm")
    c = with_norm(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        "cv",
    ).withColumnRenamed("_norm", "cnorm")
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def _hyperplane_sig(vec_col: str, bits: int, dim: int):
    """Sign-bit signature against `bits` deterministic pseudo-hyperplanes.

    Hyperplane component (b, d) = centered 16-bit value derived from
    xxhash64 of the literal string "b:d" — reproducible on any cluster
    with zero driver state shipped.
    """
    def plane_dot(b: int):
        acc = F.lit(0.0)
        for d in range(dim):
            w = (F.xxhash64(F.lit(f"{b}:{d}")) % 65536 - 32768).cast("double")
            acc = acc + w * F.element_at(F.col(vec_col), d + 1).cast("double")
        return acc

    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig.bitwiseOR(
            F.shiftleft(F.when(plane_dot(b) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), b)
        )
    return sig


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: bucket on hyperplane sign signature, exact
    re-rank within the query's bucket. Recall is bucket-bound; raise
    `bits` for selectivity, add multi-probe by flipping one bit."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    sig = _hyperplane_sig(vec_col, bits, dim)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), sig.alias("bucket")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        _hyperplane_sig(vec_col, bits, dim).alias("bucket"),
    )
    # multi-probe: query also probes buckets at Hamming distance 1
    probes = q.select(
        "query_id", "qv",
        F.explode(
            F.array(F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << b)) for b in range(bits)])
        ).alias("bucket"),
    )
    qn = with_norm(probes, "qv").withColumnRenamed("_norm", "qnorm")
    cn = with_norm(c, "cv").withColumnRenamed("_norm", "cnorm")
    scored = (
        qn.join(cn, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot("qv", "cv") / (F.col("qnorm") * F.col("cnorm")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style: assign vectors to `n_cells` deterministic cells (hash of
    the dominant-component index — a centroid-free stand-in), probe the
    query's `n_probe` nearest cells, exact re-rank inside."""
    dim_arr = F.transform(
        F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
        lambda i: F.abs(F.element_at(F.col(vec_col), i + 1)),
    )
    dominant = F.array_position(dim_arr, F.array_max(dim_arr)) - 1
    cell = F.pmod(dominant, F.lit(n_cells))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), cell.alias("cell")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_probe - 1)),
                lambda p: F.pmod(cell + p, F.lit(n_cells)),
            )
        ).alias("cell"),
    )
    qn = with_norm(q, "qv").withColumnRenamed("_norm", "qnorm")
    cn = with_norm(c, "cv").withColumnRenamed("_norm", "cnorm")
    scored = (
        qn.join(cn, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot("qv", "cv") / (F.col("qnorm") * F.col("cnorm")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )
