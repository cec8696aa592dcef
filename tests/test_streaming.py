"""Structured Streaming operators driven to completion with the memory
sink (bounded input ⇒ deterministic results; batch equivalents are the
cross-check, mirroring frames-as-micro-batches §2.9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cli_spark import streaming as S
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_stream(spark):
    return S.read_event_stream(spark, f"{SF_SMOKE}/events.parquet")


def test_windowed_counts_match_batch(spark, event_stream):
    S.run_to_memory_sink(
        S.windowed_event_counts(event_stream), "win_counts", output_mode="append"
    )
    got = spark.sql("SELECT * FROM win_counts")
    batch = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    # watermark may hold back the trailing window(s); everything emitted
    # must match the batch result exactly, and coverage must be substantial
    extra = got.exceptAll(batch).count()
    assert extra == 0
    assert got.count() >= batch.count() * 0.8


def test_session_counts_runs(spark, event_stream):
    S.run_to_memory_sink(S.session_counts(event_stream), "sess_counts")
    got = spark.sql("SELECT * FROM sess_counts")
    assert got.count() >= 0  # emitted sessions (watermark-bounded)
    assert set(got.columns) == {"session_start", "user_id", "n_events"}


def test_stateful_graph_runs(spark, event_stream):
    S.run_to_memory_sink(S.stateful_graph_runs(event_stream), "runs")
    got = spark.sql("SELECT * FROM runs")
    rows = got.collect()
    assert len(rows) > 0
    # cross-check against the batch gaps-and-islands computation (q24):
    # completed streamed runs must be a subset with identical lengths
    batch = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    boundary = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.col("event_type") != F.lag("event_type").over(w)),
        1,
    ).otherwise(0)
    runs_batch = (
        batch.withColumn("b", boundary)
        .withColumn(
            "rid", F.sum("b").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)) - 1
        )
        .groupBy("user_id", "rid", "event_type")
        .agg(F.count(F.lit(1)).alias("run_length"))
    )
    got_k = got.select("user_id", F.col("run_id").cast("long").alias("rid"),
                       "event_type", F.col("run_length").cast("long").alias("run_length"))
    bad = got_k.join(
        runs_batch.select("user_id", "rid", "event_type",
                          F.col("run_length").cast("long").alias("run_length")),
        ["user_id", "rid", "event_type", "run_length"],
        "left_anti",
    ).count()
    assert bad == 0


def test_streaming_dedup(spark, tmp_path):
    """Exact dedup across micro-batches: every distinct digest is
    emitted exactly once; duplicates arriving in LATER micro-batches
    are suppressed by keyed state (one counter per distinct digest)."""
    import os

    d = str(tmp_path / "docs")
    os.makedirs(d)
    # two files = two micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame(
        [(0, "A"), (1, "B"), (2, "C"), (3, "A"), (4, "B")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(d + "/f1")
    spark.createDataFrame(
        [(5, "A"), (6, "D"), (7, "B"), (8, "E"), (9, "C")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(d + "/f2")
    # stream the two parts as one dir source
    schema = spark.read.parquet(d + "/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    S.run_to_memory_sink(S.streaming_dedup(stream), "dedup_out")
    got = {(r.digest, r.doc_id) for r in spark.sql("SELECT * FROM dedup_out").collect()}
    # exactly one row per distinct text, regardless of batch order
    assert len(got) == 5
    texts = spark.createDataFrame(
        [(t,) for t in "ABCDE"], "text string"
    ).select(F.sha2(F.col("text"), 256).alias("digest")).collect()
    assert {r.digest for r in texts} == {g for g, _ in got}
    # the kept id for each digest is the min doc_id of whichever batch
    # saw the digest first — for A/B/C that is file 1 or file 2; D/E
    # only exist in file 2
    kept = dict((g, i) for g, i in got)
    by_text = {t: kept[r.digest] for t, r in zip("ABCDE", texts)}
    assert by_text["D"] == 6 and by_text["E"] == 8
    assert by_text["A"] in (0, 3, 5) and by_text["B"] in (1, 4, 7) and by_text["C"] in (2, 9)


def test_streaming_lsh_candidates_match_batch(spark, tmp_path):
    """Streaming LSH candidate pairs (distinct) equal the batch
    candidate set (minhash_lsh_pairs at threshold 0) on the same docs,
    regardless of how the corpus splits into micro-batches — the
    row-local streaming signature is bit-identical to the batch one,
    and the stateful bucket clique reproduces the bucket join."""
    import os

    from cli_spark.ops.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog and runs far away"
    rows = []
    for i in range(8):
        rows.append((i, base + f" tail {i % 2}"))          # two near-dup groups
    rows += [(20, "completely different text about spark streaming state"),
             (21, "completely different text about spark streaming state"),
             (30, "a unique singleton document with no relatives at all")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    d = str(tmp_path / "docs")
    os.makedirs(d)
    # split across two files = two micro-batches, interleaving the groups
    df.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(d + "/f1")
    df.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(d + "/f2")
    schema = spark.read.parquet(d + "/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    S.run_to_memory_sink(S.streaming_lsh_candidates(stream), "lsh_out")
    got = {
        (r.left_id, r.right_id)
        for r in spark.sql("SELECT * FROM lsh_out").collect()
    }
    want = {
        (r.left_id, r.right_id)
        for r in minhash_lsh_pairs(df, "doc_id", "text", threshold=0.0).collect()
    }
    assert got == want
    assert len(want) > 0  # the fixture really produces candidates


def test_streaming_lsh_bucket_cap(spark, tmp_path):
    """A bucket beyond max_bucket stops banding: with 5 identical docs
    and max_bucket=3, only the first 3 arrivals pair (3 choose 2)."""
    import os

    d = str(tmp_path / "docs")
    os.makedirs(d)
    spark.createDataFrame(
        [(i, "same words every single time for all docs") for i in range(5)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(d + "/f1")
    schema = spark.read.parquet(d + "/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    S.run_to_memory_sink(
        S.streaming_lsh_candidates(stream, max_bucket=3), "lsh_cap_out"
    )
    got = {
        (r.left_id, r.right_id)
        for r in spark.sql("SELECT * FROM lsh_cap_out").collect()
    }
    # ids 0,1,2 enter each bucket (ascending order within the trigger)
    assert got == {(0, 1), (0, 2), (1, 2)}


def test_streaming_decontaminate_matches_batch(spark, tmp_path):
    """Contaminated-id set from the stream-static join equals the batch
    decontaminate() ids on the same data (same gram recipe and hashes),
    regardless of micro-batch splits."""
    import os

    from cli_spark.ops.dedup import decontaminate

    bench = spark.createDataFrame(
        [(0, "the secret benchmark question about ancient rome empire"),
         (1, "compute the derivative of x squared plus three x")],
        "doc_id long, text string",
    )
    rows = [
        (10, "notes on the secret benchmark question about ancient rome empire and more"),
        (11, "a completely unrelated training document about cooking pasta"),
        (12, "students must compute the derivative of x squared plus three x today"),
        (13, "another innocent doc with no overlap whatsoever in any span"),
        (14, "short doc"),
    ]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "train")
    os.makedirs(d)
    train.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(d + "/f1")
    train.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(d + "/f2")
    schema = spark.read.parquet(d + "/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    S.run_to_memory_sink(S.streaming_decontaminate(stream, bench), "decon_out")
    got = {r.id for r in spark.sql("SELECT * FROM decon_out").collect()}
    want = {r.id for r in decontaminate(train, bench, "doc_id", "text").collect()}
    assert got == want
    assert want == {10, 12}


def test_streaming_semantic_dedup_matches_batch(spark, tmp_path):
    """Streaming semantic dedup equals the batch operator
    (ops.simsearch.semantic_dedup) on the same vectors and the same
    centroid codebook when ids arrive in ascending order across
    micro-batches — keep flags, cells, and overflow all agree."""
    import os

    import numpy as np

    from cli_spark.ops.simsearch import semantic_dedup

    rng = np.random.default_rng(11)
    base = rng.standard_normal((3, 8))
    rows = []
    for i in range(60):
        v = base[i % 3] + rng.standard_normal(8) * (0.05 if i % 4 else 2.0)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("cv")
    )

    d = str(tmp_path / "vecs")
    os.makedirs(d)
    # id-range split: arrival order across triggers IS id order
    df.filter(F.col("vec_id") < 30).coalesce(1).write.parquet(d + "/f1")
    df.filter(F.col("vec_id") >= 30).coalesce(1).write.parquet(d + "/f2")
    schema = spark.read.parquet(d + "/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    S.run_to_memory_sink(
        S.streaming_semantic_dedup(stream, cents, tau=0.9), "sem_out"
    )
    got = {
        r.id: (r.cell_id, r.keep, r.cell_overflow)
        for r in spark.sql("SELECT * FROM sem_out").collect()
    }
    want = {
        r.id: (r.cell_id, r.keep, r.cell_overflow)
        for r in semantic_dedup(df, tau=0.9, centroids=cents).collect()
    }
    assert got == want
    assert len(got) == 60
    kept = sum(1 for _, k, _ in got.values() if k)
    assert 0 < kept < 60  # both branches exercised


def test_streaming_semantic_dedup_cell_cap(spark, tmp_path):
    """Members beyond max_cell are emitted kept-but-flagged and are NOT
    admitted as dedup evidence (the batch kernel's countable-drop
    rule) — with max_cell=2 and 6 identical vectors, the 3rd..6th are
    overflow rows even though they'd be duplicates of the first."""
    import os

    vec = [1.0, 0.0, 0.0, 0.0]
    df = spark.createDataFrame(
        [(i, vec) for i in range(6)], "vec_id long, embedding array<double>"
    )
    cents = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("cv")
    )
    d = str(tmp_path / "capvecs")
    os.makedirs(d)
    df.coalesce(1).write.parquet(d + "/f1")
    schema = spark.read.parquet(d + "/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    S.run_to_memory_sink(
        S.streaming_semantic_dedup(stream, cents, tau=0.9, max_cell=2),
        "sem_cap_out",
    )
    got = {
        r.id: (r.keep, r.cell_overflow)
        for r in spark.sql("SELECT * FROM sem_cap_out").collect()
    }
    assert got[0] == (True, False)
    assert got[1] == (False, False)  # dup of 0, inside the cap
    for i in (2, 3, 4, 5):
        assert got[i] == (True, True)  # kept un-deduped, flagged
