"""Structured Streaming re-expression of the reference's stream-order
semantics (SURVEY.md §2.9): frames are micro-batches, graph runs are
sessions, decoder dictionary state is keyed streaming state.

- :func:`read_event_stream`     bounded parquet dir as a stream (tests drive
  it with the memory sink + processAllAvailable)
- :func:`windowed_event_counts` tumbling event-time window + watermark (W2
  analog with real event time instead of row count)
- :func:`session_counts`        session windows (the graph-run/sessionization
  shape, W3)
- :func:`stateful_graph_runs`   applyInPandasWithState port of the reference's
  GRAPHS-encoding state machine (JellyStreamWriterGraphs.scala:57-72):
  per-key run-length tracking with explicit state — emits one row per
  completed run boundary.
- :func:`streaming_dedup`       stateful exact dedup across micro-batches
  (one keyed counter per distinct content digest, optional TTL).
- :func:`streaming_semantic_dedup` SemDeDup-at-ingest: static centroid
  codebook closed over (zero-shuffle argmax cell assignment), one
  stateful op keyed by cell holding the capped normalized member
  matrix — the streaming form of ops.simsearch.semantic_dedup.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", StringType()),  # overridden by parquet schema on read
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """Stream the events table: schema from a batch peek (streaming reads
    require an explicit schema), one file per micro-batch. A single-file
    path is streamed via its parent dir + glob (the source requires a
    directory basePath)."""
    import os

    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.parquet(path)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time aggregation with late-data watermark."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user — the streaming form of q06 sessionize."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("s"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


RUN_STATE_SCHEMA = StructType(
    [
        StructField("current_type", StringType()),
        StructField("run_length", IntegerType()),
        StructField("run_id", IntegerType()),
    ]
)
RUN_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("run_id", IntegerType()),
        StructField("event_type", StringType()),
        StructField("run_length", IntegerType()),
    ]
)


def stateful_graph_runs(events: DataFrame, flush_timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful operator: per-user run-length encoding of
    consecutive equal event_types — the reference's handleGraph state
    machine (emit GraphEnd/GraphStart on change) as keyed streaming
    state. Emits completed runs; the open run stays in state across
    micro-batches.

    ``flush_timeout_ms`` arms a ProcessingTimeTimeout that flushes open
    runs after idle time — for long-lived production streams. Leave it
    None for bounded drives: timeout re-arming keeps scheduling
    state-cleanup micro-batches, so ``processAllAvailable`` never
    settles (observed: an endless "No new data but cleaning up state"
    loop on Spark 4.1).
    """

    def fn(
        key: tuple,
        batches: Iterator["pd.DataFrame"],
        state,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                cur_type, run_len, run_id = state.get
                state.remove()
                yield pd.DataFrame(
                    [(user_id, run_id, cur_type, run_len)],
                    columns=["user_id", "run_id", "event_type", "run_length"],
                )
            return
        cur_type, run_len, run_id = (None, 0, 0)
        if state.exists:
            cur_type, run_len, run_id = state.get
        out = []
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "event_id"])
            for et in pdf["event_type"]:
                if et == cur_type:
                    run_len += 1
                else:
                    if cur_type is not None:
                        out.append((user_id, run_id, cur_type, run_len))
                        run_id += 1
                    cur_type, run_len = et, 1
        state.update((cur_type, run_len, run_id))
        if flush_timeout_ms:
            state.setTimeoutDuration(flush_timeout_ms)
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "run_id", "event_type", "run_length"]
            )

    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=RUN_OUTPUT_SCHEMA,
            stateStructType=RUN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="ProcessingTimeTimeout" if flush_timeout_ms else "NoTimeout",
        )
    )


DEDUP_STATE_SCHEMA = StructType([StructField("n_seen", LongType())])
DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("digest", StringType()),
        StructField("doc_id", LongType()),
    ]
)


def streaming_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Stateful streaming EXACT dedup: emit each distinct content digest
    once — the first row that carries it — and drop every later
    duplicate, across micro-batches (the streaming form of the batch
    exact-dedup q32; the reference's stream semantics never re-emit a
    dictionary entry either, W5).

    Scale: keyed on the sha-256 digest, so state is one tiny counter per
    DISTINCT document and the state store shards across executors by
    key hash — no coordination, no global structure. For unbounded
    production streams pass ``ttl_ms`` to expire idle digests via
    ProcessingTimeTimeout (trading exactness for bounded state, the
    standard streaming-dedup compromise; None keeps bounded test drives
    settleable, same caveat as :func:`stateful_graph_runs`)."""
    keyed = docs.select(
        F.sha2(F.col(text_col).cast("string"), 256).alias("digest"),
        F.col(id_col).cast("long").alias("doc_id"),
    )

    def fn(
        key: tuple,
        batches: Iterator["pd.DataFrame"],
        state,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (digest,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n_seen = state.get[0] if state.exists else 0
        emit = n_seen == 0  # digest unseen before this trigger
        first: int | None = None
        for pdf in batches:
            if emit and len(pdf):
                # running min across ALL chunks of the trigger, so the
                # survivor id is chunk-boundary independent
                m = int(pdf["doc_id"].min())
                first = m if first is None else min(first, m)
            n_seen += len(pdf)
        state.update((n_seen,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        if first is not None:
            yield pd.DataFrame([(digest, first)], columns=["digest", "doc_id"])

    return keyed.groupBy("digest").applyInPandasWithState(
        fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout" if ttl_ms else "NoTimeout",
    )


LSH_STATE_SCHEMA = StructType(
    [StructField("members", ArrayType(LongType()))]
)
LSH_OUTPUT_SCHEMA = StructType(
    [
        StructField("left_id", LongType()),
        StructField("right_id", LongType()),
    ]
)


def _row_local_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int,
    n: int = 3,
) -> DataFrame:
    """(id, sig array<long>) with ZERO shuffles — the streaming-legal
    form of :func:`cli_spark.ops.dedup.minhash_signatures` (which
    dedups shingles and groupBy-min-aggregates them; neither is allowed
    before a stateful operator). Shingle hashes stay a per-row array and
    each permutation is an ``array_min(transform(...))``; duplicate
    shingles are harmless under MIN, so the signatures are bit-identical
    to the batch path (same gram text, same xxhash64→Mersenne domain,
    same 2-universal parameters)."""
    from .linking import MERSENNE, _perm_params  # noqa: PLC0415

    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    # materialize each HOF input as a real column first: Catalyst does
    # not CSE through higher-order functions (cf. linking.py)
    step = df.select(F.col(id_col).cast("long").alias("id"), words.alias("words"))
    size = F.size(F.col("words"))
    grams = F.when(
        size >= n,
        F.transform(
            F.sequence(F.lit(0), size - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(F.col("words"), i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array(F.concat_ws(" ", F.col("words"))))
    step = step.select("id", grams.alias("grams"))
    hs = F.transform(
        F.col("grams"), lambda g: F.pmod(F.xxhash64(g), F.lit(MERSENNE))
    )
    step = step.select("id", hs.alias("hs"))

    def perm_min(a: int, b: int):
        # factory keeps the lambda unary (F.transform passes (elem, idx))
        return F.array_min(
            F.transform(
                F.col("hs"),
                lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(MERSENNE)),
            )
        )

    sig = F.array(*[perm_min(a, b) for a, b in _perm_params(num_perm)])
    return step.select("id", sig.alias("sig"))


def streaming_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    band_rows: int = 4,
    max_bucket: int = 20,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming MinHash-LSH near-dup CANDIDATE pairs: as documents
    arrive, emit (left_id, right_id) for every pair that shares an LSH
    band bucket — the streaming form of the batch
    :func:`cli_spark.ops.dedup.minhash_lsh_pairs` candidate stage, for
    dedup-at-ingest instead of dedup-as-a-batch-pass.

    Shape: signature + banding are one narrow zero-shuffle map
    (:func:`_row_local_minhash` + the same band-hash recipe as batch),
    then ONE stateful operator keyed by (band_id, band_hash). State per
    bucket is the member-id list capped at ``max_bucket`` (the batch
    cap, arrival-ordered instead of id-ordered): ≤ 20 longs per distinct
    bucket, sharded across executors by key hash — no global structure,
    no join. Each new member emits pairs against the existing members
    (the within-bucket clique, incrementally).

    Same-pair emissions can repeat ACROSS bands (batch dedups them with
    a ``distinct()``, which streaming append mode cannot add after a
    stateful op without a second state store); downstream consumers
    dedup, or the connected-components clustering absorbs repeats.
    ``ttl_ms`` expires idle buckets for unbounded streams (same
    compromise as :func:`streaming_dedup`)."""
    sigs = _row_local_minhash(docs, id_col, text_col, num_perm)
    n_bands = num_perm // band_rows
    bands = sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.slice("sig", b * band_rows + 1, band_rows))
                ),
            )
        ).alias("band_id", "band_hash"),
    )

    def fn(
        key: tuple,
        batches: Iterator["pd.DataFrame"],
        state,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        members: list[int] = list(state.get[0]) if state.exists else []
        seen = set(members)
        pairs: list[tuple[int, int]] = []
        for pdf in batches:
            # ascending id order makes the emitted pair set independent
            # of chunk boundaries within a trigger
            for i in sorted(int(x) for x in pdf["id"]):
                if i in seen:
                    continue
                if len(members) >= max_bucket:
                    break  # the batch cap: over-full buckets stop banding
                pairs.extend(
                    (m, i) if m < i else (i, m) for m in members
                )
                members.append(i)
                seen.add(i)
        state.update((members,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        if pairs:
            yield pd.DataFrame(pairs, columns=["left_id", "right_id"])

    return bands.groupBy("band_id", "band_hash").applyInPandasWithState(
        fn,
        outputStructType=LSH_OUTPUT_SCHEMA,
        stateStructType=LSH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout" if ttl_ms else "NoTimeout",
    )


def streaming_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Decontaminate-at-ingest: flag every streaming TRAINING document
    that shares at least one word ``n``-gram with the static BENCHMARK
    set — the streaming form of :func:`cli_spark.ops.dedup.decontaminate`
    (same gram recipe, same wide 64-bit hashes), for filtering eval
    contamination as a corpus is ingested rather than in a batch pass.

    Shape: the stream side is a zero-shuffle explode (per-row gram
    array, no pre-distinct); the benchmark side is a bounded eval suite,
    so its distinct gram set is a STATIC broadcast — a stream-static
    join is stateless in Structured Streaming. The only state is the
    ``dropDuplicates`` on the flagged ids (hits are rare by
    construction; one key per contaminated doc).

    Returns a streaming DataFrame of (id) — contaminated document ids,
    append mode, each id once."""
    from .ops.dedup import shingles  # noqa: PLC0415

    # Same gram recipe as the batch form — literally the same function
    # (distinct=False keeps the stream side a stateless zero-shuffle
    # explode), so the two paths cannot drift. Empty docs are dropped on
    # both sides: an empty doc shares no content, and the whole-doc
    # fallback would otherwise hash both sides to xxhash64("").
    nonempty = F.trim(F.col(text_col)) != ""
    tg = shingles(
        train.filter(nonempty).withColumn(
            id_col, F.col(id_col).cast("long")
        ),
        id_col, text_col, n, distinct=False, wide=True,
    )
    bg = F.broadcast(
        shingles(bench.filter(nonempty), id_col, text_col, n, wide=True)
        .select("h")
    )
    return tg.join(bg, "h", "left_semi").select("id").dropDuplicates(["id"])


def streaming_semantic_dedup(
    docs: DataFrame,
    centroids: DataFrame,
    tau: float = 0.6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int = 1024,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Semantic dedup at ingest: the streaming form of
    :func:`cli_spark.ops.simsearch.semantic_dedup` (SemDeDup-style).
    Every arriving vector is assigned to its argmax-cosine cell of a
    STATIC centroid codebook, then checked against the cell's earlier
    members — ``keep`` is false iff some earlier member reaches cosine
    ``tau``. "Earlier" is arrival order (ascending id within a trigger);
    when ids arrive in ascending order this equals the batch operator's
    earlier-by-id rule exactly (the differential test drives both).

    Shape: the codebook is bounded (an IVF index's centroid table), so
    it is collected once at graph-build time and closed over — cell
    assignment is a zero-shuffle vectorized pandas UDF, argmax with the
    same lowest-cell-id tie-break as ``assign_cells``. Then ONE stateful
    operator keyed by cell_id; state per cell is (member ids, flattened
    L2-NORMALIZED member matrix), capped at ``max_cell`` rows (state ≈
    max_cell × dim doubles per cell — the streaming cap defaults lower
    than batch because the state store holds the vectors themselves;
    quantize upstream for tighter state). Members beyond the cap are
    emitted kept-but-flagged ``cell_overflow`` and NOT admitted as
    future dedup evidence — the batch kernel's countable-drop rule.
    ``ttl_ms`` expires idle cells for unbounded streams."""
    import numpy as np

    crows = sorted(centroids.collect(), key=lambda r: r["cell_id"])
    cids = [int(r["cell_id"]) for r in crows]
    C = np.array([list(r["cv"]) for r in crows], dtype=np.float64)
    cn = np.linalg.norm(C, axis=1)
    cn[cn == 0] = 1.0
    Cn = C / cn[:, None]

    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    @pandas_udf("long")
    def cell_of(v):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        X = np.array(v.tolist(), dtype=np.float64)
        n = np.linalg.norm(X, axis=1)
        n[n == 0] = 1.0
        S = (X / n[:, None]) @ Cn.T
        # argmax takes the FIRST max → lowest cell_id on ties, matching
        # assign_cells' (desc cosine, asc cell_id) ranking
        return pd.Series([cids[i] for i in S.argmax(axis=1)], dtype="int64")

    assigned = docs.select(
        F.col(id_col).cast("long").alias("id"),
        cell_of(F.col(vec_col)).alias("cell_id"),
        F.col(vec_col).alias("v"),
    )

    def fn(
        key: tuple,
        batches: Iterator["pd.DataFrame"],
        state,
    ) -> Iterator["pd.DataFrame"]:
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ids = list(state.get[0])
            flat = np.asarray(state.get[1], dtype=np.float64)
        else:
            ids, flat = [], np.empty(0)
        seen = set(ids)
        M = flat.reshape(len(ids), -1) if len(ids) else None
        out: list[tuple] = []
        for pdf in batches:
            for vid, vec in sorted(
                zip(pdf["id"], pdf["v"]), key=lambda t: int(t[0])
            ):
                vid = int(vid)
                if vid in seen:
                    continue
                if len(ids) >= max_cell:
                    out.append((vid, key[0], True, float("nan"), True))
                    continue
                v = np.asarray(list(vec), dtype=np.float64)
                nv = np.linalg.norm(v) or 1.0
                vn = v / nv
                if M is not None:
                    mc = float((M @ vn).max())
                    out.append((vid, key[0], mc < tau, mc, False))
                else:
                    out.append((vid, key[0], True, float("nan"), False))
                M = vn[None, :] if M is None else np.vstack([M, vn])
                ids.append(vid)
                seen.add(vid)
        state.update((ids, [] if M is None else [float(x) for x in M.ravel()]))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        if out:
            yield pd.DataFrame(
                out,
                columns=["id", "cell_id", "keep", "max_cos_earlier", "cell_overflow"],
            )

    return assigned.groupBy("cell_id").applyInPandasWithState(
        fn,
        outputStructType=(
            "id long, cell_id long, keep boolean, "
            "max_cos_earlier double, cell_overflow boolean"
        ),
        stateStructType="ids array<long>, flat array<double>",
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout" if ttl_ms else "NoTimeout",
    )


def run_to_memory_sink(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a bounded stream to completion synchronously (test harness):
    memory sink + processAllAvailable."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
