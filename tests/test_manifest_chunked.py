"""Mid-stage (chunk-level) resume: a killed stage resumes at the first
incomplete chunk, recomputing nothing that was already committed."""

from __future__ import annotations

import os

import pytest

from cli_spark.corpus import generate_repos
from cli_spark.extract import extract_triples
from cli_spark.manifest import is_complete, read_manifest, run_stage_chunked

N_FILES = 120
N_CHUNKS = 4


def _sorted_rows(df):
    return sorted(
        tuple(r) for r in df.select("subj", "pred", "obj", "obj_kind").collect()
    )


def test_chunked_stage_resumes_mid_stage(spark, tmp_path):
    workdir = str(tmp_path)
    repos = generate_repos(spark, N_FILES).cache()
    calls = {"n": 0}

    def dying_compute(df):
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("simulated executor loss")
        return extract_triples(df)

    with pytest.raises(RuntimeError):
        run_stage_chunked(
            spark, workdir, "10_extract", repos, dying_compute,
            n_chunks=N_CHUNKS, chunk_cols=["repo", "path", "commit"],
            lineage_cols=["subj", "pred", "obj"],
        )
    # two chunks committed, stage not complete
    stage_dir = os.path.join(workdir, "10_extract")
    committed = sorted(
        f for f in os.listdir(stage_dir) if f.startswith("manifest_chunk_")
    )
    assert committed == ["manifest_chunk_00000.json", "manifest_chunk_00001.json"]
    assert not is_complete(workdir, "10_extract")

    # resume: only the two missing chunks are computed
    calls["n"] = 0

    def counting_compute(df):
        calls["n"] += 1
        return extract_triples(df)

    out = run_stage_chunked(
        spark, workdir, "10_extract", repos, counting_compute,
        n_chunks=N_CHUNKS, chunk_cols=["repo", "path", "commit"],
        lineage_cols=["subj", "pred", "obj"],
    )
    assert calls["n"] == 2, "completed chunks were recomputed"
    assert is_complete(workdir, "10_extract")
    # schema identical to the unchunked layout (no leaked partition col)
    assert "chunk" not in out.columns
    # content identical to the straight-through extraction
    assert _sorted_rows(out) == _sorted_rows(extract_triples(repos))
    meta = read_manifest(workdir, "10_extract")
    assert meta["chunked"] == N_CHUNKS and len(meta["chunks"]) == N_CHUNKS
    assert meta["row_count"] == out.count()

    # a third invocation skips the whole stage (stage-level manifest)
    calls["n"] = 0
    again = run_stage_chunked(
        spark, workdir, "10_extract", repos, counting_compute,
        n_chunks=N_CHUNKS, chunk_cols=["repo", "path", "commit"],
    )
    assert calls["n"] == 0
    assert again.count() == out.count()


def test_pipeline_with_chunked_extract(spark, tmp_path):
    from cli_spark.pipeline import run_kg_pipeline

    repos = generate_repos(spark, N_FILES)
    n_chunked = run_kg_pipeline(
        spark, repos, workdir=str(tmp_path / "a"), extract_chunks=3
    )
    n_plain = run_kg_pipeline(spark, repos, workdir=str(tmp_path / "b"))
    assert n_chunked == n_plain > 0

    # the second materialized artifact: jelly frames that decode back to
    # exactly the DISTINCT graph of the triple table (provenance rows
    # make table rows non-duplicate; the graph itself is a set)
    from cli_spark.jelly import decode_frames, decode_quads

    g_cols = ["subj", "pred", "obj", "obj_kind", "graph"]
    table = (
        spark.read.parquet(str(tmp_path / "a" / "40_materialize" / "data"))
        .select(*g_cols)
        .distinct()
    )
    frames = spark.read.parquet(str(tmp_path / "a" / "40_materialize" / "frames"))
    decoded = decode_quads(decode_frames(frames)).select(*g_cols)
    assert decoded.count() == decoded.distinct().count() == table.count()
    assert decoded.exceptAll(table).count() == 0
