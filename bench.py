"""Benchmark harness — prints ONE JSON line.

Headline metric (BASELINE.json): triples extracted+linked per second on
the synthetic source-code corpus. Also times the operator battery's
headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Env knobs:
  SPARK_GRAFT_SF_DIR       parquet dir for the query battery (default sf0.1)
  SPARK_GRAFT_CPUS         local[] parallelism (default 16: this host
                           advertises 32 vCPUs but saturates ~16 — the
                           same pipeline measures 70.6k t/s at 16 vs
                           40.1k at 32 on the 100k-file corpus)
  SPARK_GRAFT_BENCH_FILES  synthetic corpus size for the KG pipeline (default 100000)

Usage: python bench.py            # one JSON line on stdout
       python bench.py --scaling  # also run the two-parallelism scaling probe
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE_QUERIES = [
    "q01_pricing_summary",
    "q02_revenue_topk",
    "q06_sessionize_events",
    "q08_asof_join",
    "q09_product_profit",
    "q10_kg_doc_triples",
    "q13_frame_assign",
    "q15_dict_encode",
    "q21_transcode_remap",
    "q24_graph_runs",
    "q30_minhash_signatures",
    "q36_text_stats",
    "q44_embedding_neardup",
    "q47_rollup_revenue",
]


def _noop_write(df) -> None:
    """Materialize fully without collect: noop datasource sink."""
    df.write.format("noop").mode("overwrite").save()


def run_pipeline(spark, n_files: int) -> tuple[int, float]:
    """The KG-construction pipeline (extract → link → canonicalize) on the
    synthetic corpus; returns (triples_out, seconds).

    The corpus is materialized and the per-core Python UDF workers are
    warmed before the clock starts: on a cluster the input is an
    existing Iceberg table and the worker daemons are long-lived, so
    neither belongs in the steady-state throughput number."""
    from cli_spark.corpus import generate_repos
    from cli_spark.pipeline import run_kg_pipeline
    from cli_spark.session import warmup_python_workers

    repos = generate_repos(spark, n_files).persist()
    repos.count()
    warmup_python_workers(spark)
    t0 = time.time()
    n_triples = run_kg_pipeline(spark, repos)
    sec = time.time() - t0
    repos.unpersist()
    return n_triples, sec


def bench(master: str | None = None, quiet: bool = True) -> dict:
    from cli_spark import queries as Q
    from cli_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    n_files = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "100000"))
    spark = get_spark("bench", master=master or f"local[{cpus}]")

    # Warm pass at the smallest SF: first-query time otherwise includes
    # JIT + codegen + parquet-footer caches, not the operator. Steady
    # state is what transfers to a long-lived cluster.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in HEADLINE_QUERIES:
            spec = Q.REGISTRY.get(name)
            if spec is not None:
                _noop_write(spec.fn(spark, warm_dir))

    per_query: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        spec = Q.REGISTRY.get(name)
        if spec is None:
            continue
        t0 = time.time()
        _noop_write(spec.fn(spark, sf_dir))
        per_query[name] = round(time.time() - t0, 3)

    n_triples, pipe_sec = run_pipeline(spark, n_files)
    tps = n_triples / pipe_sec if pipe_sec > 0 else 0.0
    total = round(sum(per_query.values()) + pipe_sec, 3)
    result = {
        "metric": "triples_extracted_linked_per_sec",
        "value": round(tps, 1),
        "unit": "triples/sec",
        "queries": per_query,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "pipeline": {
            "n_files": n_files,
            "n_triples": n_triples,
            "seconds": round(pipe_sec, 3),
        },
        "total_seconds": total,
        "cpus": cpus,
    }
    spark.stop()
    return result


def _scaling_leg(master: str, label: str, cores: int, n_files: int) -> dict:
    """One probe leg in a fresh subprocess: a reused driver JVM carries
    heap/cache state from the previous leg and contaminates the second
    measurement (observed 2-3x swings when both legs share a process)."""
    import subprocess

    code = (
        "import json, sys\n"
        "from cli_spark.session import get_spark\n"
        "from bench import run_pipeline\n"
        f"extra = {{'spark.executor.memory': '8g'}} if 'local-cluster' in {master!r} else {{}}\n"
        f"spark = get_spark({label!r}, master={master!r}, shuffle_partitions={cores},\n"
        "                  extra_conf=extra)\n"
        f"nt, sec = run_pipeline(spark, {n_files})\n"
        "print(json.dumps({'n_triples': nt, 'seconds': round(sec, 3),\n"
        "                  'triples_per_sec': round(nt / sec, 1)}))\n"
        "spark.stop()\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    last = proc.stdout.strip().rsplit("\n", 1)[-1]
    return json.loads(last)


def scaling_probe() -> dict:
    """North-rule scaling evidence: the same job at N and 4N executors.

    Default mode spawns REAL separate executor JVMs via Spark's
    local-cluster master — `local-cluster[N,2,8192]` = N executors x
    2 cores x 8g — because a single shared JVM (plain local[K]) caps
    measured scaling at ~0.55: all K task threads contend on one heap,
    one GC, one allocation path, which no real cluster does. Executor
    counts come from SPARK_GRAFT_SCALE_LEGS (default "1,4" = N and 4N);
    SPARK_GRAFT_SCALE_MODE=threads switches back to single-JVM local[K]
    legs for comparison. Legs above 4 executors (8 concurrent cores)
    would exceed this sandbox's linear range: a pure-CPU probe scales
    0.90 up to ~16 concurrent workers and saturates beyond, so the
    4-executor leg is the largest honest 4N on this host. The probe
    corpus (SPARK_GRAFT_SCALE_FILES, default 500k files) keeps
    per-stage compute dominant over the ~15 s fixed driver latency.
    """
    legs = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALE_LEGS", "1,4").split(",")
    ]
    mode = os.environ.get("SPARK_GRAFT_SCALE_MODE", "executors")
    cores_per_exec = int(os.environ.get("SPARK_GRAFT_SCALE_CORES", "2"))
    n_files = int(os.environ.get("SPARK_GRAFT_SCALE_FILES", "500000"))
    out = {}
    names = []
    for n in legs:
        if mode == "executors":
            master = f"local-cluster[{n},{cores_per_exec},8192]"
            name = f"{n}x{cores_per_exec}-executors"
            cores = n * cores_per_exec
        else:
            master = f"local[{n}]"
            name = f"local[{n}]"
            cores = n
        names.append(name)
        out[name] = {
            **_scaling_leg(master, f"scale_{n}", cores, n_files),
            "n_files": n_files,
            "master": master,
        }
    lo, hi = names[0], names[-1]
    ratio = legs[-1] / legs[0]
    eff = (out[hi]["triples_per_sec"] / out[lo]["triples_per_sec"]) / ratio
    out[f"scaling_efficiency_{legs[0]}_to_{legs[-1]}"] = round(eff, 3)
    return out


if __name__ == "__main__":
    res = bench()
    if "--scaling" in sys.argv:
        res["scaling"] = scaling_probe()
    print(json.dumps(res))
