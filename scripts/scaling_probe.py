"""Offline scaling probe: runs bench.scaling_probe() with multi-trial
legs and writes SCALING.json at the repo root, which bench.py embeds
into its JSON output (machine-readable north-rule evidence).

Usage:  python scripts/scaling_probe.py
Env:    SPARK_GRAFT_SCALE_LEGS (default "1,4"), SPARK_GRAFT_SCALE_TRIALS
        (default 5), SPARK_GRAFT_SCALE_FILES (default 500000),
        SPARK_GRAFT_SCALE_MODE (executors|threads).

Each leg runs in a fresh subprocess (a reused driver JVM contaminates
the next leg); trials of the two legs alternate is NOT done — legs run
grouped, min-over-trials per leg is the reported estimator (see
BENCH.md's variance tables for why)."""

from __future__ import annotations

import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SCALE_TRIALS", "5")

from bench import scaling_probe  # noqa: E402

if __name__ == "__main__":
    result = scaling_probe()
    result["measured_at"] = datetime.datetime.now(datetime.timezone.utc).isoformat()
    result["trials_per_leg"] = int(os.environ["SPARK_GRAFT_SCALE_TRIALS"])
    result["estimator"] = "min seconds over trials per leg"
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.json"
    )
    # Merge under a per-mode key so executor-mode (separate JVMs, the
    # cluster-faithful probe) and thread-mode (single shared JVM, the
    # local[N] comparison the north rule names) coexist in one file.
    mode = os.environ.get("SPARK_GRAFT_SCALE_MODE", "executors")
    if mode == "executors":
        key = "executor_mode"
    else:
        legs = os.environ.get("SPARK_GRAFT_SCALE_LEGS", "1,4").replace(",", "_")
        key = f"thread_mode_{legs}"
    # non-default corpus sizes get their own block (amortization probe:
    # does efficiency rise with corpus size?)
    files = int(os.environ.get("SPARK_GRAFT_SCALE_FILES", "500000"))
    if files != 500000:
        key = f"{key}_{files // 1000}k"
    existing: dict = {}
    if os.path.isfile(out):
        try:
            with open(out) as f:
                existing = json.load(f)
        except (json.JSONDecodeError, OSError):
            existing = {}
    if "executor_mode" not in existing and "thread_mode" not in existing:
        # migrate a legacy flat file (pre-merge layout) to executor_mode
        existing = {"executor_mode": existing} if existing else {}
    existing[key] = result
    with open(out, "w") as f:
        json.dump(existing, f, indent=2)
    print(json.dumps(result))
