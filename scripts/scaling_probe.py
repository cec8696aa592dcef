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
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
