"""Interleaved scaling probe for choppy co-tenancy windows.

The grouped probe (scripts/scaling_probe.py) runs all trials of one leg
back-to-back, so a single degraded window poisons that whole leg and
the efficiency ratio with it. This variant ALTERNATES the two legs
(1x2-executor, 4x2-executor) round by round, each trial in a fresh
subprocess; with min-over-trials per leg, each leg keeps its best
moment across the session, making the ratio robust to time-varying
interference (it cannot, however, undo the structural bias that
contention hits the wider leg harder — see BENCH.md).

Usage:  python scripts/interleaved_probe.py
Env:    SPARK_GRAFT_SCALE_ROUNDS (default 6), SPARK_GRAFT_SCALE_FILES
        (default 500000), SPARK_GRAFT_SCALE_LEGS (default "1,4"),
        SPARK_GRAFT_SCALE_CORES (default 2).

Writes SCALING.json key "executor_mode_interleaved[_<files>k]" with the
full per-round trial matrix (timestamps included) so the window's shape
is auditable.
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _scaling_leg  # noqa: E402


def main() -> None:
    rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "6"))
    n_files = int(os.environ.get("SPARK_GRAFT_SCALE_FILES", "500000"))
    legs = [
        int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEGS", "1,4").split(",")
    ]
    cores_per_exec = int(os.environ.get("SPARK_GRAFT_SCALE_CORES", "2"))
    trials: dict[str, list[dict]] = {}
    names = []
    for n in legs:
        name = f"{n}x{cores_per_exec}-executors"
        names.append(name)
        trials[name] = []
    for r in range(rounds):
        for n, name in zip(legs, names):
            master = f"local-cluster[{n},{cores_per_exec},8192]"
            t0 = time.time()
            leg = _scaling_leg(master, f"ileave_{n}", n * cores_per_exec, n_files)
            leg["started_at"] = datetime.datetime.fromtimestamp(
                t0, datetime.timezone.utc
            ).isoformat()
            leg["round"] = r
            trials[name].append(leg)
            print(json.dumps({"round": r, "leg": name, **leg}), flush=True)
    lo, hi = names[0], names[-1]
    best = {
        name: max(ts, key=lambda t: t["triples_per_sec"]) for name, ts in trials.items()
    }
    ratio = legs[-1] / legs[0]
    eff = (best[hi]["triples_per_sec"] / best[lo]["triples_per_sec"]) / ratio
    result = {
        name: {
            **best[name],
            "trial_seconds": [t["seconds"] for t in trials[name]],
            "trial_tps": [t["triples_per_sec"] for t in trials[name]],
            "n_files": n_files,
            "master": f"local-cluster[{n},{cores_per_exec},8192]",
        }
        for n, name in zip(legs, names)
    }
    result[f"scaling_efficiency_{legs[0]}_to_{legs[-1]}"] = round(eff, 3)
    result["measured_at"] = datetime.datetime.now(datetime.timezone.utc).isoformat()
    result["estimator"] = (
        "interleaved rounds, best (min-seconds) trial per leg — robust to "
        "time-varying co-tenancy; see scripts/interleaved_probe.py"
    )
    result["rounds"] = rounds
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.json"
    )
    existing: dict = {}
    if os.path.isfile(out):
        try:
            with open(out) as f:
                existing = json.load(f)
        except (json.JSONDecodeError, OSError):
            existing = {}
    key = os.environ.get("SPARK_GRAFT_SCALE_KEY", "executor_mode_interleaved")
    if n_files != 500000:
        key = f"{key}_{n_files // 1000}k"
    existing[key] = result
    with open(out, "w") as f:
        json.dump(existing, f, indent=2)
    print(json.dumps({"efficiency": eff, "key": key}))


if __name__ == "__main__":
    main()
