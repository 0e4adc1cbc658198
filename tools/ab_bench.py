"""Interleaved A/B bench harness (the VERDICT r11 #3 protocol, pinned
as a tool): run the r10 17-query shared set and the full headline set
alternately (A,B,A,B,...), one fresh bench.py process per run, and
report shared-set normalized totals per arm — the measurement that
separates a real plan regression from host drift / run-context
pollution.

Usage: python tools/ab_bench.py [n_rounds=3]
Prints one JSON line: {"A": [...], "B": [...], "medians": {...}}.
Interpretation discipline (docs/BENCH_NOTES.md): deltas under ~10%
between arms are noise unless they replicate across two interleaved
runs.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHARED = 17  # the BENCH_r01-r10 headline prefix


def run_once(bench_set: str) -> dict:
    import tempfile

    env = dict(os.environ)
    # a pre-set SPARK_GRAFT_BENCH_SET would make BOTH arms run the
    # same set and the A/B silently measure nothing (ADVICE r12) —
    # clear it, then set it only for the non-full arm
    env.pop("SPARK_GRAFT_BENCH_SET", None)
    if bench_set != "full":
        env["SPARK_GRAFT_BENCH_SET"] = bench_set
    # per-run artifact path: the repo-root bench_full.json is a shared
    # singleton any concurrent bench.py would clobber mid-A/B
    fd, artifact = tempfile.mkstemp(prefix="ab_bench_", suffix=".json")
    os.close(fd)
    env["SPARK_GRAFT_BENCH_FULL"] = artifact
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench.py")],
            capture_output=True,
            text=True,
            env=env,
            check=True,
        )
        doc = json.loads(out.stdout.strip().splitlines()[-1])
        if "queries" not in doc:
            # bench.py's stdout-overflow branch drops per-query timings
            # from the printed line but always writes the full document
            # to the artifact path — read that instead of KeyError-ing
            with open(artifact) as fh:
                doc = json.load(fh)
        return doc
    finally:
        try:
            os.unlink(artifact)
        except OSError:
            pass


def shared_norm(doc: dict) -> float:
    from bench import HEADLINE

    shared = HEADLINE[:SHARED]
    return round(sum(doc["queries"][q] for q in shared) / doc["calibration"], 2)


def main() -> None:
    sys.path.insert(0, HERE)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    res: dict[str, list[float]] = {"A": [], "B": []}
    for i in range(n):
        res["A"].append(shared_norm(run_once("r10")))
        print(f"# A run {i + 1}: {res['A'][-1]}", file=sys.stderr)
        res["B"].append(shared_norm(run_once("full")))
        print(f"# B run {i + 1}: {res['B'][-1]}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "shared17_normalized_ab",
                "A_r10_only": res["A"],
                "B_full": res["B"],
                "medians": {
                    "A": statistics.median(res["A"]),
                    "B": statistics.median(res["B"]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
