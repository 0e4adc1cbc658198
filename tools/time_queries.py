"""Time named queries best-of-N in one session (quick iteration tool).

Usage: python tools/time_queries.py [n_runs] q_a [q_b ...]
Same timing action as bench.py (count()), same session factory; for
decisions use interleaved full-bench A/Bs (tools/env_ab.py) — this is
the fast inner loop only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batchprocessingetl_spark.session import get_spark
from batchprocessingetl_spark.workload import collect_extra_queries, collect_queries


def main() -> None:
    n = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time-queries")
    queries = {**collect_queries(), **collect_extra_queries()}
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm
    out = {}
    for name in names:
        runs = []
        for _ in range(n):
            t0 = time.time()
            queries[name](spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        out[name] = {"best": min(runs), "runs": runs}
        print(f"# {name}: {min(runs)}s {runs}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
