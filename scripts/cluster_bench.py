#!/usr/bin/env python3
"""Run the pinned-order bench suite under a MULTI-JVM master (VERDICT
r08 task 3) — the last untested performance axis: real shuffle
transport over sockets, broadcast serialization, per-executor Python
worker pools, 4 GiB executor heaps instead of one 128 GiB JVM.

``bench.py`` builds its session via ``session.get_spark()``, whose
``getOrCreate`` reuses any active session — so this wrapper simply
creates the cluster session FIRST (with the executor PYTHONPATH that
multi-JVM pandas-UDF deserialization needs) and then hands control to
``bench.main()`` unchanged: same queries, same pinned order, same
warmup, same output line.

    python scripts/cluster_bench.py [master]    # default local-cluster[2,8,4096]

Numbers land in BASELINE.md as an evidence column, NOT a ratchet —
local-cluster on one box pays real serialization but fake network, so
the comparison prices overhead structure, not cluster throughput.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def main() -> None:
    # argv handling lives HERE, not at import time: importing this
    # module must not mutate the host process's sys.argv, and stray
    # extra arguments should error instead of silently vanishing
    if len(sys.argv) > 2:
        raise SystemExit(f"usage: {sys.argv[0]} [master]")
    master = sys.argv[1] if len(sys.argv) > 1 else "local-cluster[2,8,4096]"
    sys.argv = sys.argv[:1]

    from end_end_data_pipeline__spark.session import get_spark

    get_spark(
        "bench-cluster",
        master=master,
        extra_conf={"spark.executorEnv.PYTHONPATH": REPO},
    )
    import bench

    bench.main()


if __name__ == "__main__":
    main()
