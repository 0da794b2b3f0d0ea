"""Memory-pressure evidence for the 100 TB claim (VERDICT r3 #5): run a
scaling pipeline in a fresh Ray session with the object store CAPPED so
blocks must spill, and report completion + spill stats + the same
deterministic counters as an uncapped run.

Usage:
    python tools/spill_check.py [er|crawl_clean] [mult] [cap_gb]

Prints one JSON line: {"pipeline":..., "mult":..., "cap_gb":..., "seconds":...,
"counters": {...}, "spilled_mb": N, "restored_mb": N}.

Run twice (cap_gb and 0 = uncapped) and diff "counters" — identical counters
under spill pressure is the evidence that streaming execution + object-store
spilling, not RAM headroom, carries the pipeline.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "er"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    cap_gb = float(sys.argv[3]) if len(sys.argv) > 3 else 16.0
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import ray
    import ray.data

    kwargs = {}
    if cap_gb > 0:
        kwargs["object_store_memory"] = int(cap_gb * 2**30)
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
        **kwargs,
    )
    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    t0 = time.time()
    if which == "crawl_clean":
        from mismo_ray.pipelines._crawl import crawl_clean_pipeline

        r = crawl_clean_pipeline(sf_dir, multiplier=mult)
        counters = {
            k: v
            for k, v in r.items()
            if isinstance(v, (int,)) and k != "seconds"
        }
    else:
        from mismo_ray.pipelines._webpages import scaling_pipeline

        r = scaling_pipeline(sf_dir, multiplier=mult)
        counters = {
            "n_matches": r["n_matches"],
            "n_pairs_scored": r["n_pairs_scored"],
            "n_source_docs": r["n_source_docs"],
        }
    elapsed = round(time.time() - t0, 3)

    # spill stats from the raylet's own accounting
    spilled_mb = restored_mb = 0.0
    try:
        from ray._private.internal_api import memory_summary

        s = memory_summary(stats_only=True)
        m = re.search(r"Spilled (\d+) MiB, (\d+) objects", s)
        if m:
            spilled_mb = float(m.group(1))
        m = re.search(r"Restored (\d+) MiB, (\d+) objects", s)
        if m:
            restored_mb = float(m.group(1))
    except Exception as e:  # stats are evidence, not correctness
        print(f"memory_summary unavailable: {e}", file=sys.stderr)

    ray.shutdown()
    print(
        json.dumps(
            {
                "pipeline": which,
                "mult": mult,
                "cap_gb": cap_gb,
                "num_cpus": num_cpus,
                "seconds": elapsed,
                "counters": counters,
                "spilled_mb": spilled_mb,
                "restored_mb": restored_mb,
            }
        )
    )


if __name__ == "__main__":
    main()
