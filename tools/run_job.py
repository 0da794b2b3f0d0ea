"""Cluster job entrypoint for the flagship ER pipeline.

On a real multi-node cluster this is launched at two cluster sizes
(north_rule: N and 4N nodes):

    ray job submit --address http://<head>:8265 \
        --working-dir /path/to/repo \
        -- python tools/run_job.py --sf-dir s3://bucket/corpus \
           --output s3://bucket/out/run1 --checkpoint-dir s3://bucket/ckpt/run1

Inside `ray job submit` the driver connects to the existing cluster
(RAY_ADDRESS is set by the job runner, ray.init() picks it up); standalone it
starts a local session. Re-running with the same --checkpoint-dir resumes
from the last completed stage (scored-linkage parquet + manifest). In this
sandbox the two-cluster-size criterion is evidenced by `bench.py --scaling`
(8 vs 32 CPUs in fresh processes) — see BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--output", default="/tmp/mismo_ray_job_out")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--threshold-odds", type=float, default=10.0)
    ap.add_argument("--train", choices=["labels", "em"], default="labels")
    ap.add_argument("--num-cpus", type=int, default=None, help="local mode only")
    ap.add_argument(
        "--pipeline",
        choices=["er", "crawl_clean", "linkgraph", "pretrain", "profile"],
        default="er",
        help="er = flagship entity resolution; crawl_clean = the webtext "
        "cleaning chain (canonical URL -> PII redact -> lang-ID + quality "
        "gate -> line dedup -> exact dedupe); linkgraph = href extraction "
        "-> host edges -> fixed-point PageRank; pretrain = crawl_clean -> "
        "CCNet LM gate -> hash split -> packed training shards; profile = "
        "corpus pre-pass (column describe, hot hosts, per-lang distinct)",
    )
    ap.add_argument(
        "--multiplier", type=int, default=60, help="crawl_clean corpus amplification"
    )
    ap.add_argument(
        "--robots-dir",
        default=None,
        help="crawl_clean only: directory of per-host robots.txt bodies "
        "(filename = hostname, optional .txt/.gz suffixes; see "
        "lib.robots.load_robots_dir) applied as the politeness gate ahead "
        "of all per-document compute",
    )
    args = ap.parse_args()

    import ray
    import ray.data

    if not ray.is_initialized():
        if os.environ.get("RAY_ADDRESS") not in (None, "", "local"):
            ray.init()  # inside `ray job submit`: attach to the cluster
        else:
            ray.init(
                address="local",
                num_cpus=args.num_cpus or None,
                include_dashboard=False,
                logging_level="ERROR",
            )
    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from mismo_ray.cluster import pairwise_metrics_from_links
    from mismo_ray.pipelines import flagship

    if args.pipeline == "linkgraph":
        from mismo_ray.pipelines._linkgraph import linkgraph_pipeline

        t0 = time.time()
        counters = linkgraph_pipeline(
            args.sf_dir, multiplier=args.multiplier, output_dir=args.output
        )
        summary = {
            "pipeline": "linkgraph",
            "seconds": round(time.time() - t0, 3),
            "counters": counters,
            "output": args.output,
        }
        os.makedirs(args.output, exist_ok=True)
        with open(os.path.join(args.output, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2, default=str)
        print(json.dumps(summary, default=str))
        ray.shutdown()
        return

    if args.pipeline == "profile":
        from mismo_ray.pipelines._profile import profile_pipeline

        t0 = time.time()
        counters = profile_pipeline(args.sf_dir, output_dir=args.output)
        summary = {
            "pipeline": "profile",
            "seconds": round(time.time() - t0, 3),
            "counters": counters,
            "output": args.output,
        }
        os.makedirs(args.output, exist_ok=True)
        with open(os.path.join(args.output, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2, default=str)
        print(json.dumps(summary, default=str))
        ray.shutdown()
        return

    if args.pipeline == "pretrain":
        from mismo_ray.pipelines._pretrain import pretrain_pipeline

        t0 = time.time()
        counters = pretrain_pipeline(
            args.sf_dir,
            args.output,  # writes <output>/shards + <output>/val
            multiplier=args.multiplier,
        )
        summary = {
            "pipeline": "pretrain",
            "seconds": round(time.time() - t0, 3),
            "counters": counters,
            "output": args.output,
        }
        os.makedirs(args.output, exist_ok=True)
        with open(os.path.join(args.output, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2, default=str)
        print(json.dumps(summary, default=str))
        ray.shutdown()
        return

    if args.pipeline == "crawl_clean":
        from mismo_ray.pipelines._crawl import crawl_clean_pipeline

        robots = None
        if args.robots_dir:
            from mismo_ray.lib.robots import load_robots_dir

            robots = load_robots_dir(args.robots_dir)
        t0 = time.time()
        counters = crawl_clean_pipeline(
            args.sf_dir,
            multiplier=args.multiplier,
            output_dir=args.output,
            robots=robots,
        )
        summary = {
            "pipeline": "crawl_clean",
            "seconds": round(time.time() - t0, 3),
            "counters": counters,
            "output": args.output,
        }
        os.makedirs(args.output, exist_ok=True)
        with open(os.path.join(args.output, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2, default=str)
        print(json.dumps(summary, default=str))
        ray.shutdown()
        return

    t0 = time.time()
    result = flagship(
        args.sf_dir,
        train=args.train,
        threshold_odds=args.threshold_odds,
        checkpoint_dir=args.checkpoint_dir,
    )
    records = result["records"]
    records.write_parquet(os.path.join(args.output, "records"))
    result["links"].write_parquet(os.path.join(args.output, "links"))
    metrics = pairwise_metrics_from_links(
        result["links"],
        records.select_columns(["record_id", "label_true"]),
    )
    summary = {
        "seconds": round(time.time() - t0, 3),
        "n_records": records.count(),
        "n_links": result["links"].count(),
        "pairwise": metrics,
        "counters": result["counters"],
        "output": args.output,
    }
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=str)
    print(json.dumps(summary, default=str))
    ray.shutdown()


if __name__ == "__main__":
    main()
