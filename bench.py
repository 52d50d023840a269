"""Benchmark harness — the driver's per-round feedback loop.

Default mode: runs the headline pixel pipeline (tiles → decode → cells →
PIP → kNN → zonal biomass) plus a representative query set over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) and prints ONE JSON
line.  Fixture generation (cached under /tmp) is excluded from timings.

``--scaling``: runs the headline pipeline twice in fresh processes at
num_cpus=8 and num_cpus=32 on the same input and reports throughput at
both plus scaling efficiency = (t_8 / t_32) / (32 / 8) — the sandbox
evidence for the north rule's N-vs-4N-nodes criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "zonal_biomass",
    "pip_assign",
    "knn_idw",
    "q1_pricing",
    "revenue_by_priority",
    "filter_project",
    "hourly_event_stats",
    "user_sessions",
    "asof_order_events",
    "exact_dedup",
    "minhash_pairs",
    "ann_topk",
    "phash_neardup",
]


def _consume(res) -> int:
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, (pd.DataFrame, pa.Table)):
        return len(res)
    return res.count()


def run_headline(sf_dir: str, trials: int = 2) -> tuple[float, int, int]:
    """(seconds, n_tiles, out_rows) for the flagship pixel pipeline.

    Takes the MIN of ``trials`` consecutive runs — the sandbox host has
    bursty noisy-neighbor contention (identical runs vary up to 2×) and
    min is the noise-robust estimator of the machine's true capability.
    """
    from biomass_processing_pipeline_ray.pipelines.queries import (
        q_zonal_biomass_px,
        tiles_path,
        universe_n,
    )

    tiles_path(sf_dir)  # generate/caches outside the timed section
    best, rows = float("inf"), 0
    for _ in range(trials):
        t0 = time.time()
        rows = _consume(q_zonal_biomass_px(sf_dir))
        best = min(best, time.time() - t0)
    return best, universe_n(sf_dir), rows


def bench(sf_dir: str, num_cpus: int, headline_only: bool = False) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from biomass_processing_pipeline_ray.pipelines.queries import build_queries, sf_of

    headline_sec, n_tiles, _ = run_headline(sf_dir)
    out = {
        "metric": "headline pixel zonal pipeline wall-clock (sf dir)",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "tiles_per_sec": round(n_tiles / headline_sec, 1),
        "queries": {},
        "sf": sf_of(sf_dir),
        "num_cpus": num_cpus,
    }
    if not headline_only:
        registry = build_queries()
        for name in BENCH_QUERIES:
            fn = registry[name][0]
            t0 = time.time()
            _consume(fn(sf_dir))
            out["queries"][name] = round(time.time() - t0, 3)
    ray.shutdown()
    return out


def scaling(sf_dir: str, cpus=(8, 32)) -> dict:
    results = {}
    for c in cpus:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(c), GRAFT_SF_DIR=sf_dir)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[c] = json.loads(line)
    lo, hi = cpus
    t_lo, t_hi = results[lo]["value"], results[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling efficiency (fresh sessions, same input)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": results[hi]["sf"],
        "num_cpus": hi,
        "runs": {
            str(c): {
                "sec": results[c]["value"],
                "tiles_per_sec": results[c]["tiles_per_sec"],
            }
            for c in cpus
        },
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(scaling(SF_DIR)))
    else:
        print(json.dumps(bench(SF_DIR, NUM_CPUS, "--headline-only" in sys.argv)))
