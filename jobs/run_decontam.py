"""Cluster entrypoint for benchmark decontamination:

    ray job submit --working-dir . -- \\
        python jobs/run_decontam.py --sf-dir /data/sf --out /data/decontam

Collects the held-out eval shard's distinct word n-grams (bounded —
the eval benchmark is O(1) size at any corpus scale), broadcasts them
via ray.put, and runs the zero-shuffle corpus scan.  The per-doc
verdicts (doc_id, n_hits, contaminated) are written partitioned by
``contaminated`` so downstream training-set assembly reads ONLY the
clean partition; ``--out`` is written via temp-dir + atomic swap, so a
re-run replaces rather than accumulates.  Prints a one-line JSON
summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True, help="table dir with documents.parquet")
    ap.add_argument("--out", default=None, help="optional verdict output dir")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)

    from biomass_processing_pipeline_ray.pipelines.queries import q_benchmark_decontam

    t0 = time.time()
    verdicts = q_benchmark_decontam(args.sf_dir)
    if args.out:
        import shutil

        out = os.path.normpath(args.out)
        tmp = f"{out}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        verdicts = verdicts.materialize()  # scanned twice: write + summary
        verdicts.write_parquet(tmp, partition_cols=["contaminated"])
        old = f"{out}.old.{os.getpid()}"
        if os.path.exists(out):
            os.replace(out, old)
        os.replace(tmp, out)
        shutil.rmtree(old, ignore_errors=True)
    # distributed summary — the verdict table is O(corpus), never pulled
    sums = verdicts.sum(["contaminated", "n_hits"])
    n_docs = verdicts.count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "corpus_docs": int(n_docs),
                "contaminated_docs": int(sums["sum(contaminated)"]),
                "overlapping_grams": int(sums["sum(n_hits)"]),
                "wall_sec": round(wall, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
