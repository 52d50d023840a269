"""Cluster entrypoint for the corpus-curation pipeline:

    ray job submit --working-dir . -- \\
        python jobs/run_curation.py --sf-dir /data/sf --out /data/curated

Runs quality gate → language agreement → exact dedup → near-dup drop
over the documents table, writes the KEPT doc ids partitioned by source
(resumable output layout), and prints the per-source summary JSON the
registry query (`queries.corpus_curation`) computes.
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
    ap.add_argument("--out", default=None, help="optional kept-ids output dir")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)

    from biomass_processing_pipeline_ray.pipelines.queries import q_corpus_curation

    t0 = time.time()
    summary = q_corpus_curation(args.sf_dir)
    df = summary.to_pandas() if hasattr(summary, "to_pandas") else summary
    wall = time.time() - t0
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        df.to_parquet(os.path.join(args.out, "curation_summary.parquet"))
    print(
        json.dumps(
            {
                "sources": int(len(df)),
                "kept_docs": int(df.n_docs.sum()),
                "token_budget": int(df.tok_sum.sum()),
                "wall_sec": round(wall, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
