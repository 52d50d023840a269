"""Cluster entrypoint for corpus-hygiene signals:

    ray job submit --working-dir . -- \\
        python jobs/run_hygiene.py --sf-dir /data/sf --out /data/hygiene

Runs the two intra-corpus duplication views over ``documents``:

- ``dup_gram_frac`` — per-document cross-document duplicated word
  4-gram fraction (RefinedWeb-style); written partitioned by a
  coarse ``dup_band`` (0: <25%, 1: <50%, 2: <75%, 3: ≥75%) so
  training-set assembly prunes the heavy-duplication bands at the
  read.
- ``source_gram_overlap`` — the |sources|² pairwise distinct-gram
  Jaccard matrix (bounded), written as one small parquet.

``--out`` is written via temp-dir + atomic swap (the run_decontam
pattern), so a re-run replaces rather than accumulates.  Prints a
one-line JSON summary; the per-doc table is summarized distributed
and never pulled to the driver.
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
    ap.add_argument("--out", default=None, help="optional output dir")
    args = ap.parse_args(argv)

    import numpy as np
    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)

    from biomass_processing_pipeline_ray.pipelines.queries import (
        q_dup_gram_frac,
        q_source_gram_overlap,
    )

    t0 = time.time()
    per_doc = q_dup_gram_frac(args.sf_dir)

    def band(b: pa.Table) -> pa.Table:
        f = b["dup_frac"].to_numpy()
        return b.append_column(
            "dup_band",
            pa.array(np.minimum((f * 4).astype(np.int64), 3), pa.int64()),
        )

    per_doc = per_doc.map_batches(band, batch_format="pyarrow")
    matrix = q_source_gram_overlap(args.sf_dir)  # bounded pandas frame

    if args.out:
        import shutil

        out = os.path.normpath(args.out)
        tmp = f"{out}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        per_doc = per_doc.materialize()  # scanned twice: write + summary
        per_doc.write_parquet(
            os.path.join(tmp, "dup_gram_frac"), partition_cols=["dup_band"]
        )
        matrix.to_parquet(os.path.join(tmp, "source_overlap.parquet"))
        old = f"{out}.old.{os.getpid()}"
        if os.path.exists(out):
            os.replace(out, old)
        os.replace(tmp, out)
        shutil.rmtree(old, ignore_errors=True)

    sums = per_doc.sum(["n_grams", "dup_grams"])
    n_docs = per_doc.count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "docs": int(n_docs),
                "grams": int(sums["sum(n_grams)"]),
                "dup_grams": int(sums["sum(dup_grams)"]),
                "source_pairs": int(len(matrix)),
                "max_pair_jaccard": float(matrix["jaccard"].max()),
                "wall_sec": round(wall, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
