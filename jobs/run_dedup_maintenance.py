"""Cluster entrypoint for standing-corpus dedup maintenance:

    ray job submit --working-dir . -- \\
        python jobs/run_dedup_maintenance.py --sf-dir /data/sf \\
            --store /data/band_index [--compact] [--out /data/pairs]

Day-0 (store absent): builds the LSH band index over the corpus slice.
Every run: dedupes the delta slice against the store with pruned
partition reads, optionally appends the delta's band rows (so tomorrow's
delta sees today's) and compacts multi-file partitions (merge +
tombstone + grace GC — pair set provably invariant in every window).
Resumable: the build is `_SUCCESS`-gated; appends are gated by a
per-delta marker AND idempotent per tag (a crash between append and
marker replaces, not doubles, the tag's rows on retry).  `--out` is
written via temp-dir + atomic swap, so a re-run replaces rather than
accumulates pair files.  Tombstoned compaction sources are GC'd only
after `--gc-grace` seconds (default 24 h) so concurrent readers that
listed a partition pre-compaction can still finish; pass `--gc-grace 0`
ONLY for single-process bench runs.  Prints a one-line JSON summary.
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
    ap.add_argument("--store", required=True, help="band-index store dir")
    ap.add_argument("--mod", type=int, default=5, help="delta = doc_id %% mod == 0")
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--append", action="store_true", help="append the delta after deduping")
    ap.add_argument("--compact", action="store_true", help="compact the store after appending")
    ap.add_argument(
        "--gc-grace",
        type=float,
        default=86400.0,
        help="seconds tombstoned compaction sources outlive the compaction "
        "(readers in flight keep working); 0 = unlink immediately "
        "(single-process runs only)",
    )
    ap.add_argument("--out", default=None, help="optional pair output dir (parquet)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)

    from biomass_processing_pipeline_ray.pipelines.queries import (
        _dedup_n_coarse,
        _doc_slice,
        _tbl,
    )
    from biomass_processing_pipeline_ray.stages.dedup import (
        append_to_band_index,
        build_band_index,
        compact_band_index,
        dedup_against_index,
    )

    m = args.mod
    t0 = time.time()
    built = not os.path.exists(os.path.join(args.store, "_SUCCESS"))
    build_band_index(_doc_slice(args.sf_dir, lambda i: i % m != 0), args.store)

    pairs = dedup_against_index(
        _doc_slice(args.sf_dir, lambda i: i % m == 0),
        args.store,
        _tbl(args.sf_dir, "documents", ["doc_id", "text"]),
        threshold=args.threshold,
        n_coarse=_dedup_n_coarse(args.sf_dir),
    ).materialize()
    n_pairs = pairs.count()
    if args.out:
        # temp-dir + atomic swap: a re-run REPLACES the previous pair
        # set instead of appending new files alongside stale ones
        import shutil

        out = os.path.normpath(args.out)
        tmp = f"{out}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        pairs.write_parquet(tmp)
        old = f"{out}.old.{os.getpid()}"
        if os.path.exists(out):
            os.replace(out, old)
        os.replace(tmp, out)
        shutil.rmtree(old, ignore_errors=True)

    appended = compacted = 0
    if args.append:
        amark = os.path.join(args.store, f"_APPENDED_m{m}")
        if not os.path.exists(amark):
            append_to_band_index(
                _doc_slice(args.sf_dir, lambda i: i % m == 0),
                args.store,
                tag=f"m{m}",
            )
            with open(amark, "w"):
                pass
            appended = 1
    if args.compact:
        compacted = compact_band_index(args.store)
        # GC pass honors the grace window: sources tombstoned by THIS
        # run survive it (unless --gc-grace 0); sources tombstoned by
        # runs older than the grace are reclaimed here
        compact_band_index(args.store, gc_grace_sec=args.gc_grace)

    print(
        json.dumps(
            {
                "built": int(built),
                "near_dup_pairs": int(n_pairs),
                "appended": appended,
                "partitions_compacted": int(compacted),
                "wall_sec": round(time.time() - t0, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
