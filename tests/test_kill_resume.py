"""FIXTURES.md §5 — hard-kill mid-run, restart, byte-identical output.

A subprocess runs the checkpointed pipeline throttled to one actor; the
parent SIGKILLs its whole process group once the first county partitions
are committed, then resumes in-process and compares against an
uninterrupted run.  (If the child happens to finish before the kill the
resume is a no-op and the equality assertion still holds.)
"""

import os
import signal
import subprocess
import sys
import time

import pandas as pd
import pytest

CHILD = """
import ray, os
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from biomass_processing_pipeline_ray.pipelines.biomass import biomass_zonal_checkpointed
biomass_zonal_checkpointed(os.environ["TILES"], os.environ["OUT"],
                           n_tiles=int(os.environ["NT"]), concurrency=(1, 1))
ray.shutdown()
"""


def test_kill_mid_run_then_resume(ray_session, tiles_small, tmp_path):
    from biomass_processing_pipeline_ray.pipelines.biomass import (
        biomass_zonal_checkpointed,
    )

    out_full = str(tmp_path / "full")
    full = biomass_zonal_checkpointed(tiles_small, out_full, n_tiles=1000)

    out_kill = str(tmp_path / "killed")
    lineage_dir = os.path.join(out_kill, "_lineage")
    env = dict(
        os.environ,
        TILES=tiles_small,
        OUT=out_kill,
        NT="1000",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.Popen(
        [sys.executable, "-c", CHILD], env=env, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    # wait for the first committed partitions, then hard-kill the session
    deadline = time.time() + 240
    while time.time() < deadline and proc.poll() is None:
        if os.path.isdir(lineage_dir) and len(os.listdir(lineage_dir)) >= 3:
            break
        time.sleep(0.2)
    if proc.poll() is None:
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait(timeout=30)

    n_before = len(os.listdir(lineage_dir)) if os.path.isdir(lineage_dir) else 0
    resumed = biomass_zonal_checkpointed(tiles_small, out_kill, n_tiles=1000)
    assert n_before <= 64  # sanity: the kill left a partial (or full) run
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True), resumed.reset_index(drop=True)
    )
