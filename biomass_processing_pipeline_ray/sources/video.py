"""Synthetic deterministic video table — YUV4MPEG2 (.y4m) payloads for
the video frame pipeline.

Schema: ``(vid_id:int64, bytes:binary, w:int32, h:int32,
n_frames:int32, fmt:string)`` — the same opaque-binary-plus-typed-
metadata multimodal layout as the tile and audio tables
(BASELINE.json input_hint).  Payloads are REAL YUV4MPEG2 streams — the
public, codec-free raw-frame interchange format the ffmpeg/x264
toolchain uses (`YUV4MPEG2 W.. H.. F.. C444\\n` header, then per frame
a `FRAME\\n` marker + raw planar YUV) — so the decode stage
(``stages/multimodal.y4m_decode``) exercises an actual container
parser on an actual public format rather than the stub the container's
missing ffmpeg forced for compressed video (VERDICT r4 gap 2; the stub
remains ONLY for non-y4m payloads).

Determinism: every sample derives from id arithmetic + PCG64
(``SeedSequence([seed, i])``) — stable across processes and numpy
versions.  Frames are a moving luma gradient + a drifting bright
rectangle + low-amplitude noise, so per-frame brightness and dHash
vary meaningfully along the clip (frame sampling has something to
measure).  C444 and C420 alternate per id to cover both plane
layouts.  Generation is a Ray Data pipeline (``rd.range →
map_batches``) written as partitioned parquet via the same atomic
temp-dir rename as ``sources/tiles.py``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

DEFAULT_SEED = 99
_W, _H = 24, 16  # small frames: payload ~12 KB/clip, real plumbing


def video_params(i: int) -> tuple[int, int, int, str]:
    """(w, h, n_frames, colorspace) per id — pure arithmetic."""
    n_frames = 8 + (i * 7) % 25  # 8..32
    cs = "C444" if i % 2 == 0 else "C420"
    return _W, _H, n_frames, cs


def synth_frames(i: int, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Deterministic (n, h, w) uint8 luma frames for id ``i``.  Chroma
    planes are flat 128 (gray) — features are defined on Y only."""
    w, h, n, _ = video_params(i)
    rng = np.random.Generator(np.random.PCG64(np.random.SeedSequence([seed, i])))
    ys = np.empty((n, h, w), dtype=np.uint8)
    base_x = np.arange(w, dtype=np.int64)
    base_y = np.arange(h, dtype=np.int64)[:, None]
    noise = rng.integers(0, 16, size=(n, h, w), dtype=np.int64)
    for f in range(n):
        # moving diagonal gradient (phase advances per frame)
        grad = (base_x[None, :] * 9 + base_y * 5 + f * 11 + i) % 160
        frame = grad + noise[f]
        # drifting bright rectangle
        x0 = (i + f * 3) % (w - 6)
        y0 = (i // 3 + f * 2) % (h - 4)
        frame[y0 : y0 + 4, x0 : x0 + 6] += 80
        ys[f] = np.minimum(frame, 255).astype(np.uint8)
    return ys


def synth_y4m(i: int, seed: int = DEFAULT_SEED) -> bytes:
    """Deterministic YUV4MPEG2 payload for id ``i``."""
    w, h, n, cs = video_params(i)
    ys = synth_frames(i, seed)
    if cs == "C444":
        chroma = np.full((h, w), 128, dtype=np.uint8).tobytes()
    else:  # C420: quarter-size chroma planes
        chroma = np.full((h // 2, w // 2), 128, dtype=np.uint8).tobytes()
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 {cs}\n".encode()]
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(ys[f].tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def generate_video_parquet(
    n: int, out_dir: str, seed: int = DEFAULT_SEED, num_blocks: int | None = None
) -> str:
    """Build the n-clip y4m fixture with a Ray Data pipeline → parquet
    dir.  Idempotent and concurrency-safe via the ``sources/tiles.py``
    atomic temp-dir rename + ``_SUCCESS`` marker pattern."""
    import shutil

    import ray.data as rd

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir, ignore_errors=True)
    tmp_dir = f"{out_dir}.tmp.{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    # enough output files that the fused reader (one file per task) can
    # fan out across a 32-CPU node even at sf0.01 fixture sizes
    ds = rd.range(n, override_num_blocks=num_blocks or max(4, n // 256))

    def gen(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy()
        payloads = [synth_y4m(int(i), seed) for i in ids]
        params = [video_params(int(i)) for i in ids]
        return pa.table(
            {
                "vid_id": pa.array(ids, pa.int64()),
                "bytes": pa.array(payloads, pa.binary()),
                "w": pa.array([p[0] for p in params], pa.int32()),
                "h": pa.array([p[1] for p in params], pa.int32()),
                "n_frames": pa.array([p[2] for p in params], pa.int32()),
                "fmt": pa.array(["y4m"] * len(ids), pa.string()),
            }
        )

    ds.map_batches(gen, batch_format="pyarrow").write_parquet(tmp_dir)
    with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as f:
        f.write("ok")
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir
