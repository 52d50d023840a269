"""Synthetic deterministic audio table — WAV payloads for the audio
feature pipeline.

Schema: ``(aud_id:int64, bytes:binary, sr:int32, n_channels:int32)``
— an opaque ``binary`` column plus typed metadata, the same multimodal
layout as the tile table (BASELINE.json input_hint).  Payloads are
REAL RIFF/PCM WAV files written with the stdlib ``wave`` module, so the
decode stage (``stages/multimodal.wav_decode``) exercises an actual
codec rather than the audio stub the container's missing ffmpeg forced
elsewhere (VERDICT r4 item 8).

Determinism: samples come from ``np.random.PCG64(SeedSequence([seed,
i]))`` — stable across processes and numpy versions — as a two-tone
sine + noise mix whose frequency, length, sample rate and channel
count all derive from the id.  Generation is a Ray Data pipeline
(``rd.range → map_batches``) written as partitioned parquet via the
same atomic temp-dir rename as ``sources/tiles.py``.
"""

from __future__ import annotations

import io
import os
import wave

import numpy as np
import pyarrow as pa

DEFAULT_SEED = 77
SAMPLE_RATES = (8000, 16000)


def audio_params(i: int) -> tuple[int, int, int]:
    """(sample_rate, n_channels, n_frames) per id — pure arithmetic."""
    sr = SAMPLE_RATES[i % 2]
    nch = 1 + (i % 3 == 0)
    n_frames = 400 + (i * 131) % 3200
    return sr, nch, n_frames


def synth_wav(i: int, seed: int = DEFAULT_SEED) -> bytes:
    """Deterministic 16-bit PCM WAV payload for id ``i``."""
    sr, nch, n_frames = audio_params(i)
    rng = np.random.Generator(np.random.PCG64(np.random.SeedSequence([seed, i])))
    t = np.arange(n_frames, dtype=np.float64) / sr
    f0 = 80.0 + (i * 37) % 3000
    sig = 0.55 * np.sin(2 * np.pi * f0 * t) + 0.2 * np.sin(
        2 * np.pi * (f0 * 1.5) * t
    )
    sig = sig + 0.1 * (rng.random(n_frames) * 2.0 - 1.0)
    mono = np.clip(sig * 20000.0, -32768, 32767).astype(np.int16)
    if nch == 2:
        # second channel: quieter, 7-frame delay — keeps channels
        # correlated but distinct, like a real stereo capture
        right = np.roll(mono, 7) // 2
        frames = np.empty(n_frames * 2, dtype=np.int16)
        frames[0::2] = mono
        frames[1::2] = right
    else:
        frames = mono
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(frames.astype("<i2").tobytes())
    return buf.getvalue()


def generate_audio_parquet(
    n: int, out_dir: str, seed: int = DEFAULT_SEED, num_blocks: int | None = None
) -> str:
    """Build the n-clip WAV fixture with a Ray Data pipeline → parquet
    dir.  Idempotent and concurrency-safe via the ``sources/tiles.py``
    atomic temp-dir rename + ``_SUCCESS`` marker pattern."""
    import shutil

    import ray.data as rd

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    if os.path.isdir(out_dir):
        if os.path.exists(marker):  # completed by a concurrent generator
            return out_dir
        shutil.rmtree(out_dir, ignore_errors=True)
    tmp_dir = f"{out_dir}.tmp.{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    # enough output files that the fused reader (one file per task) can
    # fan out across a 32-CPU node even at sf0.01 fixture sizes
    ds = rd.range(n, override_num_blocks=num_blocks or max(4, n // 1024))

    def gen(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy()
        payloads = [synth_wav(int(i), seed) for i in ids]
        params = [audio_params(int(i)) for i in ids]
        return pa.table(
            {
                "aud_id": pa.array(ids, pa.int64()),
                "bytes": pa.array(payloads, pa.binary()),
                "sr": pa.array([p[0] for p in params], pa.int32()),
                "n_channels": pa.array([p[1] for p in params], pa.int32()),
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
