"""Multimodal stages: real resize math + stubbed codecs with real plumbing."""

import numpy as np
import pytest


def test_area_resize_properties():
    from biomass_processing_pipeline_ray.stages.multimodal import area_resize

    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    small = area_resize(px, 16, 16)
    assert small.shape == (16, 16, 3) and small.dtype == np.uint8
    # area mean preserves the global mean to within the floor error
    assert abs(small.astype(np.float64).mean() - px.astype(np.float64).mean()) < 1.0
    # constant image resizes exactly
    flat = np.full((40, 40, 3), 77, dtype=np.uint8)
    assert (area_resize(flat, 8, 8) == 77).all()


def test_image_resize_stage_plumbing(ray_session, tiles_small):
    import ray.data as rd

    from biomass_processing_pipeline_ray.stages.multimodal import ImageResizeStage

    ds = rd.read_parquet(tiles_small).limit(64)
    out = ds.map_batches(
        ImageResizeStage, batch_format="pyarrow", concurrency=(1, 2), batch_size=32
    ).to_pandas()
    assert len(out) == 64
    assert set(out.columns) == {
        "image_id",
        "thumb_bytes",
        "thumb_w",
        "thumb_h",
        "thumb_fmt",
        "thumb_mean",
        "thumb_phash",
    }
    assert (out.thumb_w == 16).all() and (out.thumb_h == 16).all()
    # thumbnails are decodable PNGs of the declared shape
    from biomass_processing_pipeline_ray.image import codecs

    px = codecs.decode(out.thumb_bytes.iloc[0], "png", 16, 16)
    assert px.shape == (16, 16, 3)
    # deterministic across runs
    out2 = ds.map_batches(
        ImageResizeStage, batch_format="pyarrow", concurrency=(1, 2), batch_size=32
    ).to_pandas()
    a = out.sort_values("image_id").reset_index(drop=True)
    b = out2.sort_values("image_id").reset_index(drop=True)
    assert (a.thumb_phash == b.thumb_phash).all()


def test_audio_stage_stub_and_features(ray_session, tiles_small):
    import ray.data as rd

    from biomass_processing_pipeline_ray.stages.multimodal import (
        AudioFeatureStage,
        DecodeIsStubbed,
    )

    ds = rd.read_parquet(tiles_small, columns=["image_id", "bytes"]).limit(32)
    out = ds.map_batches(
        AudioFeatureStage,
        fn_constructor_kwargs={"id_col": "image_id"},
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).to_pandas()
    assert len(out) == 32
    assert (out.duration_s == 1.0).all()
    assert ((out.rms > 0.4) & (out.rms < 0.75)).all()  # uniform[-1,1] → ~0.577
    assert ((out.zero_crossing_rate > 0.3) & (out.zero_crossing_rate < 0.7)).all()
    # strict mode surfaces the stub instead of fake numbers
    with pytest.raises(Exception) as ei:
        ds.map_batches(
            AudioFeatureStage,
            fn_constructor_kwargs={"id_col": "image_id", "strict": True},
            batch_format="pyarrow",
            concurrency=1,
        ).to_pandas()
    assert "stub" in str(ei.value)


def test_audio_wav_real_decode_roundtrip(ray_session, tmp_path):
    """The REAL audio path: stdlib-wave WAV payloads round-trip through
    the actor-pool feature stage — decoded params match the generator's
    arithmetic spec and features match a direct recompute; strict mode
    is satisfied (no stub involved)."""
    import ray.data as rd

    from biomass_processing_pipeline_ray.sources.audio import (
        audio_params,
        generate_audio_parquet,
        synth_wav,
    )
    from biomass_processing_pipeline_ray.stages.multimodal import (
        AudioFeatureStage,
        wav_decode,
    )

    # direct decode: generator spec round-trips exactly
    frames, sr, nch = wav_decode(synth_wav(3))
    esr, ench, enf = audio_params(3)
    assert (sr, nch, frames.shape) == (esr, ench, (enf, ench))

    fx = generate_audio_parquet(96, str(tmp_path / "aud"))
    out = (
        rd.read_parquet(fx, columns=["aud_id", "bytes"])
        .map_batches(
            AudioFeatureStage,
            fn_constructor_kwargs={"strict": True},  # real codec only
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .to_pandas()
        .sort_values("aud_id")
        .reset_index(drop=True)
    )
    assert len(out) == 96
    for i in (0, 1, 6, 95):
        r = out[out.aud_id == i].iloc[0]
        sr, nch, nf = audio_params(i)
        assert int(r.sample_rate) == sr and int(r.n_channels) == nch
        assert r.duration_s == nf / sr
        f, _, _ = wav_decode(synth_wav(i))
        x = f.astype(np.int64)
        assert r.rms == float(np.sqrt(int((x * x).sum()) / x.size)) / 32768.0
        assert r.peak == int(np.abs(x).max()) / 32768.0
    # a sine-dominated signal has moderate zcr, real (non-stub) rms
    assert ((out.rms > 0.1) & (out.rms < 0.7)).all()
    assert (out.peak <= 1.0).all() and (out.peak > 0.3).all()


def test_video_stage_explodes_frames(ray_session, tiles_small):
    import ray.data as rd

    from biomass_processing_pipeline_ray.stages.multimodal import VideoFrameSampleStage

    ds = rd.read_parquet(tiles_small, columns=["image_id", "bytes"]).limit(8)
    out = ds.map_batches(
        VideoFrameSampleStage, batch_format="pyarrow", concurrency=(1, 2)
    ).to_pandas()
    # 16 fake frames, stride 4 → 4 rows per video
    assert len(out) == 8 * 4
    assert sorted(out.frame_idx.unique()) == [0, 4, 8, 12]
    assert out.video_id.nunique() == 8


def test_gradient_energy_vs_bruteforce():
    """Vectorized TV edge energy == per-pixel Python loop, exactly."""
    import numpy as np

    from biomass_processing_pipeline_ray.stages.multimodal import gradient_energy

    rng = np.random.default_rng(61)
    px = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    grad, n_px = gradient_energy(px)
    exp = 0
    g = [[int(px[i, j, 0]) + int(px[i, j, 1]) + int(px[i, j, 2])
          for j in range(17)] for i in range(13)]
    for i in range(13):
        for j in range(17):
            if i + 1 < 13:
                exp += abs(g[i + 1][j] - g[i][j])
            if j + 1 < 17:
                exp += abs(g[i][j + 1] - g[i][j])
    assert grad == exp
    assert n_px == 13 * 17


def test_video_y4m_real_decode_roundtrip(ray_session, tmp_path):
    """The REAL video path: YUV4MPEG2 payloads round-trip through the
    actor-pool frame-sampling stage — parsed frames match the
    generator's luma arrays exactly, sampled-frame features match a
    direct recompute, and strict mode is satisfied (no stub)."""
    import numpy as np
    import ray.data as rd

    from biomass_processing_pipeline_ray.image import phash as _ph
    from biomass_processing_pipeline_ray.sources.video import (
        generate_video_parquet,
        synth_frames,
        synth_y4m,
        video_params,
    )
    from biomass_processing_pipeline_ray.stages.multimodal import (
        VideoFrameSampleStage,
        y4m_decode,
    )

    # direct decode: both plane layouts round-trip the exact luma
    for i in (0, 1):  # C444 then C420
        ys, cs = y4m_decode(synth_y4m(i))
        w, h, nf, ecs = video_params(i)
        assert cs == ecs and ys.shape == (nf, h, w)
        assert np.array_equal(ys, synth_frames(i))

    fx = generate_video_parquet(48, str(tmp_path / "vid"))
    out = (
        rd.read_parquet(fx, columns=["vid_id", "bytes"])
        .map_batches(
            VideoFrameSampleStage,
            fn_constructor_kwargs={"id_col": "vid_id", "strict": True},
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .to_pandas()
        .sort_values(["video_id", "frame_idx"])
        .reset_index(drop=True)
    )
    # row count = sum over clips of ceil(n_frames / 4)
    exp_rows = sum(-(-video_params(i)[2] // 4) for i in range(48))
    assert len(out) == exp_rows
    for i in (0, 1, 47):
        sub = out[out.video_id == i]
        ys = synth_frames(i)
        assert list(sub.frame_idx) == list(range(0, len(ys), 4))
        f0 = ys[0]
        # column access, NOT .iloc[0] row extraction — a mixed-dtype row
        # Series upcasts int64 to float64 and corrupts 64-bit hashes
        assert sub["brightness"].iloc[0] == int(
            f0.astype(np.int64).sum()
        ) / float(f0.size)
        assert int(sub["frame_phash"].iloc[0]) == _ph.dhash(
            np.repeat(f0[:, :, None], 3, axis=2)
        )
