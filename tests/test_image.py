import numpy as np

from biomass_processing_pipeline_ray.image import codecs, phash


def test_raw_png_lossless(rng):
    px = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    for fmt in ("raw", "png"):
        buf = codecs.encode(px, fmt)
        dec = codecs.decode(buf, fmt, 40, 56)
        assert np.array_equal(px, dec), fmt


def test_jpeg_standin_psnr_bound(rng):
    """North-rule bound: lossy decode PSNR ≥ 40 dB."""
    for _ in range(5):
        px = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        buf = codecs.encode(px, "jpeg")
        dec = codecs.decode(buf, "jpeg", 64, 64)
        assert codecs.psnr(px, dec) >= 40.0


def test_jpeg_decode_deterministic(rng):
    px = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    buf = codecs.encode(px, "jpeg")
    d1 = codecs.decode(buf, "jpeg", 32, 48)
    d2 = codecs.decode(buf, "jpeg", 32, 48)
    assert np.array_equal(d1, d2)


def test_png_unfilter_paths(rng):
    """Decoder handles filtered PNGs (Up/Sub/Paeth), not just filter 0."""
    import struct
    import zlib

    px = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    h, w = 6, 5
    # build a PNG with per-row filters 0,1,2,3,4,0 by brute-force encoding
    rows = []
    prev = np.zeros(w * 3, np.int16)
    filters = [0, 1, 2, 3, 4, 0]
    for r, f in enumerate(filters):
        cur = px[r].reshape(-1).astype(np.int16)
        enc = np.zeros(w * 3, np.int16)
        for x in range(w * 3):
            a = int(cur[x - 3]) if x >= 3 else 0
            b = int(prev[x])
            c = int(prev[x - 3]) if x >= 3 else 0
            if f == 0:
                enc[x] = cur[x]
            elif f == 1:
                enc[x] = (cur[x] - a) % 256
            elif f == 2:
                enc[x] = (cur[x] - b) % 256
            elif f == 3:
                enc[x] = (cur[x] - ((a + b) >> 1)) % 256
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                enc[x] = (cur[x] - pred) % 256
        rows.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + codecs._chunk(b"IEND", b"")
    )
    dec = codecs.decode_png(png)
    assert np.array_equal(dec, px)


def test_phash_stable_and_sensitive(rng):
    px = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    h1 = phash.dhash(px)
    assert h1 == phash.dhash(px.copy())
    # small perturbation → small hamming distance; different image → large
    other = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    near = px.copy()
    near[0, 0] = 255 - near[0, 0]
    d_near = phash.hamming_i64(np.array([h1]), np.array([phash.dhash(near)]))[0]
    d_far = phash.hamming_i64(np.array([h1]), np.array([phash.dhash(other)]))[0]
    assert d_near <= 4
    assert d_far > 10
