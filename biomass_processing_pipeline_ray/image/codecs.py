"""Pure numpy/zlib image codecs for the tile `bytes` column.

No image libraries (PIL/rasterio/opencv) exist in this container, so the
engine carries its own deterministic codecs.  This replaces the
reference's GeoTIFF handling (``blob_manager_v3.py:335-374`` rasterio
decode and ``:1211-1335`` hand-rolled TIFF header parsing):

- ``raw``  — C-order uint8 (h, w, 3) bytes, lossless, zero-copy decode.
- ``png``  — real PNG files (signature/IHDR/IDAT/IEND, zlib, filter 0 on
  encode; decode unfilters types 0–4), lossless.
- ``jpeg`` — a deterministic lossy stand-in (documented): 6-bit uniform
  quantization + zlib.  PSNR ≈ 46 dB ≥ the 40 dB bound the north rule
  sets for lossy formats, and decode is bit-deterministic so golden
  tests stay exact.

All functions take/return numpy uint8 arrays of shape (h, w, 3).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_QIMG_MAGIC = b"QIM1"


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return encode_raw(pixels)
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        return encode_qimg(pixels)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(buf: bytes, fmt: str, h: int, w: int) -> np.ndarray:
    if fmt == "raw":
        return decode_raw(buf, h, w)
    if fmt == "png":
        return decode_png(buf)
    if fmt == "jpeg":
        return decode_qimg(buf)
    raise ValueError(f"unknown fmt {fmt!r}")


# -- raw ---------------------------------------------------------------------

def encode_raw(pixels: np.ndarray) -> bytes:
    return np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def decode_raw(buf: bytes, h: int, w: int) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.uint8, count=h * w * 3).reshape(h, w, 3)


# -- png ---------------------------------------------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, level: int = 1) -> bytes:
    """Valid 8-bit RGB PNG, filter type 0 per scanline."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    scan = np.empty((h, 1 + w * 3), dtype=np.uint8)
    scan[:, 0] = 0  # filter: None
    scan[:, 1:] = px.reshape(h, w * 3)
    idat = zlib.compress(scan.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(buf: bytes) -> np.ndarray:
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    off = 8
    w = h = None
    idat = []
    mv = memoryview(buf)
    while off < len(buf):
        (length,) = struct.unpack_from(">I", mv, off)
        tag = bytes(mv[off + 4 : off + 8])
        payload = mv[off + 8 : off + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", payload, 0)
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB PNGs supported")
        elif tag == b"IDAT":
            idat.append(bytes(payload))
        elif tag == b"IEND":
            break
        off += 12 + length
    raw = zlib.decompress(b"".join(idat))
    stride = 1 + w * 3
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    filt = scan[:, 0]
    if np.all(filt == 0):  # fast path: our own encoder output
        return scan[:, 1:].reshape(h, w, 3).copy()
    data = scan[:, 1:].astype(np.int16)
    out = np.zeros((h, w * 3), dtype=np.uint8)
    bpp = 3
    for row in range(h):
        f = filt[row]
        cur = data[row].copy()
        prior = out[row - 1].astype(np.int16) if row else np.zeros(w * 3, np.int16)
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = (cur + prior) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need sequential x
            rec = np.zeros(w * 3, np.int16)
            for x in range(w * 3):
                a = rec[x - bpp] if x >= bpp else 0
                b = prior[x]
                if f == 1:
                    rec[x] = (cur[x] + a) & 0xFF
                elif f == 3:
                    rec[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prior[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[row] = rec.astype(np.uint8)
    return out.reshape(h, w, 3)


# -- qimg (deterministic lossy "jpeg" stand-in) ------------------------------

_QBITS = 6
_QMAX = (1 << _QBITS) - 1  # 63


def encode_qimg(pixels: np.ndarray, level: int = 1) -> bytes:
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    # uniform quantization to 6 bits: q = round(p * 63 / 255)
    q = ((px.astype(np.uint32) * _QMAX + 127) // 255).astype(np.uint8)
    comp = zlib.compress(q.tobytes(), level)
    return _QIMG_MAGIC + struct.pack("<HHB", h, w, _QBITS) + comp


def decode_qimg(buf: bytes) -> np.ndarray:
    if buf[:4] != _QIMG_MAGIC:
        raise ValueError("not a QIMG buffer")
    h, w, qbits = struct.unpack_from("<HHB", buf, 4)
    q = np.frombuffer(zlib.decompress(buf[9:]), dtype=np.uint8).reshape(h, w, 3)
    qmax = (1 << qbits) - 1
    # dequant: p = round(q * 255 / qmax)
    return ((q.astype(np.uint32) * 255 + qmax // 2) // qmax).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))
