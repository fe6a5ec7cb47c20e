"""File readers for the optical-flow datasets (host-side, numpy).

Mirrors reference datasets/common.py:10-42 semantics, HWC numpy outputs
(the framework is NHWC end-to-end; no CHW transpose ever happens).
"""

import struct
import zlib

import numpy as np
from PIL import Image

FLO_MAGIC = 202021.25


def read_flo(filename) -> np.ndarray:
    """Middlebury .flo reader -> (H, W, 2) float32 (common.py:19-27)."""
    with open(filename, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        assert magic.size == 1 and magic[0] == np.float32(FLO_MAGIC), \
            "Magic number incorrect. Invalid .flo file"
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * h * w)
    return np.resize(data, (h, w, 2))


def _parse_png(data: bytes):
    """Split a PNG byte stream into (w, h, bitdepth, colortype, interlace,
    concatenated IDAT payload)."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    idat = []
    w = h = bitdepth = colortype = interlace = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, colortype, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    return w, h, bitdepth, colortype, interlace, b"".join(idat)


_PNG8_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray / RGB / RGBA


def _defilter_py(raw, h, stride, bpp):
    """Pure-python PNG defilter fallback (vectorized None/Up/Sub rows;
    sequential Average/Paeth) -> (h * stride,) uint8."""
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    off = 0
    for y in range(h):
        ftype = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).astype(np.int32)
        off += 1 + stride
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # Sub: cumulative over columns grouped by x % bpp
            g = line.reshape(stride // bpp, bpp)
            cur = np.cumsum(g, axis=0, dtype=np.int64).astype(np.int32).reshape(-1) & 0xFF
        else:  # Average (3) / Paeth (4): sequential left dependency
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 3:
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (line[x] + pred) & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(-1)


def read_png8(filename) -> np.ndarray:
    """Native-path 8-bit PNG decode -> uint8 (H, W) or (H, W, C).

    zlib inflate (C) + the native C++ defilter (irr_tpu/native, bpp-generic)
    replace PIL's decoder on the loader hot path (~3-5x; PIL spends most of
    its time in per-row Python-side plumbing). Returns None for PNG variants
    outside 8-bit gray/RGB/RGBA non-interlaced (palette, 16-bit, Adam7) —
    callers fall back to PIL.
    """
    with open(filename, "rb") as f:
        data = f.read()
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    w, h, bitdepth, colortype, interlace, idat = _parse_png(data)
    if bitdepth != 8 or colortype not in _PNG8_CHANNELS or interlace != 0:
        return None
    ch = _PNG8_CHANNELS[colortype]
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        return None
    from ..native import defilter_png8
    out = defilter_png8(raw, h, stride, ch)
    if out is None:  # no toolchain: pure-python defilter
        out = _defilter_py(raw, h, stride, ch)
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def read_image_as_byte(filename) -> np.ndarray:
    """uint8 HWC (or HW for grayscale)."""
    from .cache import cached_array
    return cached_array(filename, _read_image_as_byte_impl)


def _read_image_as_byte_impl(filename) -> np.ndarray:
    if filename.endswith(".png"):
        img = read_png8(filename)
        if img is not None:
            return img
    return np.asarray(Image.open(filename))


def read_image_as_float32(filename) -> np.ndarray:
    return np.asarray(Image.open(filename)).astype(np.float32) / np.float32(255.0)


def read_occ_image_as_float32(filename) -> np.ndarray:
    """(H, W, 1) float32 in [0,1]; multi-channel inputs use channel 0
    (common.py:30-34)."""
    occ = np.asarray(Image.open(filename)).astype(np.float32) / np.float32(255.0)
    if occ.ndim == 3:
        occ = occ[:, :, 0]
    return occ[:, :, None]


def read_occ_image_as_uint8(filename) -> np.ndarray:
    """(H, W, 1) uint8 occlusion map (values 0/255). Ships 4x fewer
    host->device bytes than the float reader; the device step divides by
    255 in-graph (nn/core.py:normalize_image_batch) — bit-identical to
    read_occ_image_as_float32."""
    occ = read_image_as_byte(filename)
    if occ.ndim == 3:
        occ = occ[:, :, 0]
    return np.asarray(occ, np.uint8)[:, :, None]


def read_png16_rgb(filename) -> np.ndarray:
    """Read a 16-bit RGB PNG -> (H, W, 3) uint16.

    PIL/imageio truncate 16-bit RGB to 8 bits, so KITTI flow PNGs need a
    real decoder. Minimal, handles all 5 PNG row filters; non-interlaced.
    """
    from .cache import cached_array
    return cached_array(filename, _read_png16_rgb_impl)


def _read_png16_rgb_impl(filename) -> np.ndarray:
    with open(filename, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", filename
    w, h, bitdepth, colortype, interlace, idat = _parse_png(data)
    assert bitdepth == 16 and colortype == 2 and interlace == 0, \
        f"unsupported PNG variant {bitdepth}/{colortype} in {filename}"
    raw = zlib.decompress(idat)
    # fast path: native C++ defilter (irr_tpu/native)
    from ..native import defilter_png16
    native = defilter_png16(raw, h, w)
    if native is not None:
        return native
    out = _defilter_py(raw, h, w * 6, 6)
    img = out.reshape(h, w, 3, 2)
    return (img[..., 0].astype(np.uint16) << 8) | img[..., 1].astype(np.uint16)


def read_png16_flow(filename):
    """KITTI 16-bit PNG flow -> ((H, W, 2) float32, (H, W, 1) valid mask).

    Decode (v - 2^15) / 64 with the third channel as validity
    (kitti_combined.py:19-34).
    """
    img = read_png16_rgb(filename)
    flow = (img[:, :, :2].astype(np.float64) - 2 ** 15) / 64.0
    valid = (img[:, :, 2:3] > 0).astype(np.float32)
    return (flow * valid).astype(np.float32), valid


def ensure_hwc1(x: np.ndarray) -> np.ndarray:
    if x.ndim == 2:
        return x[:, :, None]
    return x
