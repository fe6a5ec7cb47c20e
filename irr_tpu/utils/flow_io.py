"""Flow file writers (mirrors reference utils/flow.py:11-62).

KITTI's 16-bit PNG format is written with a small self-contained PNG
encoder (zlib) because pypng isn't available in this image; PIL reads the
result (and real KITTI files) fine.
"""

import struct
import zlib

import numpy as np

from ..data.common import read_flo, read_png16_rgb  # re-export for convenience

FLO_TAG = np.array([202021.25], np.float32)


def write_flo(filename, uv):
    """Middlebury .flo writer (utils/flow.py:11-34). uv: (H, W, 2)."""
    assert uv.ndim == 3 and uv.shape[2] == 2
    h, w = uv.shape[:2]
    with open(filename, "wb") as f:
        f.write(FLO_TAG.tobytes())
        f.write(np.asarray(w, np.int32).tobytes())
        f.write(np.asarray(h, np.int32).tobytes())
        f.write(uv.astype(np.float32).tobytes())


# reference name (utils/flow.py:11)
write_flow = write_flo


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def write_png16_rgb(filename, img_u16: np.ndarray):
    """Write (H, W, 3) uint16 as a 16-bit RGB PNG."""
    assert img_u16.ndim == 3 and img_u16.shape[2] == 3
    h, w = img_u16.shape[:2]
    big = img_u16.astype(">u2")
    raw = b"".join(b"\x00" + big[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)  # 16-bit, RGB
    data = (b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 6))
            + _png_chunk(b"IEND", b""))
    with open(filename, "wb") as f:
        f.write(data)


def write_flow_png(filename, uv, mask=None):
    """KITTI 16-bit flow PNG: (v*64 + 2^15, validity) (utils/flow.py:37-62)."""
    assert uv.ndim == 3 and uv.shape[2] == 2
    h, w = uv.shape[:2]
    valid = np.ones((h, w)) if mask is None else np.asarray(mask).reshape(h, w)
    flow_u = np.clip(uv[:, :, 0] * 64.0 + 2 ** 15, 0.0, 65535.0).astype(np.uint16)
    flow_v = np.clip(uv[:, :, 1] * 64.0 + 2 ** 15, 0.0, 65535.0).astype(np.uint16)
    out = np.stack([flow_u, flow_v, valid.astype(np.uint16)], axis=-1)
    write_png16_rgb(filename, out)
