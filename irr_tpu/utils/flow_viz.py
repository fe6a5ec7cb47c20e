"""Flow visualization (mirrors reference utils/flow.py:65-210), HWC in/out.

`flow_to_rgb` is the simple red/blue encoding; `flow_to_rgb_middlebury` is
the standard Middlebury color-wheel code (vectorized)."""

import numpy as np

UNKNOWN_FLOW_THRESH = 1e7


def flow_to_rgb(flow_hw2, max_value=None):
    """Simple RGB encoding (utils/flow.py:65-75). flow: (H, W, 2) -> float [0,1]."""
    h, w, _ = flow_hw2.shape
    rgb = np.ones((h, w, 3), np.float32)
    norm = flow_hw2 / (max_value if max_value is not None
                       else np.abs(flow_hw2).max() + np.finfo(np.float32).eps)
    rgb[:, :, 0] += norm[:, :, 0]
    rgb[:, :, 1] -= 0.5 * (norm[:, :, 0] + norm[:, :, 1])
    rgb[:, :, 2] += norm[:, :, 1]
    return rgb.clip(0, 1)


def make_color_wheel():
    """Middlebury color wheel: 55 colors over 6 hue ramps (utils/flow.py:123-170)."""
    # (count, full-color channel, ramp channel, ramp descends on full channel)
    ramps = [(15, 0, 1, False), (6, 1, 0, True), (4, 1, 2, False),
             (11, 2, 1, True), (13, 2, 0, False), (6, 0, 2, True)]
    rows = []
    for n, full, ramp, descending in ramps:
        block = np.zeros((n, 3))
        vals = np.floor(255 * np.arange(n) / n)
        block[:, full] = 255
        block[:, ramp] = (255 - vals) if descending else vals
        rows.append(block)
    return np.concatenate(rows, axis=0)


def _compute_color(u, v):
    h, w = u.shape
    nan_idx = np.isnan(u) | np.isnan(v)
    u = np.where(nan_idx, 0, u)
    v = np.where(nan_idx, 0, v)

    wheel = make_color_wheel()
    ncols = wheel.shape[0]
    rad = np.sqrt(u ** 2 + v ** 2)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1) + 1
    k0 = np.floor(fk).astype(int)
    k1 = k0 + 1
    k1[k1 == ncols + 1] = 1
    f = fk - k0

    img = np.zeros((h, w, 3))
    for i in range(3):
        col0 = wheel[k0 - 1, i] / 255
        col1 = wheel[k1 - 1, i] / 255
        col = (1 - f) * col0 + f * col1
        inside = rad <= 1
        col = np.where(inside, 1 - rad * (1 - col), col * 0.75)
        img[:, :, i] = np.floor(255 * col * (1 - nan_idx)).astype(np.uint8)
    return img


def flow_to_rgb_middlebury(flow_hw2):
    """Middlebury color code image (utils/flow.py:173-210).
    flow: (H, W, 2) -> (H, W, 3) uint8."""
    u = flow_hw2[:, :, 0].astype(np.float64).copy()
    v = flow_hw2[:, :, 1].astype(np.float64).copy()
    unknown = (np.abs(u) > UNKNOWN_FLOW_THRESH) | (np.abs(v) > UNKNOWN_FLOW_THRESH)
    u[unknown] = 0
    v[unknown] = 0
    rad = np.sqrt(u ** 2 + v ** 2)
    maxrad = max(-1, np.max(rad))
    u = u / (maxrad + np.finfo(float).eps)
    v = v / (maxrad + np.finfo(float).eps)
    img = _compute_color(u, v)
    img[np.repeat(unknown[:, :, None], 3, axis=2)] = 0
    return img.astype(np.uint8)
