"""Host-side photometric transforms (numpy, HWC float32).

The reference applies ToPILImage -> ColorJitter(0.5,0.5,0.5,0.5) -> ToTensor
-> RandomGamma(0.7..1.5, clip) over the CONCATENATED image pair so both
frames receive identical jitter (datasets/transforms.py:53-74 and the chain
built per-dataset, e.g. flyingchairsOcc.py:148-163). We reproduce that as
numpy ops: one sampled parameter set applied to the stacked pair.

ColorJitter semantics follow torchvision: each factor enabled with a random
order; brightness/contrast/saturation blend toward 0 / mean-gray / grayscale
with factor uniform in [max(0, 1-v), 1+v]; hue shifts the HSV hue channel by
uniform [-h, h]. Values clipped to [0, 1] after each op (PIL uint8 clamping
analog).
"""

import numpy as np


def _blend(img1, img2, ratio):
    return np.clip(ratio * img1 + (1.0 - ratio) * img2, 0.0, 1.0)


def _grayscale(img):
    g = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    return g[..., None]


def adjust_brightness(img, factor):
    return _blend(img, np.zeros_like(img), factor)


def adjust_contrast(img, factor):
    mean = _grayscale(img).mean()
    return _blend(img, np.full_like(img, mean), factor)


def adjust_saturation(img, factor):
    return _blend(img, np.broadcast_to(_grayscale(img), img.shape), factor)


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = np.max(img, axis=-1)
    minc = np.min(img, axis=-1)
    v = maxc
    deltac = maxc - minc
    s = np.where(maxc > 0, deltac / np.maximum(maxc, 1e-12), 0.0)
    dz = np.where(deltac == 0, 1.0, deltac)
    rc = (maxc - r) / dz
    gc = (maxc - g) / dz
    bc = (maxc - b) / dz
    h = np.where(maxc == r, bc - gc,
                 np.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = np.where(deltac == 0, 0.0, h)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(np.int32) % 6
    out = np.zeros(h.shape + (3,), dtype=h.dtype)
    conds = [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)]
    for k, (rr, gg, bb) in enumerate(conds):
        m = i == k
        out[..., 0] = np.where(m, rr, out[..., 0])
        out[..., 1] = np.where(m, gg, out[..., 1])
        out[..., 2] = np.where(m, bb, out[..., 2])
    return out


def adjust_hue(img, shift):
    h, s, v = _rgb_to_hsv(img)
    return np.clip(_hsv_to_rgb((h + shift) % 1.0, s, v), 0.0, 1.0)


class ColorJitter:
    """torchvision-equivalent jitter; one parameter draw per __call__."""

    def __init__(self, brightness=0.5, contrast=0.5, saturation=0.5, hue=0.5,
                 rng=None):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.rng = rng if rng is not None else np.random

    def __call__(self, img):
        ops = []
        if self.brightness:
            f = self.rng.uniform(max(0.0, 1 - self.brightness), 1 + self.brightness)
            ops.append(lambda x: adjust_brightness(x, f))
        if self.contrast:
            f = self.rng.uniform(max(0.0, 1 - self.contrast), 1 + self.contrast)
            ops.append(lambda x: adjust_contrast(x, f))
        if self.saturation:
            f = self.rng.uniform(max(0.0, 1 - self.saturation), 1 + self.saturation)
            ops.append(lambda x: adjust_saturation(x, f))
        if self.hue:
            f = self.rng.uniform(-self.hue, self.hue)
            ops.append(lambda x: adjust_hue(x, f))
        order = self.rng.permutation(len(ops))
        for k in order:
            img = ops[k](img)
        return img


class RandomGamma:
    """(datasets/transforms.py:17-28)."""

    def __init__(self, min_gamma=0.7, max_gamma=1.5, clip_image=False, rng=None):
        self.min_gamma = min_gamma
        self.max_gamma = max_gamma
        self.clip_image = clip_image
        self.rng = rng if rng is not None else np.random

    def __call__(self, img):
        gamma = self.rng.uniform(self.min_gamma, self.max_gamma)
        adjusted = np.power(img, gamma)
        if self.clip_image:
            adjusted = np.clip(adjusted, 0.0, 1.0)
        return adjusted


class PhotometricPair:
    """Shared-parameter photometric chain over an image pair.

    Equivalent to the reference's ConcatTransformSplitChainer over
    [ColorJitter, RandomGamma]: the pair is stacked along H so every random
    parameter applies identically to both frames.
    """

    def __init__(self, enabled=True, rng=None):
        self.enabled = enabled
        self.rng = rng if rng is not None else np.random
        self.jitter = ColorJitter(rng=self.rng)
        self.gamma = RandomGamma(0.7, 1.5, clip_image=True, rng=self.rng)

    def __call__(self, im1_byte, im2_byte):
        im1 = im1_byte.astype(np.float32) / 255.0
        im2 = im2_byte.astype(np.float32) / 255.0
        if not self.enabled:
            return im1, im2
        h = im1.shape[0]
        both = np.concatenate([im1, im2], axis=0)
        both = self.gamma(self.jitter(both))
        return both[:h], both[h:]
