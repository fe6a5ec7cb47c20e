"""Host-side photometric transforms (numpy), PIL-bit-exact.

The reference applies ToPILImage -> ColorJitter(0.5,0.5,0.5,0.5) -> ToTensor
-> RandomGamma(0.7..1.5, clip) over the CONCATENATED image pair so both
frames receive identical jitter (datasets/transforms.py:53-74 and the chain
built per-dataset, e.g. flyingchairsOcc.py:148-163). torchvision's
ColorJitter on PIL images runs entirely in uint8 through PIL ImageEnhance /
HSV conversion, with PIL's own truncation and mixed f32/f64 arithmetic —
NOT the float math a naive reimplementation would use.

This module replicates the PIL path bit-exactly in numpy (verified against
PIL in tests/test_colorjitter_golden.py):
  - brightness/contrast/saturation = ImageEnhance.{Brightness,Contrast,
    Color}: out = trunc(f32(degenerate + (img - degenerate) * factor)),
    clipped to uint8;
  - the L (grayscale) degenerate uses PIL's fixed-point conversion
    (r*19595 + g*38470 + b*7471 + 0x8000) >> 16;
  - Contrast's constant is int(mean(L) + 0.5);
  - hue = torchvision F.adjust_hue's PIL path: uint8 HSV roundtrip with
    wrap-around uint8 addition of trunc(hue_factor * 255). PIL rgb2hsv
    computes the chroma ratios in f32, combines them in f64, STORES h in
    f32, and takes the final mod/scale in f64 with an f32 rounding before
    truncation (Convert.c); hsv2rgb rounds each channel with +0.5.
The op order is a uniform random permutation of the enabled adjustments
(torchvision ColorJitter shuffles its transform list per call).
"""

import numpy as np

_F32 = np.float32
_F64 = np.float64


def pil_grayscale_u8(img):
    """PIL RGB->L: (r*19595 + g*38470 + b*7471 + 0x8000) >> 16."""
    r = img[..., 0].astype(np.uint32)
    g = img[..., 1].astype(np.uint32)
    b = img[..., 2].astype(np.uint32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(np.uint8)


def _pil_blend(degenerate, img, factor):
    """PIL Image.blend / ImageEnhance: truncating f32 interpolation."""
    x = (degenerate.astype(_F32)
         + (img.astype(_F32) - degenerate.astype(_F32)) * _F32(factor))
    return np.clip(np.trunc(x), 0, 255).astype(np.uint8)


def adjust_brightness_u8(img, factor):
    return _pil_blend(np.zeros_like(img), img, factor)


def adjust_contrast_u8(img, factor):
    mean = int(pil_grayscale_u8(img).mean(dtype=_F64) + 0.5)
    return _pil_blend(np.full_like(img, mean), img, factor)


def adjust_saturation_u8(img, factor):
    degenerate = np.repeat(pil_grayscale_u8(img)[..., None], 3, axis=-1)
    return _pil_blend(degenerate, img, factor)


def rgb_to_hsv_u8(img):
    """PIL convert('HSV'), bit-exact (see module docstring)."""
    r, g, b = (img[..., i].astype(_F32) for i in range(3))
    maxc = np.maximum(np.maximum(r, g), b)
    minc = np.minimum(np.minimum(r, g), b)
    eq = maxc == minc
    cr = np.where(eq, _F32(1.0), maxc - minc).astype(_F32)
    rc = ((maxc - r) / cr).astype(_F32)
    gc = ((maxc - g) / cr).astype(_F32)
    bc = ((maxc - b) / cr).astype(_F32)
    # C: the g/b branches contain double literals, so they combine in f64;
    # all branches are stored into a float (f32) h.
    h = np.where(maxc == r, bc.astype(_F64) - gc.astype(_F64),
                 np.where(maxc == g, 2.0 + rc.astype(_F64) - bc.astype(_F64),
                          4.0 + gc.astype(_F64) - rc.astype(_F64))).astype(_F32)
    m = np.mod(h.astype(_F64) / 6.0 + 1.0, 1.0).astype(_F32)
    hh = np.where(eq, 0, np.trunc(m * _F32(255.0))).astype(np.uint8)
    s = (cr / np.where(maxc == 0, _F32(1.0), maxc)).astype(_F32)
    ss = np.where(eq, 0, np.trunc(s.astype(_F64) * 255.0)).astype(np.uint8)
    return np.stack([hh, ss, maxc.astype(np.uint8)], axis=-1)


def hsv_to_rgb_u8(hsv):
    """PIL convert HSV->'RGB', bit-exact: classic sextant formula with
    +0.5 rounding per channel."""
    h = hsv[..., 0].astype(_F64) / 255.0
    s = hsv[..., 1].astype(_F64) / 255.0
    v = hsv[..., 2].astype(_F64)
    i = np.trunc(h * 6.0)
    f = h * 6.0 - i
    fp = np.trunc(v * (1.0 - s) + 0.5)
    fq = np.trunc(v * (1.0 - s * f) + 0.5)
    ft = np.trunc(v * (1.0 - s * (1.0 - f)) + 0.5)
    vr = np.trunc(v + 0.5)
    ii = i.astype(np.int32) % 6
    out = np.zeros(hsv.shape, dtype=np.uint8)
    table = [(vr, ft, fp), (fq, vr, fp), (fp, vr, ft),
             (fp, fq, vr), (ft, fp, vr), (vr, fp, fq)]
    for k, chans in enumerate(table):
        m = ii == k
        for c in range(3):
            out[..., c] = np.where(m, chans[c], out[..., c])
    return out


def adjust_hue_u8(img, hue_factor):
    """torchvision F.adjust_hue (PIL path): uint8 HSV roundtrip, wrapping
    uint8 addition of np.uint8(hue_factor * 255)."""
    hsv = rgb_to_hsv_u8(img)
    shift = np.uint8(int(hue_factor * 255) & 0xFF)
    hsv[..., 0] = hsv[..., 0] + shift  # uint8 wrap-around, as torchvision
    return hsv_to_rgb_u8(hsv)


class ColorJitter:
    """torchvision ColorJitter (PIL backend), bit-exact in uint8.

    One parameter draw per __call__; ops applied in a random permutation.
    """

    def __init__(self, brightness=0.5, contrast=0.5, saturation=0.5, hue=0.5,
                 rng=None):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.rng = rng if rng is not None else np.random

    def __call__(self, img_u8, rng=None):
        rng = self.rng if rng is None else rng
        ops = []
        if self.brightness:
            f = rng.uniform(max(0.0, 1 - self.brightness), 1 + self.brightness)
            ops.append(lambda x, f=f: adjust_brightness_u8(x, f))
        if self.contrast:
            f = rng.uniform(max(0.0, 1 - self.contrast), 1 + self.contrast)
            ops.append(lambda x, f=f: adjust_contrast_u8(x, f))
        if self.saturation:
            f = rng.uniform(max(0.0, 1 - self.saturation), 1 + self.saturation)
            ops.append(lambda x, f=f: adjust_saturation_u8(x, f))
        if self.hue:
            f = rng.uniform(-self.hue, self.hue)
            ops.append(lambda x, f=f: adjust_hue_u8(x, f))
        for k in rng.permutation(len(ops)):
            img_u8 = ops[k](img_u8)
        return img_u8


class RandomGamma:
    """(datasets/transforms.py:17-28) — float domain, after ToTensor."""

    def __init__(self, min_gamma=0.7, max_gamma=1.5, clip_image=False, rng=None):
        self.min_gamma = min_gamma
        self.max_gamma = max_gamma
        self.clip_image = clip_image
        self.rng = rng if rng is not None else np.random

    def __call__(self, img, rng=None):
        rng = self.rng if rng is None else rng
        gamma = rng.uniform(self.min_gamma, self.max_gamma)
        adjusted = np.power(img, gamma)
        if self.clip_image:
            adjusted = np.clip(adjusted, 0.0, 1.0)
        return adjusted


class PhotometricPair:
    """Shared-parameter photometric chain over an image pair.

    Equivalent to the reference's ConcatTransformSplitChainer over
    [ToPILImage, ColorJitter, ToTensor, RandomGamma]: the pair is stacked
    along H so every random parameter applies identically to both frames;
    jitter runs in uint8 (the PIL domain), gamma in float after /255.
    """

    def __init__(self, enabled=True, rng=None):
        self.enabled = enabled
        self.rng = rng if rng is not None else np.random
        self.jitter = ColorJitter(rng=self.rng)
        self.gamma = RandomGamma(0.7, 1.5, clip_image=True, rng=self.rng)

    def __call__(self, im1_byte, im2_byte, rng=None):
        if not self.enabled:
            # stay uint8: the device step normalizes in-graph
            # (nn/core.py:normalize_image_batch), quartering H2D bytes
            return (np.asarray(im1_byte, np.uint8),
                    np.asarray(im2_byte, np.uint8))
        h = im1_byte.shape[0]
        both = np.concatenate([np.asarray(im1_byte, np.uint8),
                               np.asarray(im2_byte, np.uint8)], axis=0)
        both = self.gamma(self.jitter(both, rng=rng).astype(np.float32) / 255.0,
                          rng=rng)
        return both[:h], both[h:]
