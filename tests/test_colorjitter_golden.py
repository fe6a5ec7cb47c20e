"""ColorJitter pinned BIT-EXACTLY against PIL.

The reference's jitter runs through torchvision's PIL backend
(ToPILImage -> ColorJitter -> ToTensor, datasets/transforms.py:53-74 +
flyingchairsOcc.py:148-163), i.e. PIL ImageEnhance + uint8 HSV roundtrips.
torchvision itself is not installed here, but PIL is the arithmetic that
matters: ImageEnhance.Brightness/Contrast/Color and convert('HSV')/RGB are
exactly what torchvision's functional PIL path wraps. Every adjustment must
match PIL EXACTLY (zero mismatching uint8 values)."""

import numpy as np
import pytest
from PIL import Image, ImageEnhance

from irr_tpu.data.transforms import (adjust_brightness_u8, adjust_contrast_u8,
                                     adjust_saturation_u8, adjust_hue_u8,
                                     rgb_to_hsv_u8, hsv_to_rgb_u8,
                                     pil_grayscale_u8, PhotometricPair)

FACTORS = [0.5, 0.716, 0.937, 1.0, 1.25, 1.5]


def _imgs():
    rng = np.random.RandomState(7)
    yield rng.randint(0, 256, (64, 48, 3), dtype=np.uint8)
    yield rng.randint(0, 256, (31, 17, 3), dtype=np.uint8)
    # gradient image exercises flat/saturated regions
    g = np.linspace(0, 255, 64 * 48 * 3).reshape(64, 48, 3)
    yield g.astype(np.uint8)


@pytest.mark.parametrize("factor", FACTORS)
def test_brightness_exact(factor):
    for img in _imgs():
        want = np.array(ImageEnhance.Brightness(Image.fromarray(img)).enhance(factor))
        got = adjust_brightness_u8(img, factor)
        assert (got == want).all(), int((got != want).sum())


@pytest.mark.parametrize("factor", FACTORS)
def test_contrast_exact(factor):
    for img in _imgs():
        want = np.array(ImageEnhance.Contrast(Image.fromarray(img)).enhance(factor))
        got = adjust_contrast_u8(img, factor)
        assert (got == want).all(), int((got != want).sum())


@pytest.mark.parametrize("factor", FACTORS)
def test_saturation_exact(factor):
    for img in _imgs():
        want = np.array(ImageEnhance.Color(Image.fromarray(img)).enhance(factor))
        got = adjust_saturation_u8(img, factor)
        assert (got == want).all(), int((got != want).sum())


def test_grayscale_exact():
    for img in _imgs():
        want = np.array(Image.fromarray(img).convert("L"))
        got = pil_grayscale_u8(img)
        assert (got == want).all()


def test_hsv_roundtrip_exact():
    for img in _imgs():
        pim = Image.fromarray(img)
        want_hsv = np.array(pim.convert("HSV"))
        got_hsv = rgb_to_hsv_u8(img)
        assert (got_hsv == want_hsv).all(), int((got_hsv != want_hsv).sum())
        want_rgb = np.array(Image.fromarray(want_hsv, "HSV").convert("RGB"))
        got_rgb = hsv_to_rgb_u8(got_hsv)
        assert (got_rgb == want_rgb).all(), int((got_rgb != want_rgb).sum())


@pytest.mark.parametrize("shift", [-0.5, -0.21, 0.0, 0.17, 0.5])
def test_hue_exact(shift):
    """torchvision F.adjust_hue PIL path: uint8 HSV roundtrip + wrapping
    uint8 add of np.uint8(shift * 255)."""
    for img in _imgs():
        pim = Image.fromarray(img)
        h, s, v = pim.convert("HSV").split()
        np_h = np.array(h, dtype=np.uint8)
        with np.errstate(over="ignore"):
            np_h += np.uint8(int(shift * 255) & 0xFF)
        want = np.array(Image.merge(
            "HSV", (Image.fromarray(np_h, "L"), s, v)).convert("RGB"))
        got = adjust_hue_u8(img, shift)
        assert (got == want).all(), (shift, int((got != want).sum()))


def test_pair_shares_parameters():
    """Both frames of the pair get identical jitter parameters (the
    reference's ConcatTransformSplitChainer contract)."""
    rng = np.random.RandomState(3)
    im = rng.randint(0, 256, (32, 24, 3), dtype=np.uint8)
    p = PhotometricPair(enabled=True, rng=np.random.RandomState(0))
    o1, o2 = p(im, im.copy())
    np.testing.assert_array_equal(o1, o2)
    assert o1.dtype == np.float32 and o1.max() <= 1.0 and o1.min() >= 0.0


def test_pair_disabled_passthrough():
    rng = np.random.RandomState(3)
    im1 = rng.randint(0, 256, (32, 24, 3), dtype=np.uint8)
    im2 = rng.randint(0, 256, (32, 24, 3), dtype=np.uint8)
    o1, o2 = PhotometricPair(enabled=False)(im1, im2)
    # disabled path keeps uint8 (device normalizes in-graph; see
    # nn/core.py:normalize_image_batch and its bit-exactness test in
    # test_data.py::test_photometric_disabled_is_tototensor)
    assert o1.dtype == np.uint8 and o2.dtype == np.uint8
    np.testing.assert_array_equal(o1, im1)
    np.testing.assert_array_equal(o2, im2)
