"""Synthetic layered-affine scene generator (irr_tpu/data/synth.py).

The generator stands in for FlyingChairsOcc when no real dataset is
reachable (VERDICT round-2 item 2: accuracy runs need data). These tests
pin the properties training relies on: photo-consistency of img1/img2
under the GT flow outside occlusion, forward/backward flow inverse
consistency, geometric (not noise) occlusion, and the exact on-disk
layout the FlyingChairsOcc loader globs for.
"""

import numpy as np
import pytest

from irr_tpu.data import synth
from irr_tpu.data.synth import make_scene, generate_chairs_occ, _bilinear


@pytest.fixture(scope="module")
def scene():
    return make_scene(np.random.RandomState(7), h=128, w=192)


def test_scene_shapes_and_ranges(scene):
    h, w = 128, 192
    assert scene["img1"].shape == (h, w, 3) and scene["img1"].dtype == np.uint8
    assert scene["img2"].shape == (h, w, 3) and scene["img2"].dtype == np.uint8
    assert scene["flow_f"].shape == (h, w, 2) and scene["flow_f"].dtype == np.float32
    assert scene["flow_b"].shape == (h, w, 2)
    assert set(np.unique(scene["occ1"])) <= {0, 255}
    assert set(np.unique(scene["occ2"])) <= {0, 255}
    # occlusion exists (objects move) but is not the whole frame
    frac = (scene["occ1"] > 0).mean()
    assert 0.005 < frac < 0.5, frac
    # flow has real motion and discontinuities (object vs background)
    mag = np.linalg.norm(scene["flow_f"], axis=-1)
    assert mag.max() > 4.0
    assert mag.std() > 0.5


def test_photo_consistency_under_gt_flow(scene):
    """img2 sampled at p + flow_f(p) matches img1 on non-occluded pixels and
    mismatches on occluded ones (the signal the photometric prior learns)."""
    h, w = scene["img1"].shape[:2]
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    ys = yy + scene["flow_f"][..., 1]
    xs = xx + scene["flow_f"][..., 0]
    warped = _bilinear(scene["img2"].astype(np.float32) / 255.0, ys, xs)
    err = np.abs(warped - scene["img1"].astype(np.float32) / 255.0).mean(-1)
    vis = scene["occ1"] == 0
    # bilinear resampling of fine-grained texture leaves a small residual;
    # the visible-region error must still be far below the occluded-region one
    assert err[vis].mean() < 0.05, err[vis].mean()
    if (~vis).sum() > 50:
        assert err[~vis].mean() > 3 * err[vis].mean()


def test_forward_backward_flow_inverse(scene):
    """flow_b sampled at p + flow_f(p) is ~ -flow_f(p) where neither end is
    occluded (exact for affine layers, bilinear-sampling error only)."""
    h, w = scene["img1"].shape[:2]
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    ys = yy + scene["flow_f"][..., 1]
    xs = xx + scene["flow_f"][..., 0]
    fb = _bilinear(scene["flow_b"], ys, xs)
    resid = np.linalg.norm(fb + scene["flow_f"], axis=-1)
    inb = (ys >= 1) & (ys <= h - 2) & (xs >= 1) & (xs <= w - 2)
    vis = (scene["occ1"] == 0) & inb
    # median, not mean: pixels bilinear-straddling a motion boundary mix
    # two layers' backward flows
    assert np.median(resid[vis]) < 0.5, np.median(resid[vis])


def test_determinism():
    a = make_scene(np.random.RandomState(3), h=64, w=96)
    b = make_scene(np.random.RandomState(3), h=64, w=96)
    for k in a:
        assert np.array_equal(a[k], b[k]), k


def test_generate_layout_loads_via_dataset(tmp_path):
    """generate_chairs_occ writes the exact glob contract of FlyingChairsOcc
    and the loaded example matches the generated arrays."""
    from irr_tpu.data import FlyingChairsOccFull
    root = str(tmp_path / "chairs")
    generate_chairs_occ(root, n=3, h=64, w=96, seed=5)
    ds = FlyingChairsOccFull(root=root, photometric_augmentations=False)
    assert len(ds) == 3
    ex = ds[1]
    ref = make_scene(np.random.RandomState(5 * 1000003 + 1), h=64, w=96)
    assert np.array_equal(ex["input1"], ref["img1"])
    assert np.array_equal(ex["target_occ1"][..., 0], ref["occ1"])
    assert np.allclose(ex["target1"], ref["flow_f"], atol=1e-6)
    assert np.allclose(ex["target2"], ref["flow_b"], atol=1e-6)
    # sharded generation appends without overlap
    generate_chairs_occ(root, n=2, h=64, w=96, seed=5, start=3)
    ds2 = FlyingChairsOccFull(root=root, photometric_augmentations=False)
    assert len(ds2) == 5


def test_generate_kitti_layout_loads_via_dataset(tmp_path):
    """generate_kitti writes the KITTI-2015 scene-flow glob contract; the
    loaded example round-trips the 16-bit flow encoding (1/64 px quantized)
    and the sparse valid mask, and padded eval pads to the 64-multiple."""
    from irr_tpu.data import KittiComb2015Full
    from irr_tpu.data.synth import generate_kitti, make_scene
    root = str(tmp_path / "kitti")
    sizes = [(74, 96), (70, 88)]
    generate_kitti(root, n=4, seed=9, sizes=sizes)
    ds = KittiComb2015Full(root=root, photometric_augmentations=False,
                           preprocessing_crop=False, pad_multiple=64)
    assert len(ds) == 4
    ex = ds[1]
    h, w = sizes[1]
    assert ex["input_size"] == (h, w)
    assert ex["input1"].shape == (128, 128, 3)  # padded to 64-multiple
    ref = make_scene(np.random.RandomState(9 * 2000003 + 1), h=h, w=w)
    assert np.array_equal(ex["input1"][:h, :w], ref["img1"])
    valid = ex["input_valid"][..., 0]
    # sparse, vertically ramped validity; padding region is all-invalid
    assert 0.1 < valid[:h, :w].mean() < 0.7
    assert valid[:h // 4].mean() < valid[3 * h // 4: h].mean()
    assert valid[h:].sum() == 0 and valid[:, w:].sum() == 0
    sel = valid[:h, :w] > 0
    err = np.abs(ex["target1"][:h, :w][sel] - ref["flow_f"][sel])
    assert err.max() <= 1.0 / 64 + 1e-4  # 16-bit KITTI quantization
