"""Data layer tests: readers round-trip, split determinism, loader batching,
photometric pair-consistency — on synthetic datasets written to tmp."""

import os

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

from irr_tpu.data import common, DataLoader
from irr_tpu.data.datasets import (FlyingChairsOcc, FlyingChairsOccTrain,
                                   FlyingChairsOccValid, KittiComb2015Train,
                                   KittiComb2015Val)
from irr_tpu.data.splits import FLYINGCHAIRS_OCC_VALIDATE_INDICES
from irr_tpu.data.transforms import PhotometricPair
from irr_tpu.utils.flow_io import write_flo


def _write_flo(path, flow):
    write_flo(path, flow)


def _make_chairs_occ(root, n=12, h=32, w=48):
    rng = np.random.RandomState(0)
    for i in range(n):
        tag = f"{i:05d}"
        for suffix in ("img1", "img2"):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(root, f"{tag}_{suffix}.png"))
        for suffix in ("occ1", "occ2"):
            occ = ((rng.rand(h, w) > 0.5) * 255).astype(np.uint8)
            Image.fromarray(occ).save(os.path.join(root, f"{tag}_{suffix}.png"))
        _write_flo(os.path.join(root, f"{tag}_flow.flo"),
                   rng.randn(h, w, 2).astype(np.float32))
        _write_flo(os.path.join(root, f"{tag}_flow_b.flo"),
                   rng.randn(h, w, 2).astype(np.float32))


def test_flo_roundtrip(tmp_path):
    flow = np.random.RandomState(1).randn(7, 9, 2).astype(np.float32)
    p = str(tmp_path / "x.flo")
    _write_flo(p, flow)
    got = common.read_flo(p)
    np.testing.assert_array_equal(got, flow)


def test_png16_flow_roundtrip(tmp_path):
    """Our 16-bit PNG writer + the KITTI decode must round-trip to 1/64 px."""
    from irr_tpu.utils.flow_io import write_flow_png
    rng = np.random.RandomState(2)
    flow = np.round((rng.randn(8, 10, 2) * 10) * 64) / 64  # quantized to 1/64
    valid = (rng.rand(8, 10, 1) > 0.3).astype(np.float32)
    p = str(tmp_path / "f.png")
    write_flow_png(p, flow, mask=valid)
    got_flow, got_valid = common.read_png16_flow(p)
    np.testing.assert_array_equal(got_valid, valid)
    np.testing.assert_allclose(got_flow, flow * valid, atol=1 / 64)


def test_chairs_occ_split(tmp_path):
    root = str(tmp_path)
    _make_chairs_occ(root, n=12)
    train = FlyingChairsOccTrain(root=root)
    valid = FlyingChairsOccValid(root=root)
    in_range = [x for x in FLYINGCHAIRS_OCC_VALIDATE_INDICES if x < 12]
    assert len(valid) == len(in_range)
    assert len(train) == 12 - len(in_range)
    ex = valid[0]
    assert ex["input1"].shape == (32, 48, 3)
    assert ex["target1"].shape == (32, 48, 2)
    assert ex["target_occ1"].shape == (32, 48, 1)
    # images stay uint8 when no photometric transform runs; the device
    # step normalizes in-graph (nn/core.py:normalize_image_batch)
    assert ex["input1"].dtype == np.uint8
    from irr_tpu.nn.core import normalize_image_batch
    normed = normalize_image_batch({"input1": jnp.asarray(ex["input1"])})
    assert normed["input1"].dtype == jnp.float32
    assert 0.0 <= float(normed["input1"].min())
    assert float(normed["input1"].max()) <= 1.0


def test_loader_batches_and_shuffle_determinism(tmp_path):
    root = str(tmp_path)
    _make_chairs_occ(root, n=10)
    ds = FlyingChairsOcc(root=root, dstype="full",
                         photometric_augmentations=False)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
    b1 = [b["index"].tolist() for b in loader]
    assert sum(len(x) for x in b1) == 10
    loader2 = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
    b2 = [b["index"].tolist() for b in loader2]
    assert b1 == b2  # same seed + epoch -> same order
    batch = next(iter(DataLoader(ds, batch_size=4)))
    assert batch["input1"].shape == (4, 32, 48, 3)
    assert batch["target_occ2"].shape == (4, 32, 48, 1)


def test_photometric_pair_shares_parameters():
    rng = np.random.RandomState(3)
    im = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    photo = PhotometricPair(enabled=True, rng=np.random.RandomState(0))
    a, b = photo(im, im.copy())
    # identical inputs must stay identical under the shared-parameter chain
    np.testing.assert_allclose(a, b, atol=1e-6)
    # and the transform actually does something
    assert not np.allclose(a, im.astype(np.float32) / 255.0)


def test_photometric_disabled_is_tototensor():
    im = (np.arange(16 * 16 * 3).reshape(16, 16, 3) % 255).astype(np.uint8)
    photo = PhotometricPair(enabled=False)
    a, _ = photo(im, im)
    # disabled path ships uint8; the in-graph normalization must reproduce
    # the reference's ToTensor (f32/255) bit-for-bit
    assert a.dtype == np.uint8
    from irr_tpu.nn.core import normalize_image_batch
    normed = np.asarray(normalize_image_batch({"input1": jnp.asarray(a)})["input1"])
    np.testing.assert_array_equal(normed, im.astype(np.float32) / np.float32(255.0))


def test_native_png16_decoder_matches_python(tmp_path):
    """The C++ defilter core must decode identically to the Python path,
    including Paeth-filtered rows (what real KITTI files use)."""
    import struct
    import zlib
    import irr_tpu.native as native
    from irr_tpu.utils.flow_io import _png_chunk

    if native.get_lib() is None:
        pytest.skip("no C++ toolchain")

    rng = np.random.RandomState(1)
    h, w = 33, 47
    img = rng.randint(0, 65536, (h, w, 3)).astype(">u2")
    rows = img.reshape(h, -1).view(np.uint8).reshape(h, w * 6)
    bpp = 6
    enc = bytearray()
    prev = np.zeros(w * 6, np.int32)
    for y in range(h):
        cur = rows[y].astype(np.int32)
        a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        c = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        p = a + prev - c
        pa, pb, pc = abs(p - a), abs(p - prev), abs(p - c)
        pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c))
        enc.append(4)
        enc.extend(((cur - pred) & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(enc), 6))
            + _png_chunk(b"IEND", b""))
    path = str(tmp_path / "paeth.png")
    with open(path, "wb") as f:
        f.write(data)

    got_native = common.read_png16_rgb(path)
    saved = native._lib
    try:
        native._lib = False
        got_python = common.read_png16_rgb(path)
    finally:
        native._lib = saved
    np.testing.assert_array_equal(got_native, img.astype(np.uint16))
    np.testing.assert_array_equal(got_native, got_python)


def test_loader_num_workers_parity(tmp_path):
    """Parallel example decode must yield byte-identical batches, in the
    same order, as the single-worker path (per-example augmentation
    seeding makes the draws independent of thread scheduling)."""
    root = str(tmp_path)
    _make_chairs_occ(root, n=10)

    def batches(workers):
        ds = FlyingChairsOcc(root=root, dstype="full",
                             photometric_augmentations=True,
                             rng=np.random.RandomState(5))
        loader = DataLoader(ds, batch_size=3, shuffle=True, seed=11,
                            num_workers=workers)
        return [list(iter(loader)) for _ in range(2)]  # two epochs

    a, b = batches(1), batches(4)
    for ep_a, ep_b in zip(a, b):
        assert len(ep_a) == len(ep_b)
        for ba, bb in zip(ep_a, ep_b):
            assert set(ba) == set(bb)
            for k in ba:
                if isinstance(ba[k], np.ndarray):
                    np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)
                else:
                    assert ba[k] == bb[k], k
    # epochs must differ (set_epoch drives fresh augmentation draws)
    assert not np.array_equal(a[0][0]["input1"], a[1][0]["input1"])


def test_png8_native_decode_matches_pil(tmp_path):
    """read_png8 (zlib + native defilter) is bit-equal to PIL for 8-bit
    gray/RGB/RGBA PNGs and declines anything else (palette here)."""
    rng = np.random.RandomState(3)
    smooth = np.kron(rng.rand(5, 7, 4), np.ones((8, 8, 1)))  # filter variety
    rgba = (np.clip(smooth + rng.rand(40, 56, 4) * 0.1, 0, 1) * 255).astype(np.uint8)
    cases = {
        "rgb.png": Image.fromarray(rgba[..., :3], "RGB"),
        "gray.png": Image.fromarray(rgba[..., 0], "L"),
        "rgba.png": Image.fromarray(rgba, "RGBA"),
    }
    for name, im in cases.items():
        p = str(tmp_path / name)
        im.save(p)
        out = common.read_png8(p)
        assert out is not None and np.array_equal(out, np.asarray(Image.open(p))), name
    p = str(tmp_path / "pal.png")
    Image.fromarray(rgba[..., 0]).convert("P").save(p)
    assert common.read_png8(p) is None  # caller falls back to PIL
    assert common.read_image_as_byte(p).shape == (40, 56)


def test_decode_cache_roundtrip_and_invalidation(tmp_path):
    from irr_tpu.data.cache import set_decode_cache, decode_cache_root
    img = (np.random.RandomState(0).rand(16, 24, 3) * 255).astype(np.uint8)
    src = str(tmp_path / "x.png")
    Image.fromarray(img).save(src)
    assert decode_cache_root() is None  # default off
    cache = str(tmp_path / "cache")
    set_decode_cache(cache)
    try:
        a = common.read_image_as_byte(src)
        assert np.array_equal(a, img)
        entries = [f for _, _, fs in os.walk(cache) for f in fs]
        assert len(entries) == 1
        b = common.read_image_as_byte(src)  # cache hit
        assert np.array_equal(b, img)
        # content change -> new key, correct result (no stale read)
        img2 = img[::-1].copy()
        Image.fromarray(img2).save(src)
        now = os.stat(src)
        os.utime(src, ns=(now.st_atime_ns, now.st_mtime_ns + 10**9))
        c = common.read_image_as_byte(src)
        assert np.array_equal(c, img2)
    finally:
        set_decode_cache(None)


def _make_kitti2015(root, sizes):
    """Fake KITTI-2015 tree (data_scene_flow layout) with given native
    (h, w) per sample."""
    from irr_tpu.utils.flow_io import write_flow_png
    img_dir = os.path.join(root, "data_scene_flow", "training", "image_2")
    flo_dir = os.path.join(root, "data_scene_flow", "training", "flow_occ")
    os.makedirs(img_dir); os.makedirs(flo_dir)
    rng = np.random.RandomState(0)
    for i, (h, w) in enumerate(sizes):
        for t in (10, 11):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(img_dir, "%06d_%d.png" % (i, t)))
        flow = np.round(rng.randn(h, w, 2) * 64) / 64
        valid = (rng.rand(h, w, 1) > 0.2).astype(np.float32)
        write_flow_png(os.path.join(flo_dir, "%06d_10.png" % i),
                       flow.astype(np.float32), valid)


def test_kitti_eval_pad_to_bucket(tmp_path):
    """Variable-shape KITTI eval (VERDICT r2 #9): native sizes pad to ONE
    (384, 1280)-style bucket (here multiple=64 on small fakes), the valid
    mask zero-extends, batches of different native sizes stack, and the
    masked eval metrics are bit-identical to native-resolution eval."""
    import jax.numpy as jnp
    from irr_tpu.data.datasets import KittiComb2015Val, KittiComb2015Train
    from irr_tpu import losses
    root = str(tmp_path)
    # KITTI_2015_VALIDATE_INDICES starts [10, 11, ...]; samples 10/11 are
    # the two native sizes of interest, 0-9 are train-side filler
    _make_kitti2015(root, [(66, 140)] * 10 + [(70, 150), (66, 140)])

    ds = KittiComb2015Val(root=root)   # no crop, pad_multiple=64 default
    assert len(ds) == 2
    exs = [ds[i] for i in range(2)]
    for ex in exs:
        assert ex["input1"].shape[:2] == (128, 192)
        assert ex["target1"].shape[:2] == (128, 192)
        assert ex["input_valid"].shape[:2] == (128, 192)
    # pre-pad native size rides along for artifact crop-back
    assert exs[0]["input_size"] == (70, 150)
    assert exs[1]["input_size"] == (66, 140)
    # padding region is invalid
    assert exs[0]["input_valid"][70:].sum() == 0
    assert exs[0]["input_valid"][:, 150:].sum() == 0
    # one stacked batch from two native sizes
    batch = {k: np.stack([e[k] for e in exs])
             for k in ("input1", "target1", "input_valid")}
    assert batch["input1"].shape == (2, 128, 192, 3)

    # native shapes still available
    ds_native = KittiComb2015Val(root=root, pad_multiple=0)
    assert ds_native[0]["input1"].shape[:2] == (70, 150)
    assert ds_native[1]["input1"].shape[:2] == (66, 140)
    np.testing.assert_array_equal(ds_native[0]["input1"],
                                  exs[0]["input1"][:70, :150])

    # metric neutrality: eval loss on (padded pred, padded GT) == native
    loss = losses.MultiScaleEPE_PWC_Bi_Occ_upsample_KITTI(batch_size=1,
                                                          div_flow=0.05)
    rng = np.random.RandomState(3)
    for i, (h, w) in enumerate([(70, 150), (66, 140)]):
        pred_nat = rng.randn(1, h, w, 2).astype(np.float32)
        pred_pad = np.pad(pred_nat, ((0, 0), (0, 128 - h), (0, 192 - w), (0, 0)),
                          constant_values=7.7)  # garbage in padding
        nat = {k: jnp.asarray(ds_native[i][k][None]) for k in
               ("target1", "input_valid")}
        pad = {k: jnp.asarray(exs[i][k][None]) for k in
               ("target1", "input_valid")}
        ld_nat = loss({"flow": jnp.asarray(pred_nat)}, nat, training=False)
        ld_pad = loss({"flow": jnp.asarray(pred_pad)}, pad, training=False)
        assert np.allclose(float(ld_nat["epe"]), float(ld_pad["epe"]), rtol=1e-6)
        assert np.allclose(float(ld_nat["outlier"]), float(ld_pad["outlier"]),
                           rtol=1e-6)

    # training path (crop) unaffected by the new parameter
    ds_tr = KittiComb2015Train(root=root)
    ex = ds_tr[0]
    assert ex["input1"].shape == ex["target1"].shape[:2] + (3,)


def test_kitti_eval_cli_writes_native_size_artifacts(tmp_path):
    """End-to-end: --evaluation over padded KITTI batches writes .flo/.png
    artifacts cropped back to each sample's NATIVE size (submission
    contract; the model sees the (128, 192) pad bucket)."""
    import main as main_module
    from irr_tpu.data.common import read_flo

    root = str(tmp_path / "kitti")
    os.makedirs(root)
    _make_kitti2015(root, [(66, 140)] * 10 + [(70, 150), (66, 140)])
    save = str(tmp_path / "evalrun")
    argv = [
        "--evaluation=True", "--batch_size_val=2",
        "--model=PWCNet_irr",
        "--validation_loss=MultiScaleEPE_PWC",
        "--validation_dataset=KittiComb2015Val",
        f"--validation_dataset_root={root}",
        "--validation_key=epe",
        "--num_workers=1", "--data_parallel_devices=1",
        f"--save={save}",
        "--save_result_flo=True", "--save_result_png=True",
    ]
    avg = main_module.main(argv)
    assert np.isfinite(avg["epe"])
    flo_dir = os.path.join(save, "flo")
    names = sorted(os.listdir(flo_dir))
    assert len(names) >= 2
    flo0 = read_flo(os.path.join(flo_dir, [n for n in names
                                           if n.endswith(".flo")][0]))
    assert flo0.shape == (70, 150, 2)  # native, not the (128, 192) bucket
