"""HBM-resident dataset mode (--dataset_resident, irr_tpu/data/resident.py):
gather fidelity, on-device photometric equivalence, end-to-end main()."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

from irr_tpu.utils.flow_io import write_flo


def _make_chairs_occ(root, n=6, h=64, w=96):
    rng = np.random.RandomState(0)
    for i in range(n):
        for j in (1, 2):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(root, f"{i + 1:05d}_img{j}.png"))
            occ = (rng.rand(h, w) > 0.8).astype(np.uint8) * 255
            Image.fromarray(occ).save(os.path.join(root, f"{i + 1:05d}_occ{j}.png"))
        write_flo(os.path.join(root, f"{i + 1:05d}_flow.flo"),
                  rng.randn(h, w, 2).astype(np.float32) * 3)
        write_flo(os.path.join(root, f"{i + 1:05d}_flow_b.flo"),
                  rng.randn(h, w, 2).astype(np.float32) * 3)


@pytest.fixture(scope="module")
def occ_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("chairs_occ")
    _make_chairs_occ(str(root))
    return str(root)


def test_resident_gather_matches_dataset(occ_root):
    from irr_tpu.data.datasets import FlyingChairsOccFull
    from irr_tpu.data.resident import ResidentData, ResidentIndexLoader

    ds = FlyingChairsOccFull(root=occ_root, photometric_augmentations=False)
    rd = ResidentData(ds, chunk=4)  # n=6 > chunk -> exercises the tail path
    idx = np.array([5, 0, 3], np.int32)
    got = rd.gather(idx)
    for b, i in enumerate(idx):
        ex = ds[int(i)]
        np.testing.assert_array_equal(np.asarray(got["input1"][b]), ex["input1"])
        np.testing.assert_array_equal(np.asarray(got["target_occ2"][b]),
                                      ex["target_occ2"])
        # flows stored f16: exact to half precision
        np.testing.assert_allclose(np.asarray(got["target1"][b]), ex["target1"],
                                   atol=0.01)
    assert got["input1"].dtype == jnp.uint8
    assert got["target1"].dtype == jnp.float32

    loader = ResidentIndexLoader(len(ds), batch_size=4, shuffle=True, seed=7)
    assert len(loader) == 2
    seen = np.sort(np.concatenate([b["index"] for b in loader]))
    np.testing.assert_array_equal(seen, np.arange(6))
    # epochs reshuffle
    e1 = [b["index"] for b in loader]
    assert not all(np.array_equal(a, b)
                   for a, b in zip(e1, [b["index"] for b in loader]))


def test_photometric_ops_match_host_formulas():
    """Device jitter ops vs the host PIL-exact uint8 ops, same factors.

    The device path runs in float (no uint8 truncation between ops), so
    agreement is to ~1/255 per op."""
    from irr_tpu.augment import photometric as P
    from irr_tpu.data import transforms as T

    rng = np.random.RandomState(1)
    img = (rng.rand(31, 47, 3) * 255).astype(np.uint8)
    x = jnp.asarray(img, jnp.float32) / 255.0

    for f in (0.5, 0.93, 1.5):
        np.testing.assert_allclose(
            np.asarray(P._brightness(x, f)) * 255,
            T.adjust_brightness_u8(img, f).astype(np.float32), atol=1.01)
        np.testing.assert_allclose(
            np.asarray(P._saturation(x, f)) * 255,
            T.adjust_saturation_u8(img, f).astype(np.float32), atol=2.0)
        np.testing.assert_allclose(
            np.asarray(P._contrast(x, f)) * 255,
            T.adjust_contrast_u8(img, f).astype(np.float32), atol=2.0)
    # hue: float HSV roundtrip at f=0 is identity
    np.testing.assert_allclose(np.asarray(P._hue(x, 0.0)), np.asarray(x),
                               atol=1e-5)
    # ... and at f=0.25 stays a valid image that differs
    y = np.asarray(P._hue(x, 0.25))
    assert y.min() >= 0 and y.max() <= 1 and np.abs(y - np.asarray(x)).max() > 0.1


def test_photometric_pair_batch_contract():
    from irr_tpu.augment.photometric import photometric_pair_batch

    rng = np.random.RandomState(2)
    im1 = (rng.rand(3, 16, 24, 3) * 255).astype(np.uint8)
    im2 = (rng.rand(3, 16, 24, 3) * 255).astype(np.uint8)
    key = jax.random.PRNGKey(0)
    o1, o2 = photometric_pair_batch(jnp.asarray(im1), jnp.asarray(im2), key)
    assert o1.shape == im1.shape and o1.dtype == jnp.float32
    assert float(o1.min()) >= 0.0 and float(o1.max()) <= 1.0
    # deterministic in the key; different keys differ
    o1b, _ = photometric_pair_batch(jnp.asarray(im1), jnp.asarray(im2), key)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o1b))
    o1c, _ = photometric_pair_batch(jnp.asarray(im1), jnp.asarray(im2),
                                    jax.random.PRNGKey(5))
    assert np.abs(np.asarray(o1) - np.asarray(o1c)).max() > 1e-3
    # both frames share the draw: a constant pair stays pixelwise equal
    const = np.full((2, 8, 8, 3), 128, np.uint8)
    c1, c2 = photometric_pair_batch(jnp.asarray(const), jnp.asarray(const), key)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)


def test_main_resident_end_to_end(occ_root, tmp_path):
    """Full CLI run in resident mode: gather + device photometric + affine
    aug + train + validate, vs the same run through the host loader."""
    import main as main_module

    argv = [
        "--batch_size=2", "--batch_size_val=2",
        "--model=FlowNet1S",
        "--training_loss=MultiScaleEPE_FlowNet",
        "--validation_loss=MultiScaleEPE_FlowNet",
        "--optimizer=Adam", "--optimizer_lr=1e-4",
        "--total_epochs=1",
        "--training_dataset=FlyingChairsOccFull",
        f"--training_dataset_root={occ_root}",
        "--training_dataset_photometric_augmentations=True",
        "--training_augmentation=RandomAffineFlowOcc",
        "--validation_dataset=FlyingChairsOccFull",
        f"--validation_dataset_root={occ_root}",
        "--validation_dataset_photometric_augmentations=False",
        "--validation_key=epe",
        "--num_workers=1",
        "--data_parallel_devices=1",
        f"--save={tmp_path / 'run'}",
        "--dataset_resident=True",
    ]
    best = main_module.main(argv)
    assert np.isfinite(best)


def test_sharded_resident_gather_matches_dataset(occ_root):
    """Sample-sharded resident mode (multi-chip): the shard_map
    local-take + psum_scatter gather returns exactly the dataset rows,
    sharded over the mesh's data axis."""
    from irr_tpu.data.datasets import FlyingChairsOccFull
    from irr_tpu.data.resident import ResidentData
    from irr_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(8)
    ds = FlyingChairsOccFull(root=occ_root, photometric_augmentations=False)
    rd = ResidentData(ds, mesh=mesh)  # n=6 -> padded to 8, 1 sample/device
    assert rd.mesh is mesh

    idx = np.array([5, 0, 3, 3, 1, 4, 2, 0], np.int32)  # B=8, repeats ok
    got = rd.gather(idx)
    assert got["input1"].sharding.spec == jax.sharding.PartitionSpec("data")
    for b, i in enumerate(idx):
        ex = ds[int(i)]
        np.testing.assert_array_equal(np.asarray(got["input1"][b]), ex["input1"])
        np.testing.assert_allclose(np.asarray(got["target1"][b]),
                                   ex["target1"], atol=0.03)  # f16 storage
        np.testing.assert_array_equal(np.asarray(got["target_occ1"][b]),
                                      ex["target_occ1"])

    # a batch not divisible by the mesh errors loudly
    with pytest.raises(ValueError, match="divisible"):
        rd.gather(np.array([0, 1, 2], np.int32))


def test_main_resident_sharded_end_to_end(tmp_path):
    """Full CLI run with --dataset_resident on an 8-device mesh: the
    training set is sample-sharded, gathers ride psum_scatter, the train
    step consumes the already-sharded batch; validation takes the host
    loader path (tail batch not mesh-divisible)."""
    import main as main_module

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    # 10 samples: one full batch of 8 survives drop_last (mesh training
    # drops the non-divisible tail)
    occ_root = str(tmp_path / "chairs16")
    os.makedirs(occ_root)
    _make_chairs_occ(occ_root, n=16)
    argv = [
        "--batch_size=8", "--batch_size_val=8",
        "--model=FlowNet1S",
        "--training_loss=MultiScaleEPE_FlowNet",
        "--validation_loss=MultiScaleEPE_FlowNet",
        "--optimizer=Adam", "--optimizer_lr=1e-4",
        "--total_epochs=1",
        "--training_dataset=FlyingChairsOccFull",
        f"--training_dataset_root={occ_root}",
        "--training_dataset_photometric_augmentations=True",
        "--training_augmentation=RandomAffineFlowOcc",
        "--validation_dataset=FlyingChairsOccFull",
        f"--validation_dataset_root={occ_root}",
        "--validation_dataset_photometric_augmentations=False",
        "--validation_key=epe",
        "--num_workers=1",
        "--data_parallel_devices=8",
        f"--save={tmp_path / 'run_sharded'}",
        "--dataset_resident=True",
    ]
    best = main_module.main(argv)
    assert np.isfinite(best)
    with open(tmp_path / "run_sharded" / "logbook.txt") as f:
        logbook = f.read()
    assert "sample-sharded over 8 devices" in logbook
    assert "2/2" in logbook  # both full train batches ran


def test_photometric_distribution_matches_host_chain():
    """The on-device photometric chain must match the HOST PIL-exact chain
    in distribution (same factor laws, same random op order, shared pair
    draw): compare per-pixel output moments over many draws."""
    from irr_tpu.augment.photometric import photometric_pair_batch
    from irr_tpu.data.transforms import PhotometricPair

    rng = np.random.RandomState(3)
    im1 = (rng.rand(12, 18, 3) * 255).astype(np.uint8)
    im2 = (rng.rand(12, 18, 3) * 255).astype(np.uint8)
    n = 192

    # device: one batch of n identical pairs, independent per-sample draws
    d1, _ = photometric_pair_batch(
        jnp.asarray(np.broadcast_to(im1, (n,) + im1.shape)),
        jnp.asarray(np.broadcast_to(im2, (n,) + im2.shape)),
        jax.random.PRNGKey(0))
    dev = np.asarray(d1)

    host = np.stack([
        PhotometricPair(enabled=True, rng=np.random.RandomState(1000 + i))(
            im1, im2)[0] for i in range(n)])

    # moments of the induced per-image distribution; tolerances sized by
    # the sampling error of n=192 draws (std/sqrt(n) ~ 0.02)
    assert abs(dev.mean() - host.mean()) < 0.04, (dev.mean(), host.mean())
    assert abs(dev.std() - host.std()) < 0.04, (dev.std(), host.std())


def test_resident_index_loader_drop_last():
    """Mesh training uses drop_last index batches (the tail would not be
    mesh-divisible); the default keeps the tail."""
    from irr_tpu.data.resident import ResidentIndexLoader

    keep = ResidentIndexLoader(10, batch_size=4, shuffle=False)
    assert len(keep) == 3
    assert [len(b["index"]) for b in keep] == [4, 4, 2]
    drop = ResidentIndexLoader(10, batch_size=4, shuffle=False, drop_last=True)
    assert len(drop) == 2
    assert [len(b["index"]) for b in drop] == [4, 4]
    # every retained index stays in [0, n): HBM pad rows are never fetched
    assert all((b["index"] < 10).all() for b in drop)
