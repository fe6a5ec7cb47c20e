"""Distributed tests on the virtual 8-device CPU mesh: sharded train step,
gradient all-reduce correctness (sharded == single-device), and the driver's
dryrun_multichip path."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from irr_tpu import models, losses, optim
from irr_tpu.parallel import make_mesh, make_train_step, make_eval_step, shard_batch, replicate
from irr_tpu.parallel.train import TrainState
from irr_tpu.ops.warp import set_warp_mask_mode

import pytest


@pytest.fixture(autouse=True)
def _analytic_mask():
    """Equality tests (sharded == unsharded) need the numerically stable
    analytic warp mask: the reference mask's >=1.0 threshold flips with
    ulp-level reorderings that GSPMD sharding legitimately introduces."""
    set_warp_mask_mode("analytic")
    yield
    set_warp_mask_mode("reference")


def _batch(b, h=64, w=96, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "input1": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "input2": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "target1": jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32)),
    }


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_step_matches_single_device():
    """The data-parallel train step must produce the same updated params as
    the unsharded one (global batch semantics, all-reduced grads)."""
    model = models.PWCNet()
    loss_fn = losses.MultiScaleEPE_PWC(batch_size=8, div_flow=0.05)
    optimizer = optim.Adam(lr=1e-4)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    batch = _batch(8)

    state0 = TrainState(params, optimizer.init(params))
    step_single = make_train_step(model, loss_fn, optimizer, mesh=None, donate=False)
    state1, ld1 = step_single(state0, batch)

    mesh = make_mesh(8)
    state0m = replicate(TrainState(params, optimizer.init(params)), mesh)
    step_mesh = make_train_step(model, loss_fn, optimizer, mesh=mesh, donate=False)
    state2, ld2 = step_mesh(state0m, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(ld1["total_loss"]), float(ld2["total_loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(state1.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_eval_step_sharded():
    model = models.PWCNet()
    loss_fn = losses.MultiScaleEPE_PWC(batch_size=8, div_flow=0.05)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    ev = make_eval_step(model, loss_fn, mesh=mesh)
    ld, out = ev(replicate(params, mesh), shard_batch(_batch(8), mesh))
    assert np.isfinite(float(ld["epe"]))
    assert out["flow"].shape == (8, 64, 96, 2)


def test_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_spatial_sharded_inference_matches_unsharded():
    """Width-sharded high-res inference (GSPMD halo exchange) must equal the
    single-device forward."""
    from irr_tpu.parallel.spatial import make_spatial_eval

    model = models.PWCNet_irr()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    inp = {"input1": jnp.asarray(rng.rand(1, 64, 256, 3).astype(np.float32)),
           "input2": jnp.asarray(rng.rand(1, 64, 256, 3).astype(np.float32))}
    ref = jax.jit(lambda p, i: model.apply(p, i, training=False))(params, inp)

    mesh = make_mesh(8)
    fn, shard_inputs, place_params = make_spatial_eval(model, mesh)
    out = fn(place_params(params), shard_inputs(inp))
    np.testing.assert_allclose(np.asarray(out["flow"]), np.asarray(ref["flow"]),
                               atol=5e-5)


def test_spatial_2d_mesh_matches_unsharded():
    """2-D (data, width) mesh: batch shards x width shards (the pod-scale
    eval layout) must equal the single-device forward."""
    from irr_tpu.parallel.spatial import make_mesh2d, make_spatial_eval

    model = models.PWCNet_irr()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    inp = {"input1": jnp.asarray(rng.rand(2, 64, 256, 3).astype(np.float32)),
           "input2": jnp.asarray(rng.rand(2, 64, 256, 3).astype(np.float32))}
    ref = jax.jit(lambda p, i: model.apply(p, i, training=False))(params, inp)

    mesh = make_mesh2d(2, 4)
    fn, shard_inputs, place_params = make_spatial_eval(model, mesh)
    out = fn(place_params(params), shard_inputs(inp))
    np.testing.assert_allclose(np.asarray(out["flow"]), np.asarray(ref["flow"]),
                               atol=5e-5)


def test_eval_step_pad_to_exact():
    """Tail-batch padding (make_eval_step pad_to): a B=3 batch padded
    in-graph to the canonical B=4 must produce the same metrics and the
    same sliced outputs as the plain B=3 executable. (The padding exists
    because the axon TPU backend miscompiles the odd-batch IRR_PWC eval
    executable into all-NaN occ — see make_eval_step's docstring; on CPU
    both paths are healthy so exactness is testable.)"""
    model = models.PWCNet()
    loss_fn = losses.MultiScaleEPE_PWC(batch_size=4, div_flow=0.05)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    batch = _batch(3)

    ld_plain, out_plain = make_eval_step(model, loss_fn)(params, batch)
    ld_pad, out_pad = make_eval_step(model, loss_fn, pad_to=4)(params, batch)

    assert out_pad["flow"].shape[0] == 3
    np.testing.assert_allclose(float(ld_plain["epe"]), float(ld_pad["epe"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_plain["flow"]),
                               np.asarray(out_pad["flow"]), atol=1e-4)


def test_eval_step_pad_to_full_batch_unchanged():
    """pad_to must be a no-op when the batch is already canonical."""
    model = models.PWCNet()
    loss_fn = losses.MultiScaleEPE_PWC(batch_size=4, div_flow=0.05)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    batch = _batch(4)
    ld_plain, _ = make_eval_step(model, loss_fn)(params, batch)
    ld_pad, out = make_eval_step(model, loss_fn, pad_to=4)(params, batch)
    assert out["flow"].shape[0] == 4
    np.testing.assert_allclose(float(ld_plain["epe"]), float(ld_pad["epe"]),
                               rtol=1e-6)


def test_train_step_skips_nonfinite_update():
    """In-graph non-finite containment (make_train_step): a batch whose
    loss is NaN must leave params and opt state EXACTLY unchanged and set
    skipped_nonfinite=1; a clean batch must update params and report 0."""
    model = models.PWCNet()
    optimizer = optim.Adam(lr=1e-4)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))

    class PoisonableLoss:
        poison = False

        def __call__(self, out, batch, training=False):
            loss_fn = losses.MultiScaleEPE_PWC(batch_size=2, div_flow=0.05)
            ld = loss_fn(out, batch, training=training)
            if self.poison:  # trace-time switch -> two executables
                ld["total_loss"] = ld["total_loss"] * jnp.float32("nan")
            return ld

    loss = PoisonableLoss()
    batch = _batch(2, h=32, w=48)
    state0 = TrainState(params, optimizer.init(params))

    loss.poison = True
    step_bad = make_train_step(model, loss, optimizer, donate=False)
    state1, ld1 = step_bad(state0, batch)
    assert float(ld1["skipped_nonfinite"]) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(state0.params),
                    jax.tree_util.tree_leaves(state1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state0.opt_state),
                    jax.tree_util.tree_leaves(state1.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    loss.poison = False
    step_ok = make_train_step(model, loss, optimizer, donate=False)
    state2, ld2 = step_ok(state0, batch)
    assert float(ld2["skipped_nonfinite"]) == 0.0
    assert np.isfinite(float(ld2["total_loss"]))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state0.params),
                        jax.tree_util.tree_leaves(state2.params)))
    assert changed


def test_full_epoch_pipeline_device_count_invariant(tmp_path):
    """Device-count invariance of the WHOLE pipeline, not just one step
    (VERDICT r4 next #5): the same tiny run through main() — resident
    gather, on-device photometric + affine aug RNG chain, jitted train
    steps, mid-epoch checkpoints, host-loader validation, best-ckpt
    selection — must produce the same per-epoch metric trajectory and the
    same final weights on 1 device and on the 8-device mesh. This pins
    the class of bugs a one-step equality can't see: per-device aug key
    splitting, loader/resident index order under sharding, metric
    all-reduce scaling, checkpoint timing."""
    import json

    from unittest import mock

    import main as main_module
    from tests.test_data import _make_chairs_occ
    from irr_tpu.runtime.checkpoint import CheckpointSaver

    root = str(tmp_path / "chairs")
    os.makedirs(root)
    _make_chairs_occ(root, n=16)

    def run(n_devices, save):
        traj = []
        orig = CheckpointSaver.save_latest

        def spy(self, *a, **kw):
            sd = kw.get("stats_dict") or {}
            traj.append({"phase": sd.get("phase"),
                         "epoch": sd.get("epoch"),
                         "epe": sd.get("epe"),
                         "total_loss": sd.get("total_loss")})
            return orig(self, *a, **kw)

        argv = [
            "--batch_size=8", "--batch_size_val=8",
            "--model=FlowNet1S",
            "--training_loss=MultiScaleEPE_FlowNet",
            "--validation_loss=MultiScaleEPE_FlowNet",
            "--optimizer=Adam", "--optimizer_lr=1e-4",
            "--total_epochs=2", "--seed=42",
            "--training_dataset=FlyingChairsOccFull",
            f"--training_dataset_root={root}",
            "--training_dataset_photometric_augmentations=True",
            "--training_augmentation=RandomAffineFlowOcc",
            "--validation_dataset=FlyingChairsOccFull",
            f"--validation_dataset_root={root}",
            "--validation_dataset_photometric_augmentations=False",
            "--validation_key=epe",
            "--num_workers=1",
            f"--data_parallel_devices={n_devices}",
            "--dataset_resident=True",
            "--save_every_batches=1",
            f"--save={save}",
        ]
        with mock.patch.object(CheckpointSaver, "save_latest", spy):
            best = main_module.main(argv)
        with np.load(os.path.join(save, "checkpoint_latest.ckpt"),
                     allow_pickle=False) as z:
            final = {k: z[k] for k in z.files}
        return best, traj, final

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")

    best1, traj1, final1 = run(1, str(tmp_path / "run1"))
    best8, traj8, final8 = run(8, str(tmp_path / "run8"))

    # identical checkpoint cadence: mid-epoch saves fired, phases line up
    assert [t["phase"] for t in traj1] == [t["phase"] for t in traj8]
    assert "mid_epoch" in [t["phase"] for t in traj1]
    assert [t["phase"] for t in traj1].count("validated") == 2

    # the per-epoch metric trajectory matches (ulp-level GSPMD reorderings
    # accumulate over 2 epochs x 2 steps -> tolerant, not bitwise)
    for t1, t8 in zip(traj1, traj8):
        assert t1["epoch"] == t8["epoch"]
        for k in ("epe", "total_loss"):
            if t1[k] is not None or t8[k] is not None:
                np.testing.assert_allclose(t1[k], t8[k], rtol=2e-4,
                                           err_msg=f"{k} @ {t1}")
    np.testing.assert_allclose(best1, best8, rtol=2e-4)

    # and so do the final weights
    assert set(final1) == set(final8)
    for k in final1:
        if final1[k].dtype.kind == "f":
            np.testing.assert_allclose(final1[k], final8[k], atol=2e-4,
                                       err_msg=k)
