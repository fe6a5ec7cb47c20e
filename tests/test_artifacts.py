"""Committed-artifact integrity: the trained checkpoints shipped in
`experiments/` must stay loadable through the REAL restore path and
produce finite, sane outputs. Guards against format drift (checkpoint
key layout, params-only extraction) silently invalidating the repo's
training evidence.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FN1S_BI = os.path.join(
    REPO, "experiments", "flownet1s_irr_occ_bi_r5",
    "checkpoint_best_params.npz")
IRR_PWC_STAGE1 = os.path.join(
    REPO, "experiments", "irr_pwc_synth_stage1_r3", "checkpoint_best.ckpt")


@pytest.mark.skipif(not os.path.isfile(FN1S_BI),
                    reason="artifact not present in this checkout")
def test_flownet_occ_bi_params_artifact_loads_and_runs():
    from irr_tpu import models
    from irr_tpu.runtime.checkpoint import CheckpointSaver

    model = models.FlowNet1S_irr_occ_bi(num_iters=2)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    saver = CheckpointSaver()
    loaded = saver.restore(FN1S_BI, params)

    # every leaf must have been replaced by the artifact (params-only
    # extraction kept all non-opt keys)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    changed = sum(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(loaded)))
    assert changed == n_leaves, (changed, n_leaves)

    rng = np.random.RandomState(0)
    batch = {
        "input1": jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32)),
        "input2": jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32)),
    }
    out = jax.jit(lambda p, d: model.apply(p, d, training=False))(
        loaded, batch)
    flow = np.asarray(out["flow1"])  # FlowNet-family eval key contract
    assert flow.shape == (1, 64, 96, 2)
    assert np.isfinite(flow).all()
    assert np.isfinite(np.asarray(out["occ1"])).all()
    # trained weights produce a non-degenerate flow field
    assert np.abs(flow).max() > 1e-3


PWC_OCC_BI = os.path.join(
    REPO, "experiments", "pwcnet_occ_bi_r5", "checkpoint_best_params.npz")


@pytest.mark.skipif(not os.path.isfile(PWC_OCC_BI),
                    reason="artifact not present in this checkout")
def test_pwcnet_occ_bi_params_artifact_loads_and_runs():
    from irr_tpu import models
    from irr_tpu.runtime.checkpoint import CheckpointSaver

    model = models.PWCNet_occ_bi()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    loaded = CheckpointSaver().restore(PWC_OCC_BI, params)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    changed = sum(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(loaded)))
    assert changed == n_leaves, (changed, n_leaves)

    rng = np.random.RandomState(0)
    batch = {
        "input1": jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32)),
        "input2": jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32)),
    }
    out = jax.jit(lambda p, d: model.apply(p, d, training=False))(
        loaded, batch)
    flow = np.asarray(out["flow"])  # PWC-family eval key contract
    assert flow.shape == (1, 64, 96, 2)
    assert np.isfinite(flow).all()
    assert np.abs(flow).max() > 1e-3


IRR_FLOWNET = os.path.join(
    REPO, "experiments", "irr_flownet_r5", "checkpoint_best_params.npz")


@pytest.mark.skipif(not os.path.isfile(IRR_FLOWNET),
                    reason="artifact not present in this checkout")
def test_irr_flownet_params_artifact_loads_and_runs():
    from irr_tpu import models
    from irr_tpu.runtime.checkpoint import CheckpointSaver

    model = models.IRR_FlowNet(num_iters=2)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    loaded = CheckpointSaver().restore(IRR_FLOWNET, params)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    changed = sum(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(loaded)))
    assert changed == n_leaves, (changed, n_leaves)

    rng = np.random.RandomState(0)
    batch = {
        "input1": jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32)),
        "input2": jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32)),
    }
    out = jax.jit(lambda p, d: model.apply(p, d, training=False))(
        loaded, batch)
    flow = np.asarray(out["flow"])
    assert flow.shape == (1, 64, 96, 2)
    assert np.isfinite(flow).all()
    assert np.abs(flow).max() > 1e-3


@pytest.mark.skipif(not os.path.isfile(IRR_PWC_STAGE1),
                    reason="artifact not present in this checkout")
def test_irr_pwc_stage1_artifact_keys_complete():
    """The flagship stage-1 checkpoint keeps full params + opt state
    (exact-resume contract)."""
    from irr_tpu import models

    with np.load(IRR_PWC_STAGE1) as z:
        keys = set(z.files)
    param_keys = {k for k in keys if not k.startswith("opt/")}
    opt_keys = keys - param_keys
    assert opt_keys, "stage-1 checkpoint lost its optimizer state"

    model = models.IRR_PWC()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    from irr_tpu.runtime.checkpoint import _replace_leaves  # noqa: F401
    paths = set()

    def collect(path, leaf):
        paths.add(path)
        return leaf

    _replace_leaves(params, collect)
    missing = paths - param_keys
    assert not missing, sorted(missing)[:8]
