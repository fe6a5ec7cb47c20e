"""Model zoo tests: init/forward smoke for all 16 variants, output structure,
param count vs the paper's 6.36M for IRR-PWC, and stacking symmetry."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from irr_tpu import models
from irr_tpu.nn.core import param_count

H, W = 64, 96  # divisible by 64 (6 stride-2 levels)


def _inputs(seed=0, b=2, h=H, w=W):
    rng = np.random.RandomState(seed)
    return {
        "input1": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "input2": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
    }


ALL_MODELS = [
    "FlowNet1S", "FlowNet1S_irr", "FlowNet1S_irr_bi",
    "FlowNet1S_irr_occ", "FlowNet1S_irr_occ_bi", "IRR_FlowNet",
    "PWCNet", "PWCNet_bi", "PWCNet_occ", "PWCNet_occ_bi",
    "PWCNet_irr", "PWCNet_irr_bi", "PWCNet_irr_occ", "PWCNet_irr_occ_bi",
    "IRR_PWC",
]


def _make(name):
    cls = getattr(models, name)
    if "FlowNet1S_irr" in name or name == "IRR_FlowNet":
        return cls(num_iters=2)
    return cls()


def _init(model, key):
    return jax.jit(model.init)(key)


def _apply(model, params, inp, training):
    # jit once per (model, training) — single compile, persistently cached
    fn = jax.jit(lambda p, i: model.apply(p, i, training=training))
    return fn(params, inp)


def _finite(tree):
    for leaf in jax.tree_util.tree_leaves(tree):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.parametrize("name", ALL_MODELS)
def test_model_smoke(name):
    model = _make(name)
    params = _init(model, jax.random.PRNGKey(0))
    inp = _inputs()
    out_train = _apply(model, params, inp, True)
    out_eval = _apply(model, params, inp, False)
    _finite(out_train)
    _finite(out_eval)

    # eval contract: full-res flow (and occ where applicable)
    flow_key = "flow1" if name.startswith("FlowNet1S") else "flow"
    assert out_eval[flow_key].shape == (2, H, W, 2)
    if "occ" in name.lower() or name in ("IRR_PWC", "IRR_FlowNet"):
        occ_key = "occ1" if name.startswith("FlowNet1S") else "occ"
        assert out_eval[occ_key].shape == (2, H, W, 1)


def test_irr_pwc_train_structure():
    model = models.IRR_PWC()
    params = _init(model, jax.random.PRNGKey(0))
    out = _apply(model, params, _inputs(), True)
    assert len(out["flow"]) == 7 and len(out["occ"]) == 7
    for l in range(5):
        assert len(out["flow"][l]) == 4  # [cont_f, cont_b, ref_f, ref_b]
        assert out["flow"][l][0].shape[-1] == 2
        assert out["occ"][l][0].shape[-1] == 1
    for l in (5, 6):
        assert len(out["flow"][l]) == 2  # [flow_f, flow_b]
    # level spatial sizes follow the stride-2 conv chain (floor((n+1)/2) each)
    def chain(n, k):
        for _ in range(k):
            n = (n + 1) // 2
        return n
    assert out["flow"][0][0].shape[1:3] == (chain(H, 6), chain(W, 6))
    assert out["flow"][4][0].shape[1:3] == (chain(H, 2), chain(W, 2))
    assert out["flow"][6][0].shape[1:3] == (H, W)


def test_irr_pwc_param_count():
    model = models.IRR_PWC()
    params = _init(model, jax.random.PRNGKey(0))
    n = param_count(params)
    # paper: ~6.36M trainable parameters
    assert 6.0e6 < n < 6.7e6, n


def test_irr_pwc_direction_swap_symmetry():
    """Swapping the input pair must exactly swap fwd/bwd outputs — pins the
    stacked-bidirectional batching to the reference's two-pass math."""
    model = models.IRR_PWC()
    params = _init(model, jax.random.PRNGKey(1))
    inp = _inputs(seed=3)
    swapped = {"input1": inp["input2"], "input2": inp["input1"]}
    out_a = _apply(model, params, inp, True)
    out_b = _apply(model, params, swapped, True)
    for l in range(5):
        np.testing.assert_allclose(np.asarray(out_a["flow"][l][0]),
                                   np.asarray(out_b["flow"][l][1]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_a["flow"][l][2]),
                                   np.asarray(out_b["flow"][l][3]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_a["occ"][l][1]),
                                   np.asarray(out_b["occ"][l][0]), atol=2e-5)


def test_pwcnet_train_structure():
    model = models.PWCNet()
    params = _init(model, jax.random.PRNGKey(0))
    out = _apply(model, params, _inputs(), True)
    assert len(out["flow"]) == 5

    def chain(n, k):
        for _ in range(k):
            n = (n + 1) // 2
        return n
    assert out["flow"][0].shape == (2, chain(H, 6), chain(W, 6), 2)


def test_flownet1s_irr_iteration_accumulates():
    model = models.FlowNet1S_irr(num_iters=2)
    params = _init(model, jax.random.PRNGKey(0))
    out = _apply(model, params, _inputs(), True)
    assert len(out["flow2"]) == 2
    # iteration 1 output includes iteration 0 as residual base; they differ
    assert not np.allclose(np.asarray(out["flow2"][0]), np.asarray(out["flow2"][1]))


def test_uint8_batch_rejected_at_model_entry():
    """A loader wire batch (uint8) fed to model.apply without
    normalize_image_batch fails loudly instead of training on 0-255
    values (ADVICE r2; nn/core.py model_inputs)."""
    import pytest
    m = models.FlowNet1S()
    p = jax.jit(m.init)(jax.random.PRNGKey(0))
    b = {"input1": np.zeros((1, 64, 64, 3), np.uint8),
         "input2": np.zeros((1, 64, 64, 3), np.uint8)}
    with pytest.raises(TypeError, match="normalize_image_batch"):
        m.apply(p, b)
