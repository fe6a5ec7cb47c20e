"""Matmul reformulations of the dense 3x3 tower convs (set_conv_impl).

im2col / shiftsum compute the identical multiply-add set as
lax.conv_general_dilated; these pin per-conv exactness (incl. dilated
context-net convs), gradient parity, eligibility fencing (strided convs,
heads, transposed convs keep the lax path), and whole-model IRR_PWC
forward parity in f32 for both impls.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from irr_tpu.nn import core
from irr_tpu.nn.core import Conv, set_conv_impl


@pytest.fixture(autouse=True)
def _restore_policy():
    yield
    set_conv_impl("conv")
    core.set_compute_dtype(jnp.float32)


def _conv_out(conv, params, x):
    return np.asarray(conv(params, x))


@pytest.mark.parametrize("impl", ["im2col", "shiftsum"])
@pytest.mark.parametrize("dilation", [1, 2, 8])
def test_matmul_conv_matches_lax_conv(impl, dilation):
    conv = Conv(19, 24, kernel_size=3, stride=1, dilation=dilation)
    params = conv.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 14, 17, 19).astype(np.float32))

    set_conv_impl("conv")
    ref = _conv_out(conv, params, x)
    set_conv_impl(impl)
    got = _conv_out(conv, params, x)
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


@pytest.mark.parametrize("impl", ["im2col", "shiftsum"])
def test_matmul_conv_grad_matches(impl):
    conv = Conv(11, 16, kernel_size=3, stride=1)
    params = conv.init(jax.random.PRNGKey(3))
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 9, 10, 11).astype(np.float32))

    def loss(p, x):
        return jnp.sum(conv(p, x) ** 2)

    set_conv_impl("conv")
    g_ref = jax.grad(loss, argnums=(0, 1))(params, x)
    set_conv_impl(impl)
    g_got = jax.grad(loss, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_got),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=2e-4)


def test_ineligible_convs_keep_lax_path():
    """Strided pyramid convs and small f32 heads are NOT rewritten: their
    outputs are bit-identical across policies (the branch never fires)."""
    rng = np.random.RandomState(4)
    for conv, cin in [
        (Conv(8, 16, kernel_size=3, stride=2), 8),       # strided
        (Conv(32, 2, kernel_size=3, stride=1), 32),      # f32 head, cout<16
        (Conv(16, 16, kernel_size=1, stride=1), 16),     # 1x1
    ]:
        params = conv.init(jax.random.PRNGKey(5))
        x = jnp.asarray(rng.randn(1, 12, 12, cin).astype(np.float32))
        set_conv_impl("conv")
        ref = _conv_out(conv, params, x)
        set_conv_impl("im2col")
        got = _conv_out(conv, params, x)
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("impl", ["im2col", "shiftsum"])
def test_irr_pwc_forward_parity_f32(impl):
    """Whole-model IRR_PWC forward under the reformulated towers: f32
    outputs match the lax-conv model to iterative-ulp tolerance (same
    class of reassociation amplification as test_grouped_stage.py)."""
    from irr_tpu import models

    model = models.IRR_PWC()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "input1": jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32)),
        "input2": jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32)),
    }

    set_conv_impl("conv")
    ref = model.apply(params, batch, training=False)
    set_conv_impl(impl)
    got = model.apply(params, batch, training=False)
    # Per-conv parity is 2e-5 (tests above); through 7 warp-and-refine
    # levels reassociation noise amplifies chaotically AND the eval head
    # un-scales by 1/div_flow (x20), so whole-model closeness is judged
    # as endpoint error in px (criterion style of test_grouped_stage.py:63;
    # the 0.01 px mean bound is ~0.7% of the trained model's 1.5 px EPE).
    d = np.linalg.norm(np.asarray(got["flow"], np.float64)
                       - np.asarray(ref["flow"], np.float64), axis=-1)
    assert d.max() < 0.05 and d.mean() < 0.01, (d.max(), d.mean())
    # Occ: the eval metric consumes the ROUNDED sigmoid (losses f1_score),
    # so judge mean probability closeness + rounding-disagreement rate
    # (isolated borderline logits can swing sigmoid by ~0.07 from the same
    # reassociation noise without moving the mask).
    po = 1.0 / (1.0 + np.exp(-np.asarray(got["occ"], np.float64)))
    pr = 1.0 / (1.0 + np.exp(-np.asarray(ref["occ"], np.float64)))
    disagree = np.mean(np.round(po) != np.round(pr))
    assert np.abs(po - pr).mean() < 0.005 and disagree < 0.01, (
        np.abs(po - pr).mean(), disagree)


def test_conv_impl_flag_rejects_unknown():
    with pytest.raises(ValueError):
        set_conv_impl("winograd")


def test_cli_conv_impl_train_and_eval(tmp_path):
    """--conv_impl=im2col drives a real (tiny) CLI train+validate epoch:
    the reformulated towers' forward AND grad path stay finite end-to-end
    (flag plumbing config.py configure_model_and_loss)."""
    import os
    from PIL import Image
    from irr_tpu.utils.flow_io import write_flo
    import main as main_module

    root = tmp_path / "chairs"
    root.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        for j in (1, 2):
            img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(str(root / f"{i:05d}_img{j}.ppm"))
        write_flo(str(root / f"{i:05d}_flow.flo"),
                  rng.randn(64, 96, 2).astype(np.float32))

    argv = [
        "--batch_size=2", "--batch_size_val=2",
        "--model=FlowNet1S",
        "--training_loss=MultiScaleEPE_FlowNet",
        "--validation_loss=MultiScaleEPE_FlowNet",
        "--optimizer=Adam", "--optimizer_lr=1e-4",
        "--total_epochs=1",
        f"--training_dataset=FlyingChairsFull",
        f"--training_dataset_root={root}",
        f"--validation_dataset=FlyingChairsFull",
        f"--validation_dataset_root={root}",
        "--validation_key=epe",
        "--num_workers=1", "--data_parallel_devices=1",
        f"--save={tmp_path / 'run_im2col'}",
        "--conv_impl=im2col",
    ]
    best = main_module.main(argv)
    assert np.isfinite(best)
