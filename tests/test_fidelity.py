"""Cross-implementation fidelity gate.

Imports the ACTUAL reference torch models from /root/reference (CPU,
`.cuda()` monkey-patched to identity), random-inits them, converts the real
`state_dict()` through `irr_tpu.convert`, and asserts our eval outputs match
the reference eval outputs. This de-circularizes test_convert.py (which
synthesizes torch keys from the inverse of our own mapping) and is the
strongest fidelity gate available while the reference's LFS checkpoints are
missing.

The reference's PWC warp mask is chaotic: it thresholds a grid_sample of
ones at >= 1.0, and the f32 weight-sum rounds below 1.0 for a few percent
of interior pixels; which pixels flip depends on the LOW BITS of the flow
(tests here show a 1.7e-6 flow perturbation flips ~3% of those pixels).
Bit-parity through 5 cascaded levels is therefore impossible across
backends. The gate is split accordingly:
  1. test_pwc_reference_mask_matches_torch pins OUR mask bit-exactly
     against torch grid_sample given identical flows;
  2. test_eval_outputs_match_reference compares the full models with the
     chaotic mask replaced by the analytic interior mask ON BOTH SIDES
     (every weight, layer, and other op must then match to ~1e-4);
An unpatched whole-model comparison is NOT possible at random init: with
random weights the low-level flows are chaotic, a handful of coarse-level
mask flips (4x6 px) feed the warp of every downstream pixel, and ~100% of
output pixels end up perturbed. With trained checkpoints the same gate
would hold statistically; the two tests above pin all the arithmetic a
trained checkpoint would exercise.

Reference forward contracts exercised:
  - models/IRR_PWC.py:51-184 (flow + occ eval outputs)
  - models/pwcnet.py:44-98
  - models/flownet1s.py:58-119
"""

import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as tnf

import jax
import jax.numpy as jnp

from irr_tpu import models as our_models
from irr_tpu.convert import load_into_params
from irr_tpu.ops import warp as warp_mod

H, W, B = 128, 192, 2


@pytest.fixture(scope="module")
def ref_models():
    """Import /root/reference/models with .cuda() neutralized."""
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference")
    try:
        import models as ref
        yield ref
    finally:
        sys.path.remove("/root/reference")
        torch.Tensor.cuda = orig_cuda


class _Args:
    num_iters = 1


def _run_ref(ref_pkg, name, patch_mask):
    torch.manual_seed(7)
    m = getattr(ref_pkg, name)(_Args())
    m.eval()
    if patch_mask:
        _patch_ref_warping_layers(m)
    rng = np.random.RandomState(42)
    x1 = rng.rand(B, 3, H, W).astype(np.float32)
    x2 = rng.rand(B, 3, H, W).astype(np.float32)
    with torch.no_grad():
        out = m({"input1": torch.from_numpy(x1), "input2": torch.from_numpy(x2)})
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    ref_out = {k: np.transpose(v.numpy(), (0, 2, 3, 1)) for k, v in out.items()
               if isinstance(v, torch.Tensor)}
    return sd, np.transpose(x1, (0, 2, 3, 1)), np.transpose(x2, (0, 2, 3, 1)), ref_out


def _patch_ref_warping_layers(model):
    """Replace the reference WarpingLayer's warped-ones mask with the
    analytic interior test (same math everywhere else)."""
    from models.pwc_modules import get_grid, WarpingLayer

    def forward(self, x, flow, height_im, width_im, div_flow):
        flo_w = flow[:, 0] * 2 / max(width_im - 1, 1) / div_flow
        flo_h = flow[:, 1] * 2 / max(height_im - 1, 1) / div_flow
        flow_for_grid = torch.stack([flo_w, flo_h]).transpose(0, 1)
        grid = torch.add(get_grid(x), flow_for_grid).transpose(1, 2).transpose(2, 3)
        x_warp = tnf.grid_sample(x, grid, align_corners=True)
        h, w = x.shape[2], x.shape[3]
        ix = ((grid[..., 0] + 1) / 2) * (w - 1)
        iy = ((grid[..., 1] + 1) / 2) * (h - 1)
        mask = ((ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1))
        return x_warp * mask.unsqueeze(1).float()

    for mod in model.modules():
        if isinstance(mod, WarpingLayer):
            mod.forward = forward.__get__(mod, WarpingLayer)


def _run_ours(name, sd, x1, x2):
    model = getattr(our_models, name)()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    new_params, stats = load_into_params(sd, params)
    assert not stats["missing"], stats["missing"][:8]
    assert not stats["shape_mismatch"], stats["shape_mismatch"][:4]
    assert not stats["unused"], stats["unused"][:8]
    fwd = jax.jit(lambda p, d: model.apply(p, d, training=False))
    return fwd(new_params, {"input1": jnp.asarray(x1),
                            "input2": jnp.asarray(x2)})


def test_pwc_reference_mask_matches_torch(ref_models):
    """Our warp mask must reproduce torch's grid_sample(ones) >= 1.0
    BIT-EXACTLY given identical flows (incl. the sub-1.0-rounding quirk)."""
    import torch.nn.functional as tf
    from models.pwc_modules import get_grid

    mism = 0
    tot = 0
    quirk_pixels = 0
    for (h, w) in [(4, 6), (8, 12), (32, 48), (55, 128)]:
        for seed in range(3):
            rng = np.random.RandomState(seed)
            fl = (rng.randn(2, 2, h, w) * 0.05 * 0.3 * w).astype(np.float32)
            t = torch.from_numpy(fl)
            ones = torch.ones(2, 1, h, w)
            flo_w = t[:, 0] * 2 / max(W - 1, 1) / 0.05
            flo_h = t[:, 1] * 2 / max(H - 1, 1) / 0.05
            grid = torch.add(get_grid(ones),
                             torch.stack([flo_w, flo_h]).transpose(0, 1)
                             ).transpose(1, 2).transpose(2, 3)
            with torch.no_grad():
                mv = tf.grid_sample(ones, grid, align_corners=True).numpy()[:, 0]
            m_t = mv >= 1.0
            quirk_pixels += int(((mv < 1.0) & (mv > 0.99999)).sum())
            fl_nhwc = jnp.asarray(np.transpose(fl, (0, 2, 3, 1)))
            m_j = np.asarray(jax.jit(
                lambda f: warp_mod.pwc_reference_mask((h, w), f, H, W, 0.05,
                                                      jnp.float32))(fl_nhwc))[..., 0]
            mism += int((m_t != (m_j > 0.5)).sum())
            tot += m_t.size
    assert mism == 0, f"{mism}/{tot} mask pixels disagree with torch"
    # the quirk must actually be exercised, else this test proves nothing
    assert quirk_pixels > 0


@pytest.mark.parametrize("name,keys", [
    ("FlowNet1S", ("flow1",)),
    ("PWCNet", ("flow",)),
    ("IRR_PWC", ("flow", "occ")),
])
def test_eval_outputs_match_reference(ref_models, name, keys):
    """Whole-model parity with the chaotic mask swapped for the analytic
    interior mask on both sides. Eval flow is divided by div_flow=0.05
    (x20 noise amplification; per-scale agreement is ~4e-6), so flow keys
    get atol=5e-4; occ logits are un-amplified: atol=1e-4."""
    warp_mod.set_warp_mask_mode("analytic")
    try:
        _run_eval_parity(ref_models, name, keys)
    finally:
        warp_mod.set_warp_mask_mode("reference")


def _run_eval_parity(ref_models, name, keys):
    sd, x1, x2, ref_out = _run_ref(ref_models, name, patch_mask=True)
    ours = _run_ours(name, sd, x1, x2)
    for key in keys:
        got = np.asarray(ours[key], np.float32)
        want = ref_out[key]
        assert got.shape == want.shape, (key, got.shape, want.shape)
        atol = 1e-4 if key == "occ" else 5e-4
        np.testing.assert_allclose(got, want, atol=atol,
                                   err_msg=f"{name}.{key}")


