"""Core op unit tests: parity with torch reference semantics.

Golden values are produced with torch.nn.functional (grid_sample,
interpolate, adaptive_avg_pool2d, unfold) — the exact primitives the
reference builds on — so these tests pin our NHWC/XLA implementations to the
reference math without depending on the reference repo.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as tf

from irr_tpu import ops


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# cost volume
# ---------------------------------------------------------------------------

def _cost_volume_torch(f1, f2, max_disp):
    """Golden: the 81-shift channel-mean correlation (pwc_modules.py:42-62 math)."""
    t1, t2 = _nchw(f1), _nchw(f2)
    h, w = t1.shape[2], t1.shape[3]
    t2p = tf.pad(t2, (max_disp, max_disp, max_disp, max_disp))
    outs = []
    for i in range(2 * max_disp + 1):
        for j in range(2 * max_disp + 1):
            outs.append(torch.mean(t1 * t2p[:, :, i:i + h, j:j + w], dim=1, keepdim=True))
    return _to_nhwc(torch.cat(outs, dim=1))


@pytest.mark.parametrize("shape,md", [((2, 12, 20, 16), 4), ((1, 7, 9, 5), 2)])
def test_cost_volume_xla_matches_torch(shape, md):
    f1, f2 = _rand(*shape, seed=1), _rand(*shape, seed=2)
    got = np.asarray(ops.cost_volume_xla(jnp.asarray(f1), jnp.asarray(f2), md))
    want = _cost_volume_torch(f1, f2, md)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("shape,md", [((2, 16, 24, 16), 4), ((1, 8, 16, 32), 3)])
def test_cost_volume_pallas_matches_xla(shape, md):
    f1, f2 = _rand(*shape, seed=3), _rand(*shape, seed=4)
    a = np.asarray(ops.cost_volume_xla(jnp.asarray(f1), jnp.asarray(f2), md))
    b = np.asarray(ops.cost_volume_pallas(jnp.asarray(f1), jnp.asarray(f2), md))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_cost_volume_pallas_grad_matches_xla():
    f1, f2 = _rand(1, 8, 8, 8, seed=5), _rand(1, 8, 8, 8, seed=6)
    f1j, f2j = jnp.asarray(f1), jnp.asarray(f2)

    def loss_x(a, b):
        return jnp.sum(jnp.sin(ops.cost_volume_xla(a, b, 2)))

    def loss_p(a, b):
        return jnp.sum(jnp.sin(ops.cost_volume_pallas(a, b, 2)))

    gx = jax.grad(loss_x, argnums=(0, 1))(f1j, f2j)
    gp = jax.grad(loss_p, argnums=(0, 1))(f1j, f2j)
    np.testing.assert_allclose(np.asarray(gx[0]), np.asarray(gp[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx[1]), np.asarray(gp[1]), atol=1e-5)


def test_cost_volume_pallas_fused_relu_and_grad():
    """The relu=True epilogue (fwd) and its sign-recovery VJP (bwd): the
    fused output's sign recovers the LeakyReLU slope, so the backward must
    match autodiff of leaky_relu(cost_volume_xla(...))."""
    f1, f2 = _rand(1, 8, 8, 8, seed=7), _rand(1, 8, 8, 8, seed=8)
    f1j, f2j = jnp.asarray(f1), jnp.asarray(f2)

    a = ops.cost_volume_xla(f1j, f2j, 2)
    want = np.asarray(jnp.where(a >= 0, a, a * 0.1))
    got = np.asarray(ops.cost_volume_pallas(f1j, f2j, 2, relu=True))
    np.testing.assert_allclose(got, want, atol=1e-5)

    def loss_x(x, y):
        o = ops.cost_volume_xla(x, y, 2)
        return jnp.sum(jnp.sin(jnp.where(o >= 0, o, o * 0.1)))

    def loss_p(x, y):
        return jnp.sum(jnp.sin(ops.cost_volume_pallas(x, y, 2, relu=True)))

    gx = jax.grad(loss_x, argnums=(0, 1))(f1j, f2j)
    gp = jax.grad(loss_p, argnums=(0, 1))(f1j, f2j)
    np.testing.assert_allclose(np.asarray(gx[0]), np.asarray(gp[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx[1]), np.asarray(gp[1]), atol=1e-5)


# ---------------------------------------------------------------------------
# resizes
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("hw_in,hw_out", [((7, 9), (14, 18)), ((14, 18), (7, 9)),
                                          ((6, 8), (13, 17)), ((5, 5), (5, 5))])
def test_upsample2d_bilinear_aligned(hw_in, hw_out):
    x = _rand(2, *hw_in, 3, seed=7)
    want = _to_nhwc(tf.interpolate(_nchw(x), hw_out, mode="bilinear", align_corners=True))
    got = np.asarray(ops.upsample2d(jnp.asarray(x), hw_out))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("hw_in,hw_out", [((14, 18), (7, 9)), ((13, 17), (5, 8)),
                                          ((8, 8), (8, 8))])
def test_adaptive_avg_pool(hw_in, hw_out):
    x = _rand(2, *hw_in, 3, seed=8)
    want = _to_nhwc(tf.adaptive_avg_pool2d(_nchw(x), hw_out))
    got = np.asarray(ops.adaptive_avg_pool(jnp.asarray(x), hw_out))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_upsample_factor2_exact_double():
    x = _rand(1, 6, 8, 1, seed=9)
    want = _to_nhwc(tf.interpolate(_nchw(x), scale_factor=2, mode="nearest"))
    got = np.asarray(ops.upsample_factor2(jnp.asarray(x), jnp.zeros((1, 12, 16, 1))))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_upsample_factor2_mismatch():
    # nearest x2 then bilinear align_corners=False to an odd target
    x = _rand(1, 6, 8, 1, seed=10)
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    up = tf.interpolate(t, scale_factor=2, mode="nearest")
    want = _to_nhwc(tf.interpolate(up, (13, 15), mode="bilinear", align_corners=False))
    got = np.asarray(ops.upsample_factor2(jnp.asarray(x), jnp.zeros((1, 13, 15, 1))))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rescale_flow_roundtrip():
    flow = jnp.asarray(_rand(2, 7, 9, 2, seed=11))
    local = ops.rescale_flow(flow, 0.05, 576, 448, to_local=True)
    back = ops.rescale_flow(local, 0.05, 576, 448, to_local=False)
    np.testing.assert_allclose(np.asarray(back), np.asarray(flow), atol=1e-5)
    # scale check: u_local = u * (w_level / W_im / div_flow)
    np.testing.assert_allclose(
        np.asarray(local[..., 0]), np.asarray(flow[..., 0]) * (9 / 576 / 0.05), atol=1e-5)


# ---------------------------------------------------------------------------
# warping (grid_sample parity)
# ---------------------------------------------------------------------------

def test_grid_sample_aligned_matches_torch():
    x = _rand(2, 9, 11, 4, seed=12)
    rng = np.random.RandomState(13)
    # queries that include out-of-bounds and boundary values
    ix = rng.uniform(-3, 13, size=(2, 9, 11)).astype(np.float32)
    iy = rng.uniform(-3, 11, size=(2, 9, 11)).astype(np.float32)

    # torch grid in [-1, 1], align_corners=True
    gx = 2 * ix / (11 - 1) - 1
    gy = 2 * iy / (9 - 1) - 1
    grid = torch.from_numpy(np.stack([gx, gy], axis=-1))
    want = _to_nhwc(tf.grid_sample(_nchw(x), grid, align_corners=True))

    got = np.asarray(ops.grid_sample_aligned(jnp.asarray(x), jnp.asarray(ix), jnp.asarray(iy)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_grid_sample_aligned_grad_matches_torch():
    """Custom VJP parity: d_x (quad-packed scatter), d_ix/d_iy (saved-tap
    weight grads) vs torch.grid_sample autograd. Coords avoid exact
    integers (floor() kink: subgradient choice differs legitimately)."""
    h, w = 9, 11
    x = _rand(2, h, w, 4, seed=21)
    rng = np.random.RandomState(22)
    ix = rng.uniform(-3, 13, size=(2, h, w)).astype(np.float32)
    iy = rng.uniform(-3, 11, size=(2, h, w)).astype(np.float32)
    # keep every query off integer grid lines by at least 1e-3
    ix = np.where(np.abs(ix - np.round(ix)) < 1e-3, ix + 0.01, ix)
    iy = np.where(np.abs(iy - np.round(iy)) < 1e-3, iy + 0.01, iy)
    wloss = rng.randn(2, h, w, 4).astype(np.float32)

    def jloss(xx, jx, jy):
        return jnp.sum(ops.grid_sample_aligned(xx, jx, jy) * wloss)

    gx_j, gix_j, giy_j = jax.grad(jloss, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(ix), jnp.asarray(iy))

    t = _nchw(x).requires_grad_(True)
    gxn = torch.from_numpy(2 * ix / (w - 1) - 1).requires_grad_(True)
    gyn = torch.from_numpy(2 * iy / (h - 1) - 1).requires_grad_(True)
    grid = torch.stack([gxn, gyn], dim=-1)
    out = tf.grid_sample(t, grid, align_corners=True)
    (out * _nchw(wloss)).sum().backward()

    np.testing.assert_allclose(np.asarray(gx_j), _to_nhwc(t.grad), atol=1e-4)
    # chain rule: ix = ((gxn+1)/2)*(w-1)  =>  d/d ix = d/d gxn * 2/(w-1)
    np.testing.assert_allclose(np.asarray(gix_j),
                               gxn.grad.numpy() * 2.0 / (w - 1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(giy_j),
                               gyn.grad.numpy() * 2.0 / (h - 1), atol=1e-4)


def test_warp_masked_matches_torch_reference_composition():
    """Full PWC WarpingLayer parity: grid_sample + warped-ones mask>=1."""
    div_flow = 0.05
    h_im, w_im = 36, 44
    x = _rand(2, 9, 11, 4, seed=14)
    flow = (_rand(2, 9, 11, 2, seed=15) * 0.3).astype(np.float32)

    # torch composition mirroring pwc_modules.py:119-133
    t = _nchw(x)
    f = _nchw(flow)
    flo_w = f[:, 0] * 2 / max(w_im - 1, 1) / div_flow
    flo_h = f[:, 1] * 2 / max(h_im - 1, 1) / div_flow
    gh = torch.linspace(-1, 1, 11).view(1, 1, 1, 11).expand(2, 1, 9, 11)
    gv = torch.linspace(-1, 1, 9).view(1, 1, 9, 1).expand(2, 1, 9, 11)
    grid = torch.cat([gh, gv], 1) + torch.stack([flo_w, flo_h]).transpose(0, 1)
    grid = grid.permute(0, 2, 3, 1)
    xw = tf.grid_sample(t, grid, align_corners=True)
    ones = torch.ones_like(t)
    mask = (tf.grid_sample(ones, grid, align_corners=True) >= 1.0).float()
    want = _to_nhwc(xw * mask)

    got = np.asarray(ops.warp_masked(jnp.asarray(x), jnp.asarray(flow), h_im, w_im, div_flow))
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------------------
# interp2
# ---------------------------------------------------------------------------

def _interp2_torch(v, xq, yq):
    """Golden for Interp2 zero-outside semantics (utils/interpolation.py:60-141)."""
    t = _nchw(v)
    b, c, h, w = t.shape
    xq_t, yq_t = torch.from_numpy(xq), torch.from_numpy(yq)
    x0 = torch.floor(xq_t).long().clamp(0, w - 1)
    y0 = torch.floor(yq_t).long().clamp(0, h - 1)
    x1 = (x0 + 1).clamp(0, w - 1)
    y1 = (y0 + 1).clamp(0, h - 1)
    fx = (xq_t - x0.float()).unsqueeze(1)
    fy = (yq_t - y0.float()).unsqueeze(1)

    def gather(yi, xi):
        idx = (yi * w + xi).view(b, 1, -1).expand(b, c, h * w)
        return torch.gather(t.reshape(b, c, h * w), 2, idx).view(b, c, h, w)

    vals = (gather(y0, x0) * (1 - fy) * (1 - fx) + gather(y0, x1) * (1 - fy) * fx
            + gather(y1, x0) * fy * (1 - fx) + gather(y1, x1) * fy * fx)
    invalid = ((xq_t < 0) | (xq_t >= w) | (yq_t < 0) | (yq_t >= h)).unsqueeze(1).float()
    return _to_nhwc(vals * (1 - invalid))


def test_interp2_matches_reference_semantics():
    v = _rand(2, 9, 11, 3, seed=16)
    rng = np.random.RandomState(17)
    xq = rng.uniform(-2, 13, size=(2, 9, 11)).astype(np.float32)
    yq = rng.uniform(-2, 11, size=(2, 9, 11)).astype(np.float32)
    want = _interp2_torch(v, xq, yq)
    got = np.asarray(ops.interp2(jnp.asarray(v), jnp.asarray(xq), jnp.asarray(yq)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_interp2_mask_binary_basic():
    """With an all-ones mask, values match interp2 and the mask stays 1."""
    v = _rand(1, 8, 8, 2, seed=18)
    rng = np.random.RandomState(19)
    xq = rng.uniform(0, 7, size=(1, 8, 8)).astype(np.float32)
    yq = rng.uniform(0, 7, size=(1, 8, 8)).astype(np.float32)
    mask = jnp.ones((1, 8, 8, 1))
    vals, m = ops.interp2_mask_binary(jnp.asarray(v), jnp.asarray(xq), jnp.asarray(yq), mask)
    plain = ops.interp2(jnp.asarray(v), jnp.asarray(xq), jnp.asarray(yq))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(plain), atol=1e-4)
    assert np.all(np.asarray(m) == 1.0)


def test_interp2_mask_binary_zero_mask_region():
    """Pixels sampling from fully-masked-out regions become invalid."""
    v = jnp.ones((1, 8, 8, 1))
    mask = np.ones((1, 8, 8, 1), np.float32)
    mask[:, :, 4:, :] = 0.0  # right half invalid
    xq = np.full((1, 8, 8), 6.0, np.float32)   # sample right half
    yq = np.tile(np.arange(8, dtype=np.float32)[None, :, None], (1, 1, 8))
    vals, m = ops.interp2_mask_binary(v, jnp.asarray(xq), jnp.asarray(yq), jnp.asarray(mask))
    assert np.all(np.asarray(m) == 0.0)
    assert np.all(np.asarray(vals) == 0.0)


# ---------------------------------------------------------------------------
# unfold / local filtering
# ---------------------------------------------------------------------------

def test_local_filter_3x3_matches_torch_unfold():
    x = _rand(2, 6, 7, 1, seed=20)
    k = np.abs(_rand(2, 6, 7, 9, seed=21))
    k = k / k.sum(-1, keepdims=True)

    t = _nchw(x)
    tp = tf.pad(t, (1, 1, 1, 1), mode="replicate")
    unf = tf.unfold(tp, kernel_size=3)  # (B, 9, H*W)
    kk = torch.from_numpy(np.transpose(k, (0, 3, 1, 2))).reshape(2, 9, -1)
    want = (unf * kk).sum(1).view(2, 1, 6, 7)
    want = _to_nhwc(want)

    got = np.asarray(ops.local_filter_3x3(jnp.asarray(x), jnp.asarray(k)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_warp_multi_approx_mode():
    """Quarter-density guidance warp: exact at even positions for any flow,
    near-exact everywhere for smooth warped signals (ops/warp.py)."""
    from irr_tpu.ops.warp import warp_multi, _upsample2x_even

    # _upsample2x_even reconstructs even rows/cols bit-exactly
    rng = np.random.RandomState(0)
    lo = jnp.asarray(rng.randn(2, 5, 7, 3).astype(np.float32))
    up = _upsample2x_even(lo, 9, 13)
    assert up.shape == (2, 9, 13, 3)
    np.testing.assert_array_equal(np.asarray(up[:, ::2, ::2]), np.asarray(lo))

    h, w = 33, 49
    # smooth image + constant flow: warped signal locally linear -> approx
    # matches exact closely everywhere
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    img = np.stack([0.01 * xx + 0.02 * yy, 0.03 * xx - 0.01 * yy], -1)[None]
    flow = np.full((1, h, w, 2), 0.05 * 3.0, np.float32)  # 3 px at div_flow
    ex = warp_multi([jnp.asarray(img)], jnp.asarray(flow), h, w, 0.05)[0]
    ap = warp_multi([jnp.asarray(img)], jnp.asarray(flow), h, w, 0.05,
                    approx=True)[0]
    # interior only: at the image border the out-of-range zero mask makes
    # the warped signal non-linear, which is exactly where approx differs
    np.testing.assert_allclose(np.asarray(ap[:, 5:-5, 5:-5]),
                               np.asarray(ex[:, 5:-5, 5:-5]), atol=1e-5)

    # random flow: even positions still EXACT (same coords, same taps,
    # same mask); odd positions differ but stay bounded
    flow_r = (rng.randn(1, h, w, 2) * 0.05 * 2).astype(np.float32)
    imgr = rng.randn(1, h, w, 4).astype(np.float32)
    ex = warp_multi([jnp.asarray(imgr)], jnp.asarray(flow_r), h, w, 0.05)[0]
    ap = warp_multi([jnp.asarray(imgr)], jnp.asarray(flow_r), h, w, 0.05,
                    approx=True)[0]
    np.testing.assert_allclose(np.asarray(ap[:, ::2, ::2]),
                               np.asarray(ex[:, ::2, ::2]), atol=1e-6)


def test_warp_multi_approx_stride4():
    """Generalized stride: approx=4 samples every 4th pixel, anchored
    positions bit-exact, stride-2 path unchanged by the generalization."""
    from irr_tpu.ops.warp import warp_multi, _upsample_even, _upsample2x_even

    rng = np.random.RandomState(3)
    # generic reconstruction: anchored positions bit-exact at stride 4,
    # in-between positions are the edge-clamped linear interpolation
    lo = jnp.asarray(rng.randn(2, 4, 6, 3).astype(np.float32))
    up = _upsample_even(lo, 14, 22, 4)
    assert up.shape == (2, 14, 22, 3)
    np.testing.assert_array_equal(np.asarray(up[:, ::4, ::4]), np.asarray(lo))
    lo_np = np.asarray(lo)
    # row 2 of the output = 0.5*row0 + 0.5*row1 of the anchors (k=2 of 4)
    np.testing.assert_allclose(np.asarray(up[:, 2, ::4]),
                               0.5 * lo_np[:, 0] + 0.5 * lo_np[:, 1],
                               atol=1e-6)
    # stride-2 shim is the generic path
    lo2 = jnp.asarray(rng.randn(1, 5, 7, 2).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(_upsample2x_even(lo2, 9, 13)),
                                  np.asarray(_upsample_even(lo2, 9, 13, 2)))

    # warp_multi approx=4: sampled positions EXACT vs the exact warp
    h, w = 33, 49
    flow_r = (rng.randn(1, h, w, 2) * 0.05 * 2).astype(np.float32)
    imgr = rng.randn(1, h, w, 4).astype(np.float32)
    ex = warp_multi([jnp.asarray(imgr)], jnp.asarray(flow_r), h, w, 0.05)[0]
    a4 = warp_multi([jnp.asarray(imgr)], jnp.asarray(flow_r), h, w, 0.05,
                    approx=4)[0]
    np.testing.assert_allclose(np.asarray(a4[:, ::4, ::4]),
                               np.asarray(ex[:, ::4, ::4]), atol=1e-6)
    # approx=True is still stride 2 (back-compat)
    a2 = warp_multi([jnp.asarray(imgr)], jnp.asarray(flow_r), h, w, 0.05,
                    approx=True)[0]
    a2i = warp_multi([jnp.asarray(imgr)], jnp.asarray(flow_r), h, w, 0.05,
                     approx=2)[0]
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(a2i))


def test_irr_pwc_approx_guidance_stride_flag():
    """--model_approx_guidance_stride=4 runs end to end and stays close to
    the exact path at random init (guidance-only perturbation)."""
    from irr_tpu.models import IRR_PWC

    m_ex = IRR_PWC(div_flow=0.05)
    m_a4 = IRR_PWC(div_flow=0.05, approx_guidance=True,
                   approx_guidance_stride=4)
    params = m_ex.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    batch = {"input1": jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32)),
             "input2": jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))}
    out_ex = m_ex.apply(params, batch, training=False)
    out_a4 = m_a4.apply(params, batch, training=False)
    assert out_a4["flow"].shape == out_ex["flow"].shape
    np.testing.assert_allclose(np.asarray(out_a4["flow"]),
                               np.asarray(out_ex["flow"]), atol=1e-3)


def test_irr_pwc_approx_guidance_flag():
    """--model_approx_guidance touches only the L5/L6 guidance path: the
    model still runs and stays close to the exact path at random init."""
    from irr_tpu.models import IRR_PWC

    m_ex = IRR_PWC(div_flow=0.05)
    m_ap = IRR_PWC(div_flow=0.05, approx_guidance=True)
    params = m_ex.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    batch = {"input1": jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32)),
             "input2": jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))}
    out_ex = m_ex.apply(params, batch, training=False)
    out_ap = m_ap.apply(params, batch, training=False)
    assert out_ap["flow"].shape == out_ex["flow"].shape
    # random-init occ head outputs are near zero; guidance perturbation
    # stays small at this scale
    d = np.abs(np.asarray(out_ap["occ"]) - np.asarray(out_ex["occ"])).max()
    assert np.isfinite(d)
    np.testing.assert_allclose(np.asarray(out_ap["flow"]),
                               np.asarray(out_ex["flow"]), atol=1e-4)


def test_irr_pwc_approx_refine_guidance_flag():
    """--model_approx_refine_guidance extends the reduced-density warp to
    the two L1-4 refinement guidance warps (RefineFlow image-warp error,
    RefineOcc feature-warp error; reference IRR_PWC.py:126-138). Unlike
    the L5/L6 guidance these sit upstream of the carried flow estimate,
    so there is NO per-element closeness contract — the approximation's
    error is content-dependent (motion/texture discontinuities) and its
    real cost is measured on trained checkpoints (RESULTS.md: F1
    0.8716->0.8480 on the stage-1 ckpt). The hard contract here:
    shapes, finiteness, bounded aggregate drift at random init, CLI
    reachability, and training-mode inertness (the flag is eval-only)."""
    from irr_tpu.models import IRR_PWC

    m_ex = IRR_PWC(div_flow=0.05)
    m_ar = IRR_PWC(div_flow=0.05, approx_guidance=True,
                   approx_refine_guidance=True)
    params = m_ex.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    batch = {"input1": jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32)),
             "input2": jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))}
    out_ex = m_ex.apply(params, batch, training=False)
    out_ar = m_ar.apply(params, batch, training=False)
    assert out_ar["flow"].shape == out_ex["flow"].shape
    assert np.isfinite(np.asarray(out_ar["flow"])).all()
    assert np.isfinite(np.asarray(out_ar["occ"])).all()
    # Aggregate drift bound only (empirical, seed/input-specific): the
    # mean perturbation stays well below a pixel at random init even
    # though individual elements near interpolation seams exceed 5e-3.
    d = np.abs(np.asarray(out_ar["flow"]) - np.asarray(out_ex["flow"]))
    assert d.mean() < 5e-3 and d.max() < 0.5, (d.mean(), d.max())
    # the flag must also reach the CLI via ctor reflection
    import inspect
    assert "approx_refine_guidance" in inspect.signature(
        IRR_PWC.__init__).parameters
    # training-mode inertness: approx_refine_guidance must not change the
    # TRAINING graph (the refine approximation is eval-only; ADVICE r4 —
    # its guidance warps carry gradients into flow_cont). Compare against
    # approx_guidance alone, which legitimately reaches the L5/L6
    # training path, to isolate the refine flag's contribution.
    m_ap = IRR_PWC(div_flow=0.05, approx_guidance=True)
    tr_ex = m_ap.apply(params, batch, training=True)
    tr_ar = m_ar.apply(params, batch, training=True)
    # structure must match too — a zip over leaves alone would silently
    # truncate if the flag added/dropped an output in training mode
    assert (jax.tree_util.tree_structure(tr_ex)
            == jax.tree_util.tree_structure(tr_ar))
    for a, b in zip(jax.tree_util.tree_leaves(tr_ex),
                    jax.tree_util.tree_leaves(tr_ar)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
