"""PWC-Net building blocks (reference models/pwc_modules.py:85-243).

All modules are functional: static config, `init(key)` -> params pytree,
`__call__(params, x)` pure. NHWC throughout.
"""

import jax

from .core import Module, Conv, Sequential
import jax.numpy as jnp


class FeatureExtractor(Module):
    """Siamese 6-stage conv pyramid (pwc_modules.py:85-104).

    Each stage: stride-2 conv + stride-1 conv, LeakyReLU(0.1).
    Returns the pyramid coarse -> fine.
    """

    def __init__(self, num_chs):
        self.num_chs = list(num_chs)
        self.stages = [
            Sequential(Conv(cin, cout, stride=2), Conv(cout, cout))
            for cin, cout in zip(self.num_chs[:-1], self.num_chs[1:])
        ]

    def init(self, key):
        return [s.init(jax.random.fold_in(key, i)) for i, s in enumerate(self.stages)]

    def __call__(self, params, x):
        pyramid = []
        for p, stage in zip(params, self.stages):
            x = stage(p, x)
            pyramid.append(x)
        return pyramid[::-1]


class OpticalFlowEstimator(Module):
    """Plain 5-conv estimator + 2ch head (pwc_modules.py:135-150)."""

    def __init__(self, ch_in, ch_out=2):
        self.convs = Sequential(
            Conv(ch_in, 128), Conv(128, 128), Conv(128, 96),
            Conv(96, 64), Conv(64, 32))
        self.conv_last = Conv(32, ch_out, relu=False)

    def init(self, key):
        return {"convs": self.convs.init(jax.random.fold_in(key, 0)),
                "conv_last": self.conv_last.init(jax.random.fold_in(key, 1))}

    def __call__(self, params, x):
        x_intm = self.convs(params["convs"], x)
        return x_intm, self.conv_last(params["conv_last"], x_intm)


class OcclusionEstimator(OpticalFlowEstimator):
    """Same trunk with a 1ch head (pwc_modules.py:173-187)."""

    def __init__(self, ch_in):
        super().__init__(ch_in, ch_out=1)


class FlowEstimatorDense(Module):
    """DenseNet-style decoder (pwc_modules.py:153-170): each conv's output is
    concatenated in front of its input; final 1x1-equivalent head reads the
    full 448-channel accumulation."""

    def __init__(self, ch_in, ch_out=2):
        self.conv1 = Conv(ch_in, 128)
        self.conv2 = Conv(ch_in + 128, 128)
        self.conv3 = Conv(ch_in + 256, 96)
        self.conv4 = Conv(ch_in + 352, 64)
        self.conv5 = Conv(ch_in + 416, 32)
        self.conv_last = Conv(ch_in + 448, ch_out, relu=False)

    def init(self, key):
        names = ["conv1", "conv2", "conv3", "conv4", "conv5", "conv_last"]
        return {n: getattr(self, n).init(jax.random.fold_in(key, i))
                for i, n in enumerate(names)}

    def __call__(self, params, x):
        x1 = jnp.concatenate([self.conv1(params["conv1"], x), x], axis=-1)
        x2 = jnp.concatenate([self.conv2(params["conv2"], x1), x1], axis=-1)
        x3 = jnp.concatenate([self.conv3(params["conv3"], x2), x2], axis=-1)
        x4 = jnp.concatenate([self.conv4(params["conv4"], x3), x3], axis=-1)
        x5 = jnp.concatenate([self.conv5(params["conv5"], x4), x4], axis=-1)
        out = self.conv_last(params["conv_last"], x5)
        return x5, out


class OccEstimatorDense(FlowEstimatorDense):
    def __init__(self, ch_in):
        super().__init__(ch_in, ch_out=1)


class ContextNetwork(Module):
    """7-layer dilated refinement, residual output (pwc_modules.py:210-225)."""

    def __init__(self, ch_in, ch_out=2):
        self.net = Sequential(
            Conv(ch_in, 128, 3, 1, 1),
            Conv(128, 128, 3, 1, 2),
            Conv(128, 128, 3, 1, 4),
            Conv(128, 96, 3, 1, 8),
            Conv(96, 64, 3, 1, 16),
            Conv(64, 32, 3, 1, 1),
            Conv(32, ch_out, relu=False))

    def init(self, key):
        return self.net.init(key)

    def __call__(self, params, x):
        return self.net(params, x)


class OccContextNetwork(ContextNetwork):
    def __init__(self, ch_in):
        super().__init__(ch_in, ch_out=1)


# ---------------------------------------------------------------------------
# merged flow+occ estimator stage (exact, TPU throughput)
# ---------------------------------------------------------------------------
#
# The IRR estimators run the SAME dense-tower shape twice per level (flow
# and occ) on inputs that differ only in the last channels
# ([corr, x1by1, flow] vs [corr, x1by1, occ]). Merging each pair of convs
# into ONE conv with block-structured weights (zeros across paths) halves
# the number of MXU dispatches and doubles the output width N — identical
# math: the extra weight entries are exact zeros, contributing +0.0 terms.
# Params stay the two original per-path trees; merged kernels are assembled
# at trace time from them.
#
# MEASURED (v5e, round 1): end-to-end eval throughput was unchanged — the
# zero blocks double each conv's FLOPs, which cancels the ~1.5-2x
# efficiency gain from the wider N. Kept as verified infrastructure (exact
# to ~2e-6 vs the separate path, see tests/test_merged_stage.py); becomes a
# win only with a sparse/grouped lowering that skips the zero blocks.

def _assemble_merged_weight(w_f, w_o, picks_f, picks_o, total_in):
    """Block weight (3, 3, total_in, cout_f + cout_o) from per-path kernels.

    picks_*: list of (src_start, dst_start, count) channel copies mapping
    each path's expected input layout into the merged activation layout.
    """
    cout_f = w_f.shape[3]
    cout_o = w_o.shape[3]
    big = jnp.zeros((3, 3, total_in, cout_f + cout_o), w_f.dtype)
    for src, dst, cnt in picks_f:
        big = big.at[:, :, dst:dst + cnt, :cout_f].set(w_f[:, :, src:src + cnt, :])
    for src, dst, cnt in picks_o:
        big = big.at[:, :, dst:dst + cnt, cout_f:].set(w_o[:, :, src:src + cnt, :])
    return big


def _merged_conv(p_f, p_o, x, picks_f, picks_o, relu=True, dilation=1):
    from .core import compute_dtype, leaky_relu
    import jax.numpy as _jnp
    from jax import lax as _lax
    cout = p_f["w"].shape[3] + p_o["w"].shape[3]
    dt = compute_dtype() if cout >= 16 else _jnp.float32
    w = _assemble_merged_weight(p_f["w"], p_o["w"], picks_f, picks_o,
                                x.shape[-1]).astype(dt)
    pad = dilation
    y = _lax.conv_general_dilated(
        x.astype(dt), w, (1, 1), [(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt)
    y = y + jnp.concatenate([p_f["b"], p_o["b"]]).astype(dt)
    return leaky_relu(y) if relu else y


def merged_flow_occ_stage(p_flow_est, p_occ_est, p_ctx_f, p_ctx_o,
                          corr, x1by1, flow, occ):
    """One IRR level's flow+occ estimation (dense towers + context nets)
    with every per-path conv pair fused. Returns (flow_cont, occ_cont) —
    exactly FlowEstimatorDense/OccEstimatorDense + the context networks
    composed as in IRR_PWC.py:108-123 (flow/occ in level-local units)."""
    from .core import cat_features
    base = corr.shape[-1] + x1by1.shape[-1]      # shared [corr, x1by1] prefix
    widths = [128, 128, 96, 64, 32]

    # merged layout M^k = [y^{k-1}, ..., y^1, corr, x1by1, flow, occ],
    # y^j = [c^j_flow, c^j_occ] (2*w_j channels, newest block first)
    M = cat_features(corr, x1by1, flow, occ)

    def dense_picks(k):
        """picks for dense conv k (0-based): flow input layout is
        [c^{k}_f ... c^1_f, corr, x1by1, flow] (newest first)."""
        picks_f, picks_o = [], []
        src = 0
        dst = 0
        for j in range(k, 0, -1):                 # newest first: c^{k} .. c^1
            wj = widths[j - 1]
            picks_f.append((src, dst, wj))         # flow half of y^j
            picks_o.append((src, dst + wj, wj))    # occ half of y^j
            src += wj
            dst += 2 * wj
        tail = dst                                 # start of [corr,x1by1,flow,occ]
        picks_f.append((src, tail, base + 2))      # corr + x1by1 + flow
        picks_o.append((src, tail, base))          # corr + x1by1
        picks_o.append((src + base, tail + base + 2, 1))  # occ
        return picks_f, picks_o

    names = ["conv1", "conv2", "conv3", "conv4", "conv5"]
    for k, name in enumerate(names):
        pf, po = dense_picks(k)
        y = _merged_conv(p_flow_est[name], p_occ_est[name], M, pf, po, relu=True)
        M = jnp.concatenate([y, M], axis=-1)

    pf, po = dense_picks(5)
    res = _merged_conv(p_flow_est["conv_last"], p_occ_est["conv_last"], M,
                       pf, po, relu=False)
    flow_res = res[..., :2]
    occ_res = res[..., 2:3]
    flow_est = flow + flow_res
    occ_est = occ + occ_res

    # context networks on [x5, flow_est] / [x5_occ, occ_est]
    M = cat_features(M, flow_est, occ_est)
    pf, po = dense_picks(5)
    tail = sum(2 * w for w in widths)
    pf = pf + [(sum(widths) + base + 2, tail + base + 3, 2)]       # flow_est
    po = po + [(sum(widths) + base + 1, tail + base + 5, 1)]       # occ_est
    dilations = [1, 2, 4, 8, 16, 1, 1]
    relus = [True] * 6 + [False]
    h = _merged_conv(p_ctx_f[0], p_ctx_o[0], M, pf, po, relu=True,
                     dilation=dilations[0])
    ctx_widths = [128, 128, 128, 96, 64, 32]
    for i in range(1, 7):
        wprev = ctx_widths[i - 1]
        pf = [(0, 0, wprev)]
        po = [(0, wprev, wprev)]
        h = _merged_conv(p_ctx_f[i], p_ctx_o[i], h, pf, po, relu=relus[i],
                         dilation=dilations[i])
    flow_cont = flow_est + h[..., :2]
    occ_cont = occ_est + h[..., 2:3]
    return flow_cont, occ_cont


# ---------------------------------------------------------------------------
# grouped flow+occ estimator stage (exact, zero redundant FLOPs)
# ---------------------------------------------------------------------------
#
# Second fusion formulation: feature_group_count=2 instead of
# block-of-zeros weights. Each conv pair (flow tower / occ tower) becomes
# ONE grouped conv whose two groups carry the two paths with their OWN
# weights — no zero blocks, so unlike merged_flow_occ_stage the FLOPs do
# not double; the cost is maintaining the activation in grouped layout
# (the shared [corr, x1by1] prefix is duplicated across the groups, a
# bandwidth-only cost). The occ path's narrower input (occ 1ch vs flow
# 2ch) is equalized with trailing zero channels + zero weight rows, and
# the narrower head output (1 vs 2) with zero filters sliced away —
# exact by construction.


def _grouped_conv(p_f, p_o, x, relu=True, dilation=1, pad_in=0, pad_out=0):
    """One grouped conv from the two per-path param dicts.

    pad_in: zero input-channels appended to the OCC group's weight (the
    group carries that many trailing zero channels). pad_out: zero
    filters appended to the occ path's output (sliced away by caller).
    """
    from .core import compute_dtype, leaky_relu
    from jax import lax as _lax
    w_f, w_o = p_f["w"], p_o["w"]
    if pad_in:
        w_o = jnp.concatenate(
            [w_o, jnp.zeros(w_o.shape[:2] + (pad_in, w_o.shape[3]), w_o.dtype)],
            axis=2)
    if pad_out:
        w_o = jnp.concatenate(
            [w_o, jnp.zeros(w_o.shape[:3] + (pad_out,), w_o.dtype)], axis=3)
    b_o = p_o["b"]
    if pad_out:
        b_o = jnp.concatenate([b_o, jnp.zeros((pad_out,), b_o.dtype)])
    cout = w_f.shape[3] + w_o.shape[3]
    dt = compute_dtype() if cout >= 16 else jnp.float32
    rhs = jnp.concatenate([w_f, w_o], axis=3).astype(dt)
    pad = dilation * (w_f.shape[0] // 2)
    y = _lax.conv_general_dilated(
        x.astype(dt), rhs, (1, 1), [(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=2,
        preferred_element_type=dt)
    y = y + jnp.concatenate([p_f["b"], b_o]).astype(dt)
    return leaky_relu(y) if relu else y


def grouped_flow_occ_stage(p_flow_est, p_occ_est, p_ctx_f, p_ctx_o,
                           corr, x1by1, flow, occ):
    """One IRR level's flow+occ estimation with every per-path conv pair
    fused as a feature_group_count=2 conv. Same contract and exact same
    math as merged_flow_occ_stage / the separate towers."""
    widths = [128, 128, 96, 64, 32]
    zeros1 = jnp.zeros(occ.shape[:3] + (1,), occ.dtype)
    # grouped layout: [g_f | g_o], g_f = [newest..oldest, corr, x1by1, flow],
    # g_o the same with [.., occ, 0pad] — both groups equally wide
    g_f = jnp.concatenate([corr, x1by1, flow], axis=-1)
    g_o = jnp.concatenate([corr, x1by1, occ, zeros1], axis=-1)
    M = jnp.concatenate([g_f, g_o], axis=-1)
    S = g_f.shape[-1]

    names = ["conv1", "conv2", "conv3", "conv4", "conv5"]
    for k, name in enumerate(names):
        wk = widths[k]
        y = _grouped_conv(p_flow_est[name], p_occ_est[name], M,
                          relu=True, pad_in=1)
        M = jnp.concatenate([y[..., :wk], M[..., :S],
                             y[..., wk:], M[..., S:]], axis=-1)
        S += wk

    res = _grouped_conv(p_flow_est["conv_last"], p_occ_est["conv_last"], M,
                        relu=False, pad_in=1, pad_out=1)
    flow_est = flow + res[..., :2]
    occ_est = occ + res[..., 2:3]

    # context networks: ctx_f on [x5_f, flow_est], ctx_o on [x5_o, occ_est]
    # x5_f = M[..., :S]; x5_o = M[..., S:-1] (its trailing zero pad dropped)
    g_f = jnp.concatenate([M[..., :S], flow_est], axis=-1)
    g_o = jnp.concatenate([M[..., S:2 * S - 1], occ_est,
                           zeros1, zeros1], axis=-1)
    h = jnp.concatenate([g_f, g_o], axis=-1)
    dilations = [1, 2, 4, 8, 16, 1, 1]
    relus = [True] * 6 + [False]
    h = _grouped_conv(p_ctx_f[0], p_ctx_o[0], h, relu=True,
                      dilation=dilations[0], pad_in=2)
    for i in range(1, 7):
        h = _grouped_conv(p_ctx_f[i], p_ctx_o[i], h, relu=relus[i],
                          dilation=dilations[i],
                          pad_out=1 if i == 6 else 0)
    flow_cont = flow_est + h[..., :2]
    occ_cont = occ_est + h[..., 2:3]
    return flow_cont, occ_cont
