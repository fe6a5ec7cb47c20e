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
# grouped flow+occ estimator stage (exact, zero redundant FLOPs)
# ---------------------------------------------------------------------------
#
# Each conv pair (flow tower / occ tower) becomes ONE
# feature_group_count=2 conv whose two groups carry the two paths with
# their OWN weights. (A round-1 block-of-zeros formulation doubled every
# conv's FLOPs, which cancelled its dispatch win end-to-end — measured,
# then deleted in r3; grouped is its replacement with no redundant FLOPs.) the cost is maintaining the activation in grouped layout
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
    fused as a feature_group_count=2 conv. Exact same math as the
    separate towers (reference pwc_modules.py:153-225 composed as
    IRR_PWC.py:108-123)."""
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
