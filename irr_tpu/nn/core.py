"""Minimal functional module system: config objects + pytree params.

Design stance (SURVEY.md §7): pure functions over pytrees instead of
stateful nn.Modules. A `Module` holds only static configuration; `init(key)`
returns a params pytree; `__call__(params, x)` is pure and traceable. This
keeps the full model jittable, donation-friendly, and gives us stable
param paths for checkpoint filtering.

Conv semantics match torch Conv2d (SAME-via-explicit-pad, floor output size)
and ConvTranspose2d (expressed as an input-dilated conv). Init matches the
reference's `initialize_msra` (pwc_modules.py:22-39): Kaiming-normal
(fan_in, gain sqrt(2)) weights, zero bias.

Mixed precision: `set_compute_dtype(jnp.bfloat16)` makes convs run their
matmul in bf16 with f32 accumulation (MXU-native), while params and all
inter-layer tensors stay f32.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_POLICY = {"compute_dtype": jnp.float32, "conv_impl": "conv"}


def set_compute_dtype(dtype):
    _POLICY["compute_dtype"] = dtype


def compute_dtype():
    return _POLICY["compute_dtype"]


_CONV_IMPLS = ("conv", "im2col", "shiftsum")


def set_conv_impl(impl):
    """Codegen policy for the dense 3x3 stride-1 feature convs (the
    estimator/context "towers" — the one compute block XLA's TPU conv
    lowering leaves at ~30% MXU, PERF.md "Open leads" #1).

    conv      lax.conv_general_dilated (default, reference-exact lowering)
    im2col    materialize the 9 dilated taps -> ONE (B*H*W, 9Cin)@(9Cin,
              Cout) MXU matmul (9x HBM traffic for a perfect matmul shape)
    shiftsum  sum of 9 shifted pointwise matmuls, f32 accumulation

    Both reformulations compute the identical multiply-add set; they are
    opt-in (--conv_impl) and only rewrite eligible convs (k=3, stride 1,
    pad == dilation, cout >= 16) — strided convs, transposed convs and
    the f32 flow/occ heads keep the lax.conv path.
    """
    if impl not in _CONV_IMPLS:
        raise ValueError(f"conv_impl must be one of {_CONV_IMPLS}, got {impl!r}")
    _POLICY["conv_impl"] = impl


def conv_impl():
    return _POLICY["conv_impl"]


def head_dtype(cout):
    """Per-conv compute dtype under the mixed policy: feature convs follow
    the policy; small heads (flow/occ/kernel fields, cout < 16) stay f32 —
    flow values carry pixel units where bf16 rounding would cost accuracy."""
    return _POLICY["compute_dtype"] if cout >= 16 else jnp.float32


def leaky_relu(x, negative_slope=0.1):
    return jnp.where(x >= 0, x, x * negative_slope)


def normalize_image_batch(batch):
    """In-graph uint8 image -> float32/255 normalization.

    The loader ships images as uint8 when no host-side photometric
    transform runs (data/transforms.py PhotometricPair disabled path),
    quartering host->device bytes; uint8->f32 conversion is exact and the
    on-device f32 divide is bit-identical to the host path on the CPU
    backend (pinned by test_data.py::test_photometric_disabled_is_tototensor);
    on TPU, XLA lowers /255 as a reciprocal multiply — measured on a real
    v5e (2026-08-18, all 256 uint8 values): 126/256 land exactly 1 ulp off
    the host result, never more (same story as _exact_div_f32, ops/warp.py).
    """
    out = dict(batch)
    for k in ("input1", "input2", "target_occ1", "target_occ2"):
        v = out.get(k)
        if v is not None and v.dtype == jnp.uint8:
            out[k] = v.astype(jnp.float32) / np.float32(255.0)
    return out


def model_inputs(input_dict):
    """Fetch (input1, input2), rejecting a still-uint8 wire batch.

    The uint8 wire format makes normalize_image_batch a required step
    keyed on a fixed key list; a consumer that feeds loader batches
    straight into model.apply would otherwise silently train on 0-255
    values (models accept any float). Every model's apply() goes through
    here so the mistake fails loudly at trace time (ADVICE r2)."""
    x1, x2 = input_dict["input1"], input_dict["input2"]
    for x in (x1, x2):
        if not jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            raise TypeError(
                "model inputs must be floating point in [0,1]; got %s — "
                "pass the batch through nn.core.normalize_image_batch "
                "(the loader ships uint8 on the wire)" % jnp.asarray(x).dtype)
    return x1, x2


def safe_norm(x, axis=-1, keepdims=True):
    """L2 norm with torch's subgradient-0-at-0 convention.

    jnp.linalg.norm's gradient is NaN at exactly-zero vectors (0/0); torch
    returns 0 there. Zero vectors DO occur (clipped photometric images,
    masked warps), so the double-where trick keeps training finite.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    is_zero = sq == 0
    return jnp.where(is_zero, 0.0, jnp.sqrt(jnp.where(is_zero, 1.0, sq)))


def _kaiming_normal(key, shape, fan_in):
    std = np.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, jnp.float32) * std


class Module:
    """Base: static config; params are explicit pytrees."""

    def init(self, key):
        raise NotImplementedError

    def __call__(self, params, *args, **kwargs):
        raise NotImplementedError


def _conv3x3_taps(x, dilation):
    """The 9 dilated-3x3 taps of a shape-preserving conv (pad == dilation),
    as statically shifted views of the padded input, (dy, dx) row-major —
    matching the (3, 3, Cin, Cout) HWIO weight flattened to (9*Cin, Cout)."""
    d = dilation
    h, w = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    return [xp[:, dy * d:dy * d + h, dx * d:dx * d + w, :]
            for dy in range(3) for dx in range(3)]


def _conv3x3_matmul(x, w, dilation, impl):
    """Shape-preserving 3x3 conv as explicit MXU matmuls (set_conv_impl).

    Same multiply-add set as lax.conv_general_dilated; the reduction order
    differs only within the MXU's f32 accumulation. im2col: one
    (B*H*W, 9Cin)@(9Cin, Cout) product over concatenated taps. shiftsum:
    9 pointwise (Cin-deep) products accumulated in f32.
    """
    taps = _conv3x3_taps(x, dilation)
    cout = w.shape[-1]
    if impl == "im2col":
        patches = jnp.concatenate(taps, axis=-1)              # (B,H,W,9Cin)
        wmat = w.reshape(-1, cout)                            # (9Cin, Cout)
        y = patches.reshape(-1, patches.shape[-1]) @ wmat
        return y.reshape(x.shape[:3] + (cout,)).astype(x.dtype)
    acc = None
    for t, (dy, dx) in zip(taps, [(i, j) for i in range(3) for j in range(3)]):
        part = jnp.einsum("bhwc,cf->bhwf", t, w[dy, dx],
                          preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc.astype(x.dtype)


class Conv(Module):
    """Conv2d(+LeakyReLU(0.1)) on NHWC, weights HWIO.

    Mirrors the reference `conv` helper (pwc_modules.py:8-19,
    flownet_modules.py:9-19): padding defaults to
    ((k-1)*dilation)//2 so stride-1 convs are shape-preserving.
    """

    def __init__(self, cin, cout, kernel_size=3, stride=1, dilation=1,
                 relu=True, pad=None, bias=True):
        self.cin = cin
        self.cout = cout
        self.k = kernel_size
        self.stride = stride
        self.dilation = dilation
        self.relu = relu
        self.pad = ((kernel_size - 1) * dilation) // 2 if pad is None else pad
        self.bias = bias

    def init(self, key):
        w = _kaiming_normal(key, (self.k, self.k, self.cin, self.cout),
                            fan_in=self.cin * self.k * self.k)
        p = {"w": w}
        if self.bias:
            p["b"] = jnp.zeros((self.cout,), jnp.float32)
        return p

    def _eligible_for_matmul(self):
        # the dense tower convs: 3x3, stride 1, shape-preserving (pad ==
        # dilation), feature-width output. Heads (cout < 16, f32) and
        # strided pyramid convs keep the reference-exact lax.conv path.
        return (self.k == 3 and self.stride == 1
                and self.pad == self.dilation and self.cout >= 16)

    def __call__(self, params, x):
        # Under a bf16 policy, FEATURE convs run fully in bf16 (inputs,
        # MXU output, stored activations — the MXU still accumulates f32
        # internally); small heads (flow/occ/kernel fields, cout < 16)
        # compute entirely in f32 — flow values carry pixel units where
        # bf16 rounding would cost accuracy. Keeping input/output dtypes
        # consistent per conv also keeps the autodiff transpose well-typed.
        dt = head_dtype(self.cout)
        impl = conv_impl()
        if impl != "conv" and self._eligible_for_matmul():
            y = _conv3x3_matmul(x.astype(dt), params["w"].astype(dt),
                                self.dilation, impl)
        else:
            y = lax.conv_general_dilated(
                x.astype(dt), params["w"].astype(dt),
                window_strides=(self.stride, self.stride),
                padding=[(self.pad, self.pad), (self.pad, self.pad)],
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt,
            )
        if self.bias:
            y = y + params["b"].astype(dt)
        return leaky_relu(y) if self.relu else y


def cat_features(*tensors):
    """Channel-concat for conv inputs, cast to the compute dtype so a
    single f32 member (e.g. the flow state) doesn't upcast the whole
    concatenated feature tensor under a bf16 policy."""
    dt = compute_dtype()
    return jnp.concatenate([t.astype(dt) for t in tensors], axis=-1)


class ConvTranspose(Module):
    """ConvTranspose2d(+LeakyReLU) on NHWC, as an input-dilated conv.

    Output size (H-1)*stride - 2*pad + k, identical to torch. Our canonical
    weight is the HWIO kernel of the equivalent dilated conv (a spatial flip
    + axis swap of torch's (cin, cout, k, k) layout — handled by the
    checkpoint converter, not here).
    """

    def __init__(self, cin, cout, kernel_size=4, stride=2, pad=1,
                 relu=True, bias=False):
        self.cin = cin
        self.cout = cout
        self.k = kernel_size
        self.stride = stride
        self.pad = pad
        self.relu = relu
        self.bias = bias

    def init(self, key):
        # torch fan_in for ConvTranspose2d weight (cin, cout, k, k) is
        # cout * k * k (dim-1 based) — mirror that so init statistics match.
        w = _kaiming_normal(key, (self.k, self.k, self.cin, self.cout),
                            fan_in=self.cout * self.k * self.k)
        p = {"w": w}
        if self.bias:
            p["b"] = jnp.zeros((self.cout,), jnp.float32)
        return p

    def __call__(self, params, x):
        dt = head_dtype(self.cout)
        eff_pad = self.k - 1 - self.pad
        y = lax.conv_general_dilated(
            x.astype(dt), params["w"].astype(dt),
            window_strides=(1, 1),
            padding=[(eff_pad, eff_pad), (eff_pad, eff_pad)],
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt,
        )
        if self.bias:
            y = y + params["b"].astype(dt)
        return leaky_relu(y) if self.relu else y


class Sequential(Module):
    def __init__(self, *modules):
        self.modules = list(modules)

    def init(self, key):
        return [m.init(jax.random.fold_in(key, i)) for i, m in enumerate(self.modules)]

    def __call__(self, params, x):
        for p, m in zip(params, self.modules):
            x = m(p, x)
        return x


# ---------------------------------------------------------------------------
# space-to-depth conv execution (exact transformation)
# ---------------------------------------------------------------------------
#
# A 3x3 stride-1 conv on (H, W, C) with small C starves the MXU (measured
# ~5 TF/s at C=32 vs ~95 TF/s at C=512 on v5e). Running the SAME math in
# 2x2 space-to-depth space — x_s2d: (H/2, W/2, 4C), kernel transformed to
# (3, 3, 4C, 4C) with structured zeros — quadruples the FLOPs but raises
# MXU utilization ~10x: a ~2.5x net win for full-resolution 32-channel
# towers. The transformation is an exact linear-algebra identity:
#   s2d(conv3x3(x, w)) == conv3x3(s2d(x), s2d_weights(w))   (padding 1)


def space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel order (p, q, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x):
    """Inverse of space_to_depth."""
    b, hh, ww, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, hh, ww, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hh * 2, ww * 2, c)


def s2d_weights(w):
    """Transform a (3, 3, Cin, Cout) kernel to its exact (3, 3, 4Cin, 4Cout)
    space-to-depth equivalent.

    out[2I+a, 2J+b] = sum_{di,dj} w[di+1, dj+1] * in[2I+a+di, 2J+b+dj];
    writing a+di = 2P + p (P block offset, p parity) gives
    Wbig[P+1, Q+1, (p,q,ci), (a,b,co)] = w[di+1, dj+1, ci, co].
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    big = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for a in range(2):
        for di in (-1, 0, 1):
            s = a + di
            P, p = s // 2, s % 2
            for b_ in range(2):
                for dj in (-1, 0, 1):
                    t = b_ + dj
                    Q, q = t // 2, t % 2
                    big = big.at[P + 1, Q + 1,
                                 (p * 2 + q) * cin:(p * 2 + q + 1) * cin,
                                 (a * 2 + b_) * cout:(a * 2 + b_ + 1) * cout
                                 ].set(w[di + 1, dj + 1])
    return big


def conv3x3_s2d(params, x, relu=True):
    """Run a padded 3x3 conv via the space-to-depth identity.
    x is already in s2d space; params are the ORIGINAL (3,3,Cin,Cout)/bias."""
    dt = head_dtype(4 * params["w"].shape[3])
    w_big = s2d_weights(params["w"]).astype(dt)
    y = lax.conv_general_dilated(
        x.astype(dt), w_big,
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt,
    )
    if "b" in params:
        y = y + jnp.tile(params["b"], 4).astype(dt)
    return leaky_relu(y) if relu else y


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def param_paths(params):
    """Flat {path_string: leaf} with '/'-joined keys (for fnmatch filtering)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {}
    for path, leaf in flat:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        out["/".join(parts)] = leaf
    return out
