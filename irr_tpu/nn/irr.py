"""IRR-specific modules (reference models/irr_modules.py:30-139)."""

import jax
import jax.numpy as jnp

from .core import (Module, Conv, Sequential, space_to_depth, depth_to_space,
                   conv3x3_s2d, cat_features, safe_norm)
from ..ops.resize import upsample_factor2
from ..ops.patch import local_filter_3x3


class OccUpsampleNetwork(Module):
    """x2 occlusion upsampling with guidance (irr_modules.py:30-56).

    Nearest-x2 upsample of occ, concat 10ch guidance, residual tower with
    mul_const=0.1 and three *reuses of the same* res_convs weights, residual
    output added back onto the upsampled occ.
    """

    def __init__(self, ch_in, ch_out):
        self.feat_dim = 32
        self.init_conv = Conv(ch_in, self.feat_dim)
        self.res_convs = Sequential(
            Conv(self.feat_dim, self.feat_dim),
            Conv(self.feat_dim, self.feat_dim, relu=False))
        self.res_end_conv = Conv(self.feat_dim, self.feat_dim)
        self.out_convs = Conv(self.feat_dim, ch_out)
        self.mul_const = 0.1

    def init(self, key):
        return {
            "init_conv": self.init_conv.init(jax.random.fold_in(key, 0)),
            "res_convs": self.res_convs.init(jax.random.fold_in(key, 1)),
            "res_end_conv": self.res_end_conv.init(jax.random.fold_in(key, 2)),
            "out_convs": self.out_convs.init(jax.random.fold_in(key, 3)),
        }

    def __call__(self, params, occ, x):
        occ = upsample_factor2(occ, x)
        x_in = jnp.concatenate([occ, x], axis=-1)
        if x_in.shape[1] % 2 == 0 and x_in.shape[2] % 2 == 0:
            # space-to-depth execution (exact; see nn/core.py): this tower
            # runs at the largest resolutions with only 32 channels, where
            # the plain conv starves the MXU.
            z = space_to_depth(x_in)
            x_init = conv3x3_s2d(params["init_conv"], z, relu=True)
            x_res = x_init
            p0, p1 = params["res_convs"]
            for _ in range(3):  # three reuses of the same weights
                r = conv3x3_s2d(p1, conv3x3_s2d(p0, x_res, relu=True), relu=False)
                x_res = x_res + r * self.mul_const
            x_init = x_init + conv3x3_s2d(params["res_end_conv"], x_res, relu=True)
            out = conv3x3_s2d(params["out_convs"], x_init, relu=True)
            return depth_to_space(out) + occ
        x_init = self.init_conv(params["init_conv"], x_in)
        x_res = x_init
        for _ in range(3):  # three reuses of the same weights
            x_res = x_res + self.res_convs(params["res_convs"], x_res) * self.mul_const
        x_init = x_init + self.res_end_conv(params["res_end_conv"], x_res)
        return self.out_convs(params["out_convs"], x_init) + occ


def subtract_mean(x):
    """Per-sample, per-channel spatial mean subtraction (irr_modules.py:59-60)."""
    return x - jnp.mean(x, axis=(1, 2), keepdims=True)


class _RefineBase(Module):
    """Shared kernel-prediction trunk of RefineFlow/RefineOcc
    (irr_modules.py:63-139): 7 convs -> 9ch field; kernel = softmax(-feat^2)
    over the 9 channels; applied to replication-padded 3x3 neighborhoods."""

    def __init__(self, ch_in):
        self.convs = Sequential(
            Conv(ch_in, 128, 3, 1, 1),
            Conv(128, 128, 3, 1, 1),
            Conv(128, 64, 3, 1, 1),
            Conv(64, 64, 3, 1, 1),
            Conv(64, 32, 3, 1, 1),
            Conv(32, 32, 3, 1, 1),
            Conv(32, 9, 3, 1, 1))

    def init(self, key):
        return self.convs.init(key)

    def _kernel(self, params, feat_in):
        feat = self.convs(params, feat_in)
        return jax.nn.softmax(-(feat ** 2), axis=-1)


class RefineFlow(_RefineBase):
    """Edge-aware local filtering of flow (irr_modules.py:63-104).

    Inputs: flow (detached upstream), image difference, 32ch features.
    """

    def __call__(self, params, flow, diff_img, feature):
        flow_m = subtract_mean(flow)
        norm2 = safe_norm(diff_img, axis=-1, keepdims=True)
        kernel = self._kernel(params, cat_features(flow_m, norm2, feature))
        # one pass filters both flow channels (kernel broadcast over C)
        return local_filter_3x3(flow, kernel)


class RefineOcc(_RefineBase):
    """Same filtering for the occlusion logit (irr_modules.py:107-139)."""

    def __call__(self, params, occ, feat1, feat2):
        kernel = self._kernel(params, cat_features(occ, feat1, feat2))
        return local_filter_3x3(occ, kernel)
