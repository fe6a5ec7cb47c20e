"""FlowNet1S and its IRR ablation variants
(reference models/flownet1s.py, flownet1s_irr.py, flownet1s_irr_bi.py,
flownet1s_irr_occ.py, flownet1s_irr_occ_bi.py).

The IRR axis here is a fixed-resolution iteration of one shared FlowNetS
decoder, re-warping im2's conv3 features by the current flow between
iterations, with residual accumulation across iterations.

Bidirectional variants run stacked on the batch axis (see irr_pwc.py for
the rationale): decoder([c2_1;c2_2], [c3_1;c3_2], swap(warped stack)).
"""

import jax
import jax.numpy as jnp

from ..nn.core import Module, Conv, model_inputs
from ..nn.flownet import FlowNetS, FlowNetSIrr
from ..ops.warp import warp_unmasked
from ..ops.resize import upsample2d_as


def _swap(x):
    b = x.shape[0] // 2
    return jnp.concatenate([x[b:], x[:b]], axis=0)


def _get_num_iters(args, num_iters):
    if num_iters is not None:
        return int(num_iters)
    if args is not None and getattr(args, "num_iters", None):
        return int(args.num_iters)
    return 1


class FlowNet1S(Module):
    """Vanilla FlowNetS on the concatenated pair (flownet1s.py:96-119)."""

    def __init__(self, args=None, div_flow=0.05):
        self.args = args
        self.div_flow = float(div_flow)
        self.flownets = FlowNetS()

    def init(self, key):
        return {"flownets": self.flownets.init(key)}

    def __call__(self, params, input_dict, training=False):
        return self.apply(params, input_dict, training)

    def apply(self, params, input_dict, training=False):
        im1, im2 = model_inputs(input_dict)
        x = jnp.concatenate([im1, im2], axis=-1)
        flow2, flow3, flow4, flow5, flow6 = self.flownets(params["flownets"], x)
        if training:
            return {"flow2": flow2, "flow3": flow3, "flow4": flow4,
                    "flow5": flow5, "flow6": flow6}
        return {"flow1": upsample2d_as(flow2, im1) * (1.0 / self.div_flow)}


class _Stem(Module):
    """3-conv feature stem shared by the irr variants
    (flownet1s_irr.py:102-104)."""

    def __init__(self):
        self.conv1 = Conv(3, 32, kernel_size=7, stride=2, pad=3)
        self.conv2 = Conv(32, 64, kernel_size=5, stride=2, pad=2)
        self.conv3 = Conv(64, 128, kernel_size=5, stride=2, pad=2)

    def init(self, key):
        return {"conv1": self.conv1.init(jax.random.fold_in(key, 0)),
                "conv2": self.conv2.init(jax.random.fold_in(key, 1)),
                "conv3": self.conv3.init(jax.random.fold_in(key, 2))}

    def __call__(self, p, x):
        c1 = self.conv1(p["conv1"], x)
        c2 = self.conv2(p["conv2"], c1)
        c3 = self.conv3(p["conv3"], c2)
        return c2, c3


class _FlowNet1SIrrBase(Module):
    def __init__(self, args=None, div_flow=0.05, num_iters=None, *, occ: bool, bi: bool):
        self.args = args
        self.div_flow = float(div_flow)
        self.num_iters = _get_num_iters(args, num_iters)
        self.occ = occ
        self.bi = bi
        self.stem = _Stem()
        self.flownets = FlowNetSIrr(occ=occ)

    def init(self, key):
        return {"stem": self.stem.init(jax.random.fold_in(key, 0)),
                "flownets": self.flownets.init(jax.random.fold_in(key, 1))}

    def __call__(self, params, input_dict, training=False):
        return self.apply(params, input_dict, training)

    def apply(self, params, input_dict, training=False):
        im1, im2 = model_inputs(input_dict)
        _, height_im, width_im, _ = im1.shape
        dvf = self.div_flow
        keys = ["flow2", "flow3", "flow4", "flow5", "flow6"]
        if self.occ:
            keys += ["occ2", "occ3", "occ4", "occ5", "occ6"]
        out = {k: [] for k in keys}

        if not self.bi:
            conv2_im1, conv3_im1 = self.stem(params["stem"], im1)
            _, conv3_im2 = self.stem(params["stem"], im2)
            conv3_im2_wp = conv3_im2
            for ii in range(self.num_iters):
                preds = self.flownets(params["flownets"], conv2_im1, conv3_im1, conv3_im2_wp)
                for k, v in zip(keys, preds):
                    out[k].append(v if ii == 0 else v + out[k][ii - 1])
                if ii < self.num_iters - 1:
                    up_flow = upsample2d_as(out["flow2"][ii], conv3_im2)
                    conv3_im2_wp = warp_unmasked(conv3_im2, up_flow, height_im, width_im, dvf)
            if training:
                return out
            res = {"flow1": upsample2d_as(out["flow2"][-1], im1) * (1.0 / dvf)}
            if self.occ:
                res["occ1"] = upsample2d_as(out["occ2"][-1], im1)
            return res

        # bidirectional: stacked batch [forward; backward]
        stacked = jnp.concatenate([im1, im2], axis=0)
        conv2, conv3 = self.stem(params["stem"], stacked)
        conv3_wp_sw = _swap(conv3)  # = [conv3_im2; conv3_im1], unwarped at ii=0
        for ii in range(self.num_iters):
            preds = self.flownets(params["flownets"], conv2, conv3, conv3_wp_sw)
            for k, v in zip(keys, preds):
                acc = v if ii == 0 else v + jnp.concatenate(out[k][ii - 1], axis=0)
                bsz = acc.shape[0] // 2
                out[k].append([acc[:bsz], acc[bsz:]])
            if ii < self.num_iters - 1:
                flow2 = jnp.concatenate(out["flow2"][ii], axis=0)
                up_flow = upsample2d_as(flow2, conv3)
                # [warp(c3_im2, up_f); warp(c3_im1, up_b)]
                conv3_wp_sw = warp_unmasked(_swap(conv3), up_flow, height_im, width_im, dvf)
        if training:
            return out
        res = {"flow1": upsample2d_as(out["flow2"][-1][0], im1) * (1.0 / dvf)}
        if self.occ:
            res["occ1"] = upsample2d_as(out["occ2"][-1][0], im1)
        return res


class FlowNet1S_irr(_FlowNet1SIrrBase):
    """Iterated shared decoder (flownet1s_irr.py:89-158)."""

    def __init__(self, args=None, div_flow=0.05, num_iters=None):
        super().__init__(args, div_flow, num_iters, occ=False, bi=False)


class FlowNet1S_irr_bi(_FlowNet1SIrrBase):
    """+ bidirectional (flownet1s_irr_bi.py:89-165)."""

    def __init__(self, args=None, div_flow=0.05, num_iters=None):
        super().__init__(args, div_flow, num_iters, occ=False, bi=True)


class FlowNet1S_irr_occ(_FlowNet1SIrrBase):
    """+ occlusion decoder (flownet1s_irr_occ.py:130-213)."""

    def __init__(self, args=None, div_flow=0.05, num_iters=None):
        super().__init__(args, div_flow, num_iters, occ=True, bi=False)


class FlowNet1S_irr_occ_bi(_FlowNet1SIrrBase):
    """+ both (flownet1s_irr_occ_bi.py:130-222)."""

    def __init__(self, args=None, div_flow=0.05, num_iters=None):
        super().__init__(args, div_flow, num_iters, occ=True, bi=True)
