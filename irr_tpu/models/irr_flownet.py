"""IRR-FlowNet — full iterative FlowNet (reference models/IRR_FlowNet.py).

Per iteration: shared bidirectional FlowNetS flow+occ decoder on (re-warped)
conv3 features, residual accumulation across iterations, RefineFlow /
RefineOcc at conv2 resolution, OccUpsampleNetwork x2 upsampling with
warped-image/flow guidance, then re-warping of conv3 features for the next
iteration (IRR_FlowNet.py:153-277).

Runs stacked [forward; backward] on the batch axis (see irr_pwc.py).
All warps use the unmasked FlowNet warping layer
(flownet_modules.py:93-107).
"""

import jax
import jax.numpy as jnp

from ..nn.core import Module, model_inputs
from ..nn.flownet import FlowNetSIrr
from ..nn.irr import OccUpsampleNetwork, RefineFlow, RefineOcc
from ..ops.warp import warp_unmasked, warp_multi
from ..ops.resize import upsample2d_as
from .flownet_family import _Stem, _swap, _get_num_iters


class IRR_FlowNet(Module):
    def __init__(self, args=None, div_flow=0.05, num_iters=None):
        self.args = args
        self.div_flow = float(div_flow)
        self.num_iters = _get_num_iters(args, num_iters)
        self.stem = _Stem()
        self.flownets = FlowNetSIrr(occ=True)
        self.occ_shuffle_upsample = OccUpsampleNetwork(11, 1)
        self.refine_flow = RefineFlow(2 + 1 + 64)
        self.refine_occ = RefineOcc(1 + 64 + 64)

    def init(self, key):
        return {
            "stem": self.stem.init(jax.random.fold_in(key, 0)),
            "flownets": self.flownets.init(jax.random.fold_in(key, 1)),
            "occ_shuffle_upsample": self.occ_shuffle_upsample.init(jax.random.fold_in(key, 2)),
            "refine_flow": self.refine_flow.init(jax.random.fold_in(key, 3)),
            "refine_occ": self.refine_occ.init(jax.random.fold_in(key, 4)),
        }

    def __call__(self, params, input_dict, training=False):
        return self.apply(params, input_dict, training)

    def apply(self, params, input_dict, training=False):
        im1, im2 = model_inputs(input_dict)
        bsz, height_im, width_im, _ = im1.shape
        dvf = self.div_flow

        im_stack = jnp.concatenate([im1, im2], axis=0)
        conv2, conv3 = self.stem(params["stem"], im_stack)
        conv3_wp_sw = _swap(conv3)

        keys = ["flow2", "flow3", "flow4", "flow5", "flow6",
                "occ2", "occ3", "occ4", "occ5", "occ6"]
        out = {k: [] for k in keys + ["flow", "flow1", "occ", "occ1"]}

        def pair(t):
            return [t[:bsz], t[bsz:]]

        prev_acc = {}
        flow1_prev = occ1_prev = None

        for ii in range(self.num_iters):
            preds = self.flownets(params["flownets"], conv2, conv3, conv3_wp_sw)
            preds = dict(zip(keys, preds))

            for k in keys:
                acc = preds[k] if ii == 0 else preds[k] + prev_acc[k]
                prev_acc[k] = acc
                out[k].append(pair(acc))

            if ii == 0:
                flo2_out = preds["flow2"]
                occ2_out = preds["occ2"]
            else:
                # residual against the previous iteration's REFINED output
                # (IRR_FlowNet.py:221-224)
                flo2_out = preds["flow2"] + upsample2d_as(flow1_prev, preds["flow2"])
                occ2_out = preds["occ2"] + upsample2d_as(occ1_prev, preds["occ2"])

            flo2_out = upsample2d_as(flo2_out, conv2)
            occ2_out = upsample2d_as(occ2_out, conv2)

            # refinement at conv2 resolution (IRR_FlowNet.py:232-248)
            img_resize = upsample2d_as(im_stack, flo2_out)
            img_warp = warp_unmasked(_swap(img_resize), flo2_out, height_im, width_im, dvf)
            flow_ref = self.refine_flow(
                params["refine_flow"], jax.lax.stop_gradient(flo2_out),
                img_resize - img_warp, conv2)

            conv2_warp = warp_unmasked(_swap(conv2), flow_ref, height_im, width_im, dvf)
            occ_ref = self.refine_occ(
                params["refine_occ"], jax.lax.stop_gradient(occ2_out),
                conv2, conv2 - conv2_warp)

            out["flow1"].append(pair(flow_ref))
            out["occ1"].append(pair(occ_ref))
            flow1_prev, occ1_prev = flow_ref, occ_ref

            # full-res upsample + occ shuffle upsample (IRR_FlowNet.py:250-263)
            flow_up = upsample2d_as(flow_ref, im_stack)
            out["flow"].append(pair(flow_up))

            im_warp, flow_warp = warp_multi(
                [_swap(im_stack), _swap(flow_up)], flow_up, height_im, width_im,
                dvf, masked=False, pwc_norm=False)
            guidance = jnp.concatenate([im_stack, im_warp, flow_up, flow_warp], -1)
            occ_full = self.occ_shuffle_upsample(params["occ_shuffle_upsample"],
                                                 occ_ref, guidance)
            out["occ"].append(pair(occ_full))

            if ii < self.num_iters - 1:
                flow_resized = upsample2d_as(flow_up, conv3)
                conv3_wp_sw = warp_unmasked(_swap(conv3), flow_resized,
                                            height_im, width_im, dvf)

        if training:
            return out
        return {
            "flow": upsample2d_as(out["flow"][-1][0], im1) * (1.0 / dvf),
            "occ": upsample2d_as(out["occ"][-1][0], im1),
        }
